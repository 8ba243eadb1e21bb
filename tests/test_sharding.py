"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.data.dataset import P53Data, dataset_3d
from dis_project_tpu.models import simm
from dis_project_tpu.parallel import fit_ensemble, make_mesh
from dis_project_tpu.training import trainer as tr


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh((4, 2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_mesh()
    assert mesh1.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh((3, 2))


@pytest.mark.parametrize("shape", [(4, 2), (2, 4), (8, 1)])
def test_ensemble_matches_single_model(shape):
    """An E=4 ensemble of identical problems sharded over the mesh must
    reproduce the single-device trainer's loss trajectory."""
    data = P53Data(replicate=0, source="synthetic")
    X, y, _ = dataset_3d(data)
    y = y.reshape(-1)
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    p0 = simm.init_params(5)

    ref = tr.fit(model, p0, X, y, tr.TrainConfig(num_iters=12))

    mesh = make_mesh(shape)
    E = 4
    y_batch = jnp.broadcast_to(y[None], (E, y.shape[0]))
    trained, history = fit_ensemble(
        model, p0, mesh, X, y_batch, num_iters=12
    )
    assert history.shape == (12, E)
    # Every member sees the same data -> identical trajectories, matching
    # the unsharded reference path.
    np.testing.assert_allclose(
        np.asarray(history[:, 0]), np.asarray(history[:, 1]), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(history[:, 0]), np.asarray(ref.history), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(trained.decay[0]), np.asarray(ref.params.decay), rtol=1e-8
    )


def test_ensemble_distinct_members():
    """Members with different targets diverge; replicate-wise fits work."""
    data = P53Data(replicate=None, source="synthetic")
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    p0 = simm.init_params(5)

    # One ensemble member per replicate (same X rows: replicate 0 layout).
    d0 = P53Data(replicate=0, source="synthetic")
    X, _, _ = dataset_3d(d0)
    y_batch = data.gene_expressions.reshape(3, -1)  # (3, 35)
    y_batch = jnp.concatenate([y_batch, y_batch[:1]])  # pad to E=4

    mesh = make_mesh((4, 2))
    trained, history = fit_ensemble(model, p0, mesh, X, y_batch, num_iters=10)
    assert not np.allclose(np.asarray(history[-1, 0]), np.asarray(history[-1, 1]))
    # Padded member 3 duplicates member 0 exactly.
    np.testing.assert_allclose(
        np.asarray(history[:, 3]), np.asarray(history[:, 0]), rtol=1e-10
    )


class TestHybridMesh:
    """DCN-aware mesh: the model axis must never cross a slice boundary
    (its collectives are the per-step hot path and belong on ICI)."""

    @staticmethod
    def _fake_slices(n_slices):
        # Virtual CPU devices carry no slice topology; partition them into
        # equal fake slices by device id.
        per = 8 // n_slices
        return lambda d: d.id // per

    def test_model_axis_stays_inside_a_slice(self):
        from dis_project_tpu.parallel import make_hybrid_mesh

        mesh = make_hybrid_mesh(
            model_axis=2, slice_id=self._fake_slices(2)
        )
        assert mesh.shape == {"data": 4, "model": 2}
        sid = self._fake_slices(2)
        for row in mesh.devices:
            assert len({sid(d) for d in row}) == 1

    def test_default_model_axis_is_the_whole_slice(self):
        from dis_project_tpu.parallel import make_hybrid_mesh

        mesh = make_hybrid_mesh(slice_id=self._fake_slices(4))
        assert mesh.shape == {"data": 4, "model": 2}
        sid = self._fake_slices(4)
        for row in mesh.devices:
            assert len({sid(d) for d in row}) == 1

    def test_single_slice_degrades_to_plain_mesh(self):
        from dis_project_tpu.parallel import make_hybrid_mesh

        mesh = make_hybrid_mesh(model_axis=4)  # CPU: slice_index absent -> 0
        assert mesh.shape == {"data": 2, "model": 4}

    def test_error_cases(self):
        from dis_project_tpu.parallel import make_hybrid_mesh

        with pytest.raises(ValueError, match="does not divide"):
            make_hybrid_mesh(model_axis=3, slice_id=self._fake_slices(2))
        with pytest.raises(ValueError, match="uneven"):
            make_hybrid_mesh(slice_id=lambda d: 0 if d.id < 3 else 1)
        with pytest.raises(ValueError, match="2-D"):
            make_hybrid_mesh(axis_names=("data",))

    def test_ensemble_fit_runs_on_hybrid_mesh(self):
        """End-to-end: the SPMD ensemble trains over a hybrid mesh exactly
        as over a plain one (same seeds, same losses)."""
        from dis_project_tpu.parallel import make_hybrid_mesh

        d0 = P53Data(replicate=0, source="synthetic")
        X, y, _ = dataset_3d(d0)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        p0 = simm.init_params(5)
        y_batch = jnp.broadcast_to(y.reshape(1, -1), (4, y.size))

        hybrid = make_hybrid_mesh(model_axis=2, slice_id=self._fake_slices(2))
        plain = make_mesh((4, 2))
        _, h_hybrid = fit_ensemble(model, p0, hybrid, X, y_batch, num_iters=5)
        _, h_plain = fit_ensemble(model, p0, plain, X, y_batch, num_iters=5)
        np.testing.assert_allclose(
            np.asarray(h_hybrid), np.asarray(h_plain), rtol=1e-6
        )
