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
