"""Golden-value regression tests (f64 CPU).

Freezes the canonical pipeline's numerical outputs so behavioral drift in
any layer (kernels, MLL, bijectors, trainer, clamp schedule, data
generation) is caught immediately. Values were produced by the verified
implementation whose closed forms match brute-force quadrature and whose
MLL/gradients match the independent torch stack to 1e-8 — and whose
f64-emulated TPU run reproduces them to 3e-6.

All golden numbers assume the synthetic data source with seed 0 (the CSV
source is environment-dependent and not checked in).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.data.dataset import P53Data, train_arrays
from dis_project_tpu.models import simm
from dis_project_tpu.training import trainer as tr


@pytest.fixture(scope="module")
def canonical():
    data = P53Data(replicate=0, source="synthetic", seed=0)
    X, y, var = train_arrays(data)
    return data, X, y, var


MODEL = simm.ExactSIMM(num_genes=5, jitter=1e-4)


class TestGoldenValues:
    def test_mll_at_reference_init(self, canonical):
        """MLL at the reference's exact init (B=.05, S=1, D=.4, l=2.5,
        obs=1) on the seed-0 synthetic replicate 0."""
        _, X, y, _ = canonical
        got = float(MODEL.mll(simm.init_params(5), X, y))
        assert got == pytest.approx(-43.69118241179048, abs=1e-8)

    def test_canonical_training_final_loss(self, canonical):
        """150-iteration Adam(0.01) run with the p21 clamp — the CLI's
        headline number."""
        _, X, y, _ = canonical
        res = tr.fit(MODEL, simm.init_params(5), X, y, tr.TrainConfig())
        assert float(res.history[-1]) == pytest.approx(
            4.810708070243, abs=1e-6
        )

    def test_trained_kinetics(self, canonical):
        _, X, y, _ = canonical
        res = tr.fit(MODEL, simm.init_params(5), X, y, tr.TrainConfig())
        np.testing.assert_allclose(
            np.asarray(res.params.decay),
            [0.31840186, 0.41880947, 0.36782237, 0.8, 0.36906359],
            atol=2e-4,
        )
        assert float(res.params.sensitivity[3]) == 1.0  # p21 clamp
        assert float(res.params.decay[3]) == pytest.approx(0.8)

    def test_latent_posterior_golden_probe(self, canonical):
        """Posterior mean of the latent force at three probe times after
        the canonical fit."""
        data, X, y, var = canonical
        res = tr.fit(MODEL, simm.init_params(5), X, y, tr.TrainConfig())
        t_probe = jnp.asarray([2.0, 6.0, 11.0])
        rows = jnp.stack(
            [t_probe, -jnp.ones(3), jnp.zeros(3)], axis=-1
        )
        post = MODEL.latent_predict(res.params, rows, X, y, var)
        np.testing.assert_allclose(
            np.asarray(post.mean),
            [1.34483514, 1.31897536, 0.1286597],
            atol=2e-4,
        )


def _regen():  # pragma: no cover — helper to refresh the numbers
    data = P53Data(replicate=0, source="synthetic", seed=0)
    X, y, var = train_arrays(data)
    print("mll@init:", repr(float(MODEL.mll(simm.init_params(5), X, y))))
    res = tr.fit(MODEL, simm.init_params(5), X, y, tr.TrainConfig())
    print("final loss:", repr(float(res.history[-1])))
    print("decay:", np.asarray(res.params.decay))
    t_probe = jnp.asarray([2.0, 6.0, 11.0])
    rows = jnp.stack([t_probe, -jnp.ones(3), jnp.zeros(3)], axis=-1)
    print("f probe:", np.asarray(MODEL.latent_predict(res.params, rows, X, y, var).mean))


if __name__ == "__main__":
    _regen()
