"""Cross-framework validation: the independent torch (f64, CPU, eager,
blockwise-assembly) implementation must agree with the JAX framework — the
same integration test the reference runs between its GPJax and GPyTorch
stacks (SURVEY.md §4).

Comparisons account for the reference's deliberate noise-convention
asymmetry: the torch-side MLL includes the fixed measurement variances
in-kernel, the GPJax-side MLL does not (SURVEY.md §2 #15 vs #24) — so the
JAX MLL here is evaluated with the variances added explicitly.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from dis_project_tpu.data.dataset import P53Data, train_arrays
from dis_project_tpu.models import simm
from dis_project_tpu.ops import gram as gram_ops
from dis_project_tpu.ops import mll as mll_ops
from dis_project_tpu.validation.torch_lfm import TorchSIMM


@pytest.fixture(scope="module")
def problem():
    data = P53Data(replicate=0, source="synthetic")
    X, y, var = train_arrays(data)
    tm = TorchSIMM(
        num_genes=data.num_genes,
        timepoints=torch.tensor(np.asarray(data.timepoints)),
        variances=torch.tensor(np.asarray(var)),
        jitter=1e-4,
        num_replicates=1,
    )
    tm.set_train_targets(torch.tensor(np.asarray(y)))
    return data, X, y, var, tm


def _jax_mll_with_variances(params, X, y, var, jitter=1e-4):
    """JAX exact MLL with the torch noise convention (variances included)."""
    model = simm.ExactSIMM(num_genes=5, jitter=jitter)
    K = gram_ops.gram(X, params.decay, params.sensitivity, params.lengthscale)
    sigma = mll_ops.add_diagonal(
        K, var.reshape(-1) + jitter + params.obs_stddev**2
    )
    mx = model.mean_function(params, X)
    return mll_ops.mvn_logpdf(y.reshape(-1), mx, sigma)


class TestStaticParity:
    def test_gram_matrices_agree(self, problem):
        data, X, y, var, tm = problem
        params = simm.init_params(5)
        K_jax = np.asarray(
            gram_ops.gram(X, params.decay, params.sensitivity, params.lengthscale)
        )
        K_torch = tm.gram(add_noise_diag=False).detach().numpy()
        np.testing.assert_allclose(K_torch, K_jax, atol=1e-10)

    def test_mean_functions_agree(self, problem):
        data, X, y, var, tm = problem
        params = simm.init_params(5)
        model = simm.ExactSIMM(num_genes=5)
        m_jax = np.asarray(model.mean_function(params, X))
        np.testing.assert_allclose(tm.mean().detach().numpy(), m_jax, atol=1e-12)

    def test_mll_at_init_agrees(self, problem):
        data, X, y, var, tm = problem
        params = simm.init_params(5)
        got_t = float(tm.mll(torch.tensor(np.asarray(y))).detach())
        got_j = float(_jax_mll_with_variances(params, X, y, var))
        assert got_t == pytest.approx(got_j, abs=1e-8)

    def test_mll_gradients_agree(self, problem):
        """Gradients w.r.t. the RAW (unconstrained) parameters: torch
        autograd through eager blockwise assembly vs the JAX custom-VJP
        through the vectorised Gram — completely disjoint code paths."""
        import jax

        data, X, y, var, tm = problem
        loss_t = -tm.mll(torch.tensor(np.asarray(y)))
        loss_t.backward()

        def jax_loss(raw):
            return -_jax_mll_with_variances(simm.constrain(raw), X, y, var)

        raw = simm.unconstrain(simm.init_params(5))
        g = jax.grad(jax_loss)(raw)
        np.testing.assert_allclose(
            tm.raw_decay.grad.numpy(), np.asarray(g.decay), atol=1e-8
        )
        np.testing.assert_allclose(
            tm.raw_sensitivity.grad.numpy(), np.asarray(g.sensitivity), atol=1e-8
        )
        np.testing.assert_allclose(
            tm.raw_basal.grad.numpy(), np.asarray(g.basal), atol=1e-8
        )
        np.testing.assert_allclose(
            float(tm.raw_lengthscale.grad), float(g.lengthscale), atol=1e-8
        )
        tm.zero_grad()


class TestTrainedParity:
    def test_trained_latent_forces_correlate(self, problem):
        """Full pipeline cross-check: train both stacks independently (same
        inits, same clamp, same 150-iter Adam) and compare the inferred
        latent-force profiles — the reference's headline validation."""
        from dis_project_tpu.training import trainer as tr

        data, X, y, var, tm = problem
        hist = tm.fit(torch.tensor(np.asarray(y)), epochs=150, lr=0.01)
        assert np.isfinite(hist).all()

        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        res = tr.fit(model, simm.init_params(5), X, y, tr.TrainConfig())

        t_test = np.linspace(0.0, 13.0, 40)
        mean_t, var_t = tm.predict_f(torch.tensor(t_test))
        rows = jnp.stack(
            [
                jnp.asarray(t_test),
                -jnp.ones(40),
                jnp.zeros(40),
            ],
            axis=-1,
        )
        post_j = model.latent_predict(res.params, rows, X, y, var)

        f_t = mean_t.numpy()
        f_j = np.asarray(post_j.mean)
        corr = np.corrcoef(f_t, f_j)[0, 1]
        assert corr > 0.95
        # And both recover the shape of the true generating force at the
        # observed timepoints (synthetic source has a known profile).
        f_obs = np.asarray(data.f_observed).reshape(-1)
        t7 = np.asarray(data.timepoints)
        idx = np.argmin(np.abs(t_test[:, None] - t7[None, :]), axis=0)
        corr_t = np.corrcoef(f_t[idx], f_obs)[0, 1]
        assert corr_t > 0.7

    def test_gene_posterior_cross_check(self, problem):
        data, X, y, var, tm = problem
        t_test = np.linspace(0.0, 12.0, 20)
        means, vars_ = tm.predict_m(torch.tensor(t_test))
        assert means.shape == (5, 20)
        assert float(vars_.min()) >= 0.0
        # Posterior means at training times should track the data per gene.
        t7 = np.asarray(data.timepoints)
        idx = np.argmin(np.abs(t_test[:, None] - t7[None, :]), axis=0)
        y_blocks = np.asarray(y).reshape(5, 7)
        resid = means.numpy()[:, idx] - y_blocks
        assert np.abs(resid).mean() < 0.5
