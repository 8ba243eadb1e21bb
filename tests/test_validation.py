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


def _fresh_tm(data, var, y):
    """Untrained TorchSIMM at the shared inits (the module fixture's model
    is trained in place by the TrainedParity tests)."""
    tm = TorchSIMM(
        num_genes=data.num_genes,
        timepoints=torch.tensor(np.asarray(data.timepoints)),
        variances=torch.tensor(np.asarray(var)),
        jitter=1e-4,
        num_replicates=1,
    )
    tm.set_train_targets(torch.tensor(np.asarray(y)))
    return tm


class TestLikeForLikeAndReporting:
    def test_mll_like_for_like_at_init(self, problem):
        """include_meas_var=False makes the torch Sigma convention match
        the GPJax-side MLL exactly — the r2 parity gate (<= 1e-6; two f64
        implementations of identical math land ~1e-12)."""
        data, X, y, var, _ = problem
        tm = _fresh_tm(data, var, y)
        params = simm.init_params(5)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        got_t = float(tm.mll(torch.tensor(np.asarray(y)),
                             include_meas_var=False).detach())
        got_j = float(model.mll(params, X, y))
        assert abs(got_t - got_j) <= 1e-6

    def test_fixed_params_latent_posterior_matches(self, problem):
        data, X, y, var, _ = problem
        tm = _fresh_tm(data, var, y)
        params = simm.init_params(5)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        t_test = np.linspace(0.0, 13.0, 40)
        rows = jnp.stack(
            [jnp.asarray(t_test), -jnp.ones(40), jnp.zeros(40)], axis=-1
        )
        f_jax = np.asarray(model.latent_predict(params, rows, X, y, var).mean)
        f_torch, _ = tm.predict_f(torch.tensor(t_test))
        np.testing.assert_allclose(f_torch.numpy(), f_jax, atol=1e-9)

    def test_param_trace_and_plots(self, problem, tmp_path):
        """The torch trainer records the by-name parameter trace and the
        reference plotter surface consumes it (plotter_alfi.py:201-316)."""
        from dis_project_tpu.validation import torch_report

        data, X, y, var, tm = problem
        hist = tm.fit(torch.tensor(np.asarray(y)), epochs=3,
                      track_parameters=True)
        assert len(tm.param_trace) == 3
        assert tm.param_trace[-1]["decay"].shape == (5,)
        # p21 clamp visible in the trace
        assert tm.param_trace[-1]["sensitivity"][3] == pytest.approx(1.0)
        out = str(tmp_path)
        p1 = torch_report.plot_comparison_torch(tm.param_trace, data, out_dir=out)
        p2 = torch_report.plot_param_trace_torch(tm.param_trace, data, out_dir=out)
        t_test = np.linspace(0.0, 13.0, 20)
        mean, v = tm.predict_f(torch.tensor(t_test))
        p3 = torch_report.plot_lf_torch(t_test, mean.numpy(), v.numpy(),
                                        data, out_dir=out)
        means, vars_ = tm.predict_m(torch.tensor(t_test))
        p4 = torch_report.plot_gxpred_torch(t_test, means.numpy(),
                                            vars_.numpy(), data, out_dir=out)
        import os
        for p in (p1, p2, p3, p4):
            assert os.path.exists(p)

    def test_heldout_logpdf_chain_rule(self, problem):
        """mll(all) == mll(train marginal) + logp(heldout | train): the
        exact MVN chain rule pins the split objective AND the held-out
        conditional density to the unsplit MLL."""
        from dis_project_tpu.validation.torch_lfm import split_indices

        data, X, y, var, _ = problem
        tm = _fresh_tm(data, var, y)
        yt = torch.tensor(np.asarray(y))
        n = 35
        train, valid, test = split_indices(n, 0.2, 0.1, seed=3)
        assert sorted(torch.cat([train, valid, test]).tolist()) == list(range(n))
        heldout = torch.cat([valid, test])
        full = float(tm.mll(yt).detach())
        marg = float(tm.mll(yt, rows=train).detach())
        cond = float(tm.heldout_logpdf(yt, train, heldout))
        assert abs(full - (marg + cond)) < 1e-8

    def test_fit_with_validation_split(self, problem):
        data, X, y, var, _ = problem
        tm = _fresh_tm(data, var, y)
        yt = torch.tensor(np.asarray(y))
        hist = tm.fit(yt, epochs=3, valid_size=0.2, test_size=0.1)
        assert len(hist) == 3 and len(tm.valid_history) == 3
        assert len(tm.train_rows) + len(tm.valid_rows) + len(tm.test_rows) == 35
        assert all(np.isfinite(v) for v in tm.valid_history)
        # unsplit fit leaves every row in train and records no valid curve
        tm2 = _fresh_tm(data, var, y)
        tm2.fit(yt, epochs=1)
        assert len(tm2.train_rows) == 35 and tm2.valid_history == []

    def test_make_loaders_splits(self, problem):
        from dis_project_tpu.validation.torch_lfm import TorchP53Dataset
        from dis_project_tpu.validation import torch_report

        data, X, y, var, tm = problem
        tds = TorchP53Dataset.from_p53(data)
        train, valid, test = torch_report.make_loaders(
            tds, valid_split=0.2, test_split=0.2, seed=0
        )
        n = len(tds)
        n_items = sum(len(l.dataset) for l in (train, valid, test))
        assert n_items == n
        assert len(valid.dataset) == round(0.2 * n)
        # reference defaults: no splits -> single train loader
        train_only, v0, t0 = torch_report.make_loaders(tds)
        assert v0 is None and t0 is None and len(train_only.dataset) == n
        with pytest.raises(ValueError, match="no training data"):
            torch_report.make_loaders(tds, valid_split=0.6, test_split=0.6)
