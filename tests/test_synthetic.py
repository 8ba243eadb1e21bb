"""Synthetic data generators: shape/API contract, internal consistency of
the exact prior sampler, and cross-validation of the two independent
generation paths (closed-form kernels vs ODE quadrature)."""

import jax
import jax.numpy as jnp
import numpy as np

from dis_project_tpu.data import synthetic
from dis_project_tpu.data.dataset import dataset_3d, train_arrays
from dis_project_tpu.models import simm


def small_cfg(**kw):
    base = dict(
        num_genes=4, num_timepoints=12, num_replicates=2, noise_std=0.05
    )
    base.update(kw)
    return synthetic.SyntheticConfig(**base)


class TestSamplePrior:
    def test_shapes_and_p53data_compat(self):
        cfg = small_cfg()
        data = synthetic.sample_prior(jax.random.PRNGKey(0), cfg)
        assert data.gene_expressions.shape == (2, 4, 12)
        assert data.gene_variances.shape == (2, 4, 12)
        assert data.num_genes == 4 and data.num_replicates == 2
        X, y, var = dataset_3d(data)
        assert X.shape == (2 * 4 * 12, 3)
        assert y.shape == (2 * 4 * 12, 1)
        b, s, d = data.params_ground_truth()
        assert b.shape == (4,)

    def test_replicates_share_latent_draw(self):
        cfg = small_cfg(noise_std=0.0)
        data = synthetic.sample_prior(jax.random.PRNGKey(1), cfg)
        np.testing.assert_allclose(
            np.asarray(data.gene_expressions[0]),
            np.asarray(data.gene_expressions[1]),
            atol=1e-12,
        )

    def test_deterministic_in_key(self):
        cfg = small_cfg()
        a = synthetic.sample_prior(jax.random.PRNGKey(2), cfg)
        b = synthetic.sample_prior(jax.random.PRNGKey(2), cfg)
        np.testing.assert_array_equal(
            np.asarray(a.gene_expressions), np.asarray(b.gene_expressions)
        )
        c = synthetic.sample_prior(jax.random.PRNGKey(3), cfg)
        assert not np.allclose(
            np.asarray(a.gene_expressions), np.asarray(c.gene_expressions)
        )

    def test_mll_at_truth_beats_perturbed(self):
        """The exact prior draw must score higher under the generating
        hyperparameters than under badly perturbed ones."""
        cfg = small_cfg(num_replicates=1, noise_std=0.1)
        data = synthetic.sample_prior(jax.random.PRNGKey(4), cfg)
        X, y, _ = train_arrays(data)
        model = simm.ExactSIMM(num_genes=cfg.num_genes, jitter=1e-6)
        p = data.params_true
        true = simm.SIMMParams(
            basal=p["basal"],
            sensitivity=p["sensitivity"],
            decay=p["decay"],
            lengthscale=p["lengthscale"],
            obs_stddev=jnp.asarray(cfg.noise_std, y.dtype),
        )
        bad = true._replace(
            decay=true.decay * 5.0, lengthscale=jnp.asarray(0.6, y.dtype)
        )
        assert float(model.mll(true, X, y)) > float(model.mll(bad, X, y))


class TestGenerateODE:
    def test_shapes(self):
        cfg = small_cfg()
        data = synthetic.generate_ode(jax.random.PRNGKey(0), cfg, oversample=8)
        assert data.gene_expressions.shape == (2, 4, 12)
        assert data.f_true.shape == (12,)

    def test_initial_condition_is_basal_over_decay(self):
        cfg = small_cfg(noise_std=0.0, num_replicates=1)
        data = synthetic.generate_ode(jax.random.PRNGKey(5), cfg, oversample=8)
        b, s, d = data.params_ground_truth()
        np.testing.assert_allclose(
            np.asarray(data.gene_expressions[0, :, 0]), b / d, rtol=1e-6
        )

    def test_ode_residual_matches_force(self):
        """d x/dt + D x - B must reconstruct S * f(t) — checks the
        quadrature path solves the right ODE, independent of any kernel."""
        cfg = small_cfg(noise_std=0.0, num_replicates=1, num_timepoints=101)
        data = synthetic.generate_ode(jax.random.PRNGKey(6), cfg, oversample=32)
        b, s, d = data.params_ground_truth()
        t = np.asarray(data.timepoints)
        x = np.asarray(data.gene_expressions[0])  # (G, T)
        f = np.asarray(data.f_true)
        dxdt = np.gradient(x, t, axis=1)
        recon = (dxdt + d[:, None] * x - b[:, None]) / s[:, None]
        # interior points only — numerical gradient is poor at the ends
        err = np.abs(recon[:, 5:-5] - f[None, 5:-5]).max()
        assert err < 0.05

    def test_generate_ode2_shapes_and_ic(self):
        cfg = small_cfg(noise_std=0.0, num_replicates=1)
        data = synthetic.generate_ode2(jax.random.PRNGKey(8), cfg, oversample=8)
        b, s, a, w = data.params_ground_truth()
        assert data.gene_expressions.shape == (1, 4, 12)
        # resting initial condition x(0) = B / (alpha^2 + omega^2)
        np.testing.assert_allclose(
            np.asarray(data.gene_expressions[0, :, 0]),
            b / (a**2 + w**2),
            rtol=1e-6,
        )

    def test_generate_ode2_statistics_match_closed_form(self):
        """Covariance of many second-order ODE draws must match k_xx2 —
        the generator and ops/lfm_kernels2 are independent implementations."""
        from dis_project_tpu.ops import lfm_kernels2 as lfk2

        cfg = synthetic.SyntheticConfig(
            num_genes=1, num_timepoints=5, num_replicates=1, noise_std=0.0,
            basal_range=(0.02, 0.02), sensitivity_range=(1.0, 1.0),
        )
        draws = []
        for i in range(200):
            d = synthetic.generate_ode2(
                jax.random.PRNGKey(300 + i), cfg, oversample=16,
                alpha_range=(0.5, 0.5), omega_range=(1.0, 1.0),
            )
            draws.append(np.asarray(d.gene_expressions[0, 0]))
        draws = np.stack(draws) - 0.02 / (0.25 + 1.0)
        emp = np.cov(draws.T, bias=True)
        t = jnp.linspace(0, 12.0, 5)
        K = np.asarray(
            lfk2.k_xx2_block(
                t, t, jnp.full((1,), 0.5), jnp.full((1,), 1.0),
                jnp.full((1,), 1.0), jnp.asarray(2.5),
            )
        )
        assert np.abs(emp - K).max() < 0.35 * np.abs(K).max()

    def test_prior_and_ode_paths_agree_statistically(self):
        """Gene-gene covariance of many ODE-integrated draws must match the
        closed-form k_xx the exact sampler uses — the two generators are
        independent implementations of the same process."""
        from dis_project_tpu.ops import lfm_kernels as lfk

        cfg = synthetic.SyntheticConfig(
            num_genes=1,
            num_timepoints=5,
            num_replicates=1,
            noise_std=0.0,
            decay_range=(0.5, 0.5),
            sensitivity_range=(1.0, 1.0),
            basal_range=(0.02, 0.02),
        )
        draws = []
        for i in range(200):
            data = synthetic.generate_ode(
                jax.random.PRNGKey(100 + i), cfg, oversample=16
            )
            draws.append(np.asarray(data.gene_expressions[0, 0]))
        draws = np.stack(draws)  # (200, T)
        emp = np.cov(draws.T, bias=True)
        t = jnp.linspace(0, 12.0, 5)
        K = np.asarray(
            lfk.k_xx_block(
                t, t, jnp.full((1,), 0.5), jnp.full((1,), 1.0), jnp.asarray(2.5)
            )
        )
        # 200 draws -> sampling s.e. ~ K*sqrt(2/200) ~ 10%; loose tolerance
        scale = np.abs(K).max()
        assert np.abs(emp - K).max() < 0.35 * scale
