"""Nonlinear-response LFM: linear-case parity oracles + nonlinear recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.data.dataset import P53Data, train_arrays
from dis_project_tpu.data.synthetic import (
    SyntheticConfig,
    generate_ode,
    generate_ode_nonlinear,
)
from dis_project_tpu.models import nlfm, simm
from dis_project_tpu.models.nlfm import NonlinearLFM


def _corr(a, b):
    return float(np.corrcoef(np.asarray(a), np.asarray(b))[0, 1])


def test_nonlinear_generator_identity_reduces_to_linear():
    key = jax.random.PRNGKey(3)
    a = generate_ode(key)
    b = generate_ode_nonlinear(key, response="identity")
    np.testing.assert_array_equal(
        np.asarray(a.gene_expressions), np.asarray(b.gene_expressions)
    )
    np.testing.assert_array_equal(np.asarray(a.f_true), np.asarray(b.f_true))


def test_generator_rejects_unknown_response():
    with pytest.raises(ValueError, match="unknown response"):
        generate_ode_nonlinear(jax.random.PRNGKey(0), response="tanh")


class TestLinearCaseParity:
    """With g = identity the model IS the discretised linear SIMM: the
    quadratic log-joint's exact optimum (one Newton step from w = 0) must
    reproduce the exact GP family's closed-form latent posterior mean."""

    def _setup(self):
        data = P53Data(replicate=0, source="synthetic")
        X, y, var = train_arrays(data)
        model = NonlinearLFM(
            num_genes=data.num_genes, response="identity", t_max=12.0,
            num_quad=193,
        )
        params = nlfm.init_params(data.num_genes, model.num_quad)
        # Fixed reference kinetics — parity is at matched hyperparameters.
        # latent_predict's Sigma is Kxx + diag(var) + jitter*I; it
        # deliberately EXCLUDES the learned obs noise (the reference's
        # variance asymmetry, src/model.py:446-449), so zero it here to
        # make both likelihoods identical.
        params = params._replace(
            kinetics=params.kinetics._replace(
                obs_stddev=jnp.asarray(1e-8, params.w.dtype)
            )
        )
        t_obs = jnp.asarray(data.timepoints)
        Y = jnp.asarray(data.gene_expressions)
        V = jnp.asarray(data.gene_variances)
        return data, model, params, t_obs, Y, V, X, y, var

    def _newton_map(self, model, params, t_obs, Y, V):
        def obj(w):
            return model.log_joint(params._replace(w=w), t_obs, Y, V)

        g0 = jax.grad(obj)(params.w)
        H = -jax.hessian(obj)(params.w)
        w_map = jnp.linalg.solve(H, g0)
        return params._replace(w=w_map), H

    def test_map_matches_exact_posterior_mean(self):
        data, model, params, t_obs, Y, V, X, y, var = self._setup()
        p_map, _ = self._newton_map(model, params, t_obs, Y, V)
        f_map = model.force(p_map)

        exact = simm.ExactSIMM(num_genes=data.num_genes, jitter=1e-6)
        grid = model.quad_grid()
        rows = jnp.stack(
            [grid, -jnp.ones_like(grid), jnp.zeros_like(grid)], axis=-1
        )
        post = exact.latent_predict(params.kinetics, rows, X, y, var)
        # Quadrature + interpolation error ~ (dt/l)^2; dt = 12/192.
        err = float(jnp.max(jnp.abs(f_map - post.mean)))
        scale = float(jnp.max(jnp.abs(post.mean)))
        assert err < 5e-3 * max(scale, 1.0), err
        assert _corr(f_map, post.mean) > 0.99999

    def test_laplace_cov_matches_linear_gaussian_formula(self):
        data, model, params, t_obs, Y, V, *_ = self._setup()
        p_map, H = self._newton_map(model, params, t_obs, Y, V)
        lap = model.laplace_force_posterior(p_map, t_obs, Y, V)
        L = model.force_chol(params.kinetics.lengthscale, params.w.dtype)
        want = L @ jnp.linalg.inv(
            H + model.jitter * jnp.eye(H.shape[0], dtype=H.dtype)
        ) @ L.T + model.jitter * jnp.eye(H.shape[0], dtype=H.dtype)
        np.testing.assert_allclose(
            np.asarray(lap.cov), np.asarray(want), rtol=1e-8, atol=1e-12
        )
        # Posterior must contract the prior: std(f) <= prior std (= 1 on
        # the RBF diagonal) everywhere, strictly at observed times.
        assert float(jnp.max(lap.stddev())) <= 1.0 + 1e-6
        np.testing.assert_allclose(
            np.asarray(lap.mean), np.asarray(model.force(p_map)), rtol=1e-10
        )


def test_laplace_curve_bands_shapes_and_mean():
    data = P53Data(replicate=0, source="synthetic")
    model = NonlinearLFM(num_genes=data.num_genes, response="exp",
                         num_quad=33)
    params = nlfm.init_params(data.num_genes, model.num_quad)
    params = params._replace(
        w=0.1 * jnp.sin(jnp.arange(model.num_quad, dtype=params.w.dtype))
    )
    t_obs = jnp.asarray(data.timepoints)
    Y = jnp.asarray(data.gene_expressions)
    V = jnp.asarray(data.gene_variances)
    bands = model.laplace_curve_bands(params, t_obs, Y, V)
    GQ = data.num_genes * model.num_quad
    assert bands.mean.shape == (GQ,)
    assert bands.cov.shape == (GQ, GQ)
    np.testing.assert_allclose(
        np.asarray(bands.mean),
        np.asarray(model.curves(params)).reshape(-1),
        rtol=1e-10,
    )
    # Delta-method variance is PSD-diagonal and finite.
    v = np.diag(np.asarray(bands.cov))
    assert np.isfinite(v).all() and (v >= -1e-10).all()


def test_exp_response_recovery():
    # Generate from the exp-response ODE, fit MAP, recover the force shape.
    cfg = SyntheticConfig(
        num_genes=5, num_timepoints=12, num_replicates=2, t_max=12.0,
        noise_std=0.05,
    )
    data = generate_ode_nonlinear(jax.random.PRNGKey(7), cfg, response="exp")
    model = NonlinearLFM(
        num_genes=cfg.num_genes, response="exp", t_max=cfg.t_max, num_quad=97
    )
    params = nlfm.init_params(cfg.num_genes, model.num_quad)
    Y = jnp.asarray(data.gene_expressions)
    V = jnp.asarray(data.gene_variances)
    fitted, hist = nlfm.fit(
        model, params, jnp.asarray(data.timepoints), Y, V,
        num_iters=1500, learning_rate=0.02,
    )
    assert float(hist[-1]) < float(hist[0])
    f_grid = model.force(fitted)
    # Compare at the observation times (f_true lives there); the exp
    # response has a shift degeneracy (f+c, S e^{-c}) — corr is shift-
    # invariant, which is exactly the right metric.
    f_at_obs = jnp.interp(
        jnp.asarray(data.timepoints), model.quad_grid(), f_grid
    )
    assert _corr(f_at_obs, data.f_true) > 0.9


def test_fit_smoke_fix_params_and_curves_shape():
    data = P53Data(replicate=0, source="synthetic")
    model = NonlinearLFM(num_genes=data.num_genes, response="softplus",
                         num_quad=49)
    params = nlfm.init_params(data.num_genes, model.num_quad)
    Y = jnp.asarray(data.gene_expressions)
    V = jnp.asarray(data.gene_variances)
    fitted, hist = nlfm.fit(
        model, params, jnp.asarray(data.timepoints), Y, V,
        num_iters=50, fix_params=True,
        clamp_gene=data.gene_names.index("p21"),
    )
    i = data.gene_names.index("p21")
    np.testing.assert_allclose(float(fitted.kinetics.sensitivity[i]), 1.0,
                               rtol=1e-6)
    np.testing.assert_allclose(float(fitted.kinetics.decay[i]), 0.8,
                               rtol=1e-6)
    x = model.curves(fitted)
    assert x.shape == (data.num_genes, model.num_quad)
    assert np.isfinite(np.asarray(x)).all()


def test_log_joint_broadcasts_replicates():
    """(R, G, T) observations broadcast against the (G, T) clean curves:
    the joint with R identical replicates equals likelihood x R plus one
    prior term."""
    data = P53Data(replicate=0, source="synthetic")
    model = NonlinearLFM(num_genes=data.num_genes, response="exp",
                         num_quad=33)
    params = nlfm.init_params(data.num_genes, model.num_quad)
    params = params._replace(
        w=0.05 * jnp.cos(jnp.arange(model.num_quad, dtype=params.w.dtype))
    )
    t_obs = jnp.asarray(data.timepoints)
    Y1 = jnp.asarray(data.gene_expressions)  # (1, G, T)
    V1 = jnp.asarray(data.gene_variances)
    Y3 = jnp.concatenate([Y1] * 3)  # (3, G, T)
    V3 = jnp.concatenate([V1] * 3)
    lj1 = float(model.log_joint(params, t_obs, Y1, V1))
    lj3 = float(model.log_joint(params, t_obs, Y3, V3))
    logprior = -0.5 * float(jnp.sum(params.w**2)) \
        - 0.5 * params.w.size * nlfm.LOG_2PI
    np.testing.assert_allclose(lj3 - logprior, 3 * (lj1 - logprior),
                               rtol=1e-12)


def test_laplace_posteriors_matches_individual_calls():
    data = P53Data(replicate=0, source="synthetic")
    model = NonlinearLFM(num_genes=data.num_genes, response="softplus",
                         num_quad=25)
    params = nlfm.init_params(data.num_genes, model.num_quad)
    t_obs = jnp.asarray(data.timepoints)
    Y = jnp.asarray(data.gene_expressions)
    V = jnp.asarray(data.gene_variances)
    force, curves = model.laplace_posteriors(params, t_obs, Y, V)
    f2 = model.laplace_force_posterior(params, t_obs, Y, V)
    c2 = model.laplace_curve_bands(params, t_obs, Y, V)
    np.testing.assert_allclose(np.asarray(force.cov), np.asarray(f2.cov),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(curves.cov), np.asarray(c2.cov),
                               rtol=1e-12)
    # The jitter floor keeps the plotted band diagonals nonnegative.
    assert np.diag(np.asarray(curves.cov)).min() > 0


def test_hmc_smoke():
    data = P53Data(replicate=0, source="synthetic")
    model = NonlinearLFM(num_genes=data.num_genes, response="exp",
                         num_quad=33)
    params = nlfm.init_params(data.num_genes, model.num_quad)
    Y = jnp.asarray(data.gene_expressions)
    V = jnp.asarray(data.gene_variances)
    fitted, _ = nlfm.fit(model, params, jnp.asarray(data.timepoints), Y, V,
                         num_iters=200)
    res = nlfm.force_posterior_hmc(
        model, fitted, jnp.asarray(data.timepoints), Y, V,
        jax.random.PRNGKey(0), num_warmup=100, num_samples=50,
        num_leapfrog=8,
    )
    assert float(res.accept_rate) > 0.2
    assert np.isfinite(np.asarray(res.log_probs)).all()
    assert res.samples.w.shape == (50, model.num_quad)
