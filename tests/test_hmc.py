"""HMC hyperparameter-posterior tests: exact moments on a Gaussian
target, the bijector Jacobian vs autodiff, and the p53 kinetics
posterior end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.models import simm
from dis_project_tpu.ops import bijectors as bij
from dis_project_tpu.training import hmc


def test_gaussian_moments():
    """Samples from a correlated 2-D Gaussian must reproduce its
    mean/covariance within Monte-Carlo error."""
    mean = jnp.asarray([1.5, -2.0])
    cov = jnp.asarray([[1.0, 0.6], [0.6, 0.8]])
    prec = jnp.linalg.inv(cov)

    def logp(q):
        d = q - mean
        return -0.5 * d @ prec @ d

    res = hmc.sample(
        logp,
        jnp.zeros(2),
        jax.random.PRNGKey(0),
        num_warmup=500,
        num_samples=2000,
        num_leapfrog=16,
    )
    qs = np.asarray(res.samples)
    assert float(res.accept_rate) > 0.6
    np.testing.assert_allclose(qs.mean(0), np.asarray(mean), atol=0.12)
    np.testing.assert_allclose(np.cov(qs.T), np.asarray(cov), atol=0.25)


def test_constrain_log_det_matches_autodiff():
    """constrain_log_det must equal the log|det| of the full constrain
    Jacobian (elementwise transform -> sum of log-derivatives)."""
    raw = simm.unconstrain(simm.init_params(3))
    flat, unravel = jax.flatten_util.ravel_pytree(raw)

    def constrain_flat(f):
        out = simm.constrain(unravel(f))
        return jax.flatten_util.ravel_pytree(out)[0]

    J = jax.jacobian(constrain_flat)(flat)
    want = float(jnp.linalg.slogdet(J)[1])
    got = float(bij.constrain_log_det(raw, simm.SIMM_BIJECTORS))
    assert got == pytest.approx(want, rel=1e-10)


def test_kinetics_posterior_p53():
    """Short chain on the canonical p53 problem: healthy acceptance,
    finite samples, posterior concentrated near plausible kinetics."""
    from dis_project_tpu.data.dataset import P53Data, dataset_3d

    data = P53Data(replicate=0, source="synthetic")
    X, y, _ = dataset_3d(data)
    X, y = jnp.asarray(X), jnp.asarray(y)
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    res = hmc.kinetics_posterior(
        model,
        simm.init_params(5),
        X,
        y,
        jax.random.PRNGKey(1),
        num_warmup=150,
        num_samples=150,
        num_leapfrog=16,
    )
    assert 0.2 < float(res.accept_rate) <= 1.0
    for leaf in jax.tree.leaves(res.samples):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # Constrained-space samples respect the constraints.
    assert float(jnp.min(res.samples.decay)) > 0.0
    ell = np.asarray(res.samples.lengthscale)
    assert ell.min() > 0.5 and ell.max() < 3.5
    # The posterior mass sits at a higher MLL than the init point.
    init_mll = float(model.mll(simm.init_params(5), X, y))
    assert float(np.mean(np.asarray(res.log_probs))) > init_mll


# -- multi-chain layer + convergence diagnostics (r2 late) -------------------


def test_split_rhat_and_ess_synthetic():
    rng = np.random.default_rng(0)
    iid = rng.normal(size=(4, 800))
    assert abs(hmc.split_rhat(iid) - 1.0) < 0.02
    ess = hmc.effective_sample_size(iid)
    assert 0.6 * 3200 < ess < 1.6 * 3200
    # Two chains stuck at different modes: R-hat must blow up.
    stuck = np.stack([
        rng.normal(0.0, 0.01, 800), rng.normal(1.0, 0.01, 800)
    ])
    assert hmc.split_rhat(stuck) > 5.0
    # AR(0.9) chains: ESS should land near CS * (1-rho)/(1+rho).
    ar = np.empty((4, 2000))
    for c in range(4):
        e = rng.normal(size=2000)
        z = 0.0
        for t in range(2000):
            z = 0.9 * z + e[t]
            ar[c, t] = z
    ess_ar = hmc.effective_sample_size(ar)
    want = 4 * 2000 * 0.1 / 1.9
    assert 0.4 * want < ess_ar < 2.5 * want
    # Trailing-shape handling.
    both = np.stack([iid, iid], axis=-1)  # (4, 800, 2)
    assert hmc.split_rhat(both).shape == (2,)
    assert hmc.effective_sample_size(both).shape == (2,)


def test_sample_chains_gaussian():
    """4 chains on a 2-D Gaussian: correct moments, healthy diagnostics,
    chain 0 embeds the single-chain run (same key, same start)."""
    mean = jnp.asarray([1.5, -2.0])

    def logp(q):
        return -0.5 * jnp.sum((q - mean) ** 2)

    key = jax.random.PRNGKey(3)
    res = hmc.sample_chains(
        logp, jnp.zeros(2), key, num_chains=4,
        num_warmup=300, num_samples=400, num_leapfrog=12,
    )
    qs = np.asarray(res.samples)
    assert qs.shape == (4, 400, 2)
    assert res.accept_rate.shape == (4,)
    assert (np.asarray(res.accept_rate) > 0.4).all()
    pooled = qs.reshape(-1, 2)
    np.testing.assert_allclose(pooled.mean(0), np.asarray(mean), atol=0.15)
    np.testing.assert_allclose(pooled.std(0), 1.0, atol=0.15)
    rhat_max, ess_min = hmc.pytree_diagnostics(res.samples)
    assert rhat_max < 1.1
    assert ess_min > 100


def test_sample_chains_sharded():
    """Sharding the chain axis over the virtual mesh: same shapes, healthy
    chains, same target distribution. Bitwise draw parity is NOT expected
    — partitioning changes XLA fusion rounding, and one ulp in a
    Hamiltonian flips a Metropolis accept (measured; see sample_chains
    notes) — so the check is statistical."""
    from dis_project_tpu.parallel import make_mesh

    def logp(q):
        return -0.5 * jnp.sum(q**2)

    key = jax.random.PRNGKey(5)
    kw = dict(num_warmup=150, num_samples=200, num_leapfrog=8)
    plain = hmc.sample_chains(logp, jnp.zeros(3), key, num_chains=8, **kw)
    mesh = make_mesh()  # ('data': 8) leading axis over the virtual devices
    shard = hmc.sample_chains(
        logp, jnp.zeros(3), key, num_chains=8, mesh=mesh,
        axis=mesh.axis_names[0], **kw
    )
    assert np.asarray(shard.samples).shape == np.asarray(plain.samples).shape
    assert (np.asarray(shard.accept_rate) > 0.4).all()
    for res in (plain, shard):
        pooled = np.asarray(res.samples).reshape(-1, 3)
        np.testing.assert_allclose(pooled.mean(0), 0.0, atol=0.2)
        np.testing.assert_allclose(pooled.std(0), 1.0, atol=0.2)


def test_kinetics_posterior_multichain_p53():
    """2 short chains on the p53 posterior: (C, S) leading axes, finite
    constrained samples, diagnostics computable."""
    from dis_project_tpu.data.dataset import P53Data, dataset_3d

    data = P53Data(replicate=0, source="synthetic")
    X, y, _ = dataset_3d(data)
    X, y = jnp.asarray(X), jnp.asarray(y)
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    res = hmc.kinetics_posterior(
        model, simm.init_params(5), X, y, jax.random.PRNGKey(2),
        num_warmup=60, num_samples=60, num_leapfrog=8, num_chains=2,
    )
    assert res.samples.decay.shape == (2, 60, 5)
    assert res.accept_rate.shape == (2,)
    for leaf in jax.tree.leaves(res.samples):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    rhat_max, ess_min = hmc.pytree_diagnostics(res.samples)
    assert np.isfinite(rhat_max) and ess_min > 1


def test_mixture_predict_exact_moments():
    """mixture_predict must reproduce the closed-form mixture moments:
    mean = E[mu_s], cov = E[Sigma_s] + Cov[mu_s] (law of total
    covariance), checked against a hand-computed 2-component mixture."""
    from dis_project_tpu.models.base import Gaussian

    mus = jnp.asarray([[0.0, 2.0], [4.0, -2.0]])
    covs = jnp.asarray([np.eye(2), 3.0 * np.eye(2)])

    def predict(i):
        return Gaussian(mean=mus[i], cov=covs[i])

    mixed, comp = hmc.mixture_predict(predict, jnp.arange(2))
    assert comp.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(mixed.mean), [2.0, 0.0], rtol=1e-6)
    # E[Sigma] = 2 I; Cov[mu] = [[4, -4], [-4, 4]].
    np.testing.assert_allclose(
        np.asarray(mixed.cov), [[6.0, -4.0], [-4.0, 6.0]], rtol=1e-6
    )


def test_mixture_predict_thins_evenly():
    """max_components thins the draw axis evenly: with S=10 draws and 4
    components the sweep must touch exactly draws {0, 3, 6, 9}."""
    from dis_project_tpu.models.base import Gaussian

    seen = jnp.arange(10.0)

    def predict(v):
        return Gaussian(mean=v[None], cov=jnp.zeros((1, 1)))

    mixed, comp = hmc.mixture_predict(predict, seen, max_components=4)
    np.testing.assert_allclose(np.asarray(comp).ravel(), [0.0, 3.0, 6.0, 9.0])
    assert float(mixed.mean[0]) == pytest.approx(4.5)


def test_mixture_latent_force_p53():
    """End-to-end BMA on the p53 problem: the mixture over a 2-draw
    'posterior' of distinct kinetics matches a hand-averaged pair of
    latent_predict calls, and widens the band vs either component."""
    from dis_project_tpu.data.dataset import P53Data, dataset_3d
    from dis_project_tpu.utils.test_grids import latent_grid

    data = P53Data(replicate=0, source="synthetic")
    X, y, var = dataset_3d(data)
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    p0 = simm.init_params(5, dtype=X.dtype)
    p1 = p0._replace(lengthscale=p0.lengthscale * 1.3)
    stacked = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), p0, p1
    )
    t_grid = latent_grid(20)

    predict = lambda p: model.latent_predict(p, t_grid, X, y, var)
    mixed, comp = hmc.mixture_predict(predict, stacked)

    d0, d1 = predict(p0), predict(p1)
    np.testing.assert_allclose(
        np.asarray(mixed.mean),
        np.asarray((d0.mean + d1.mean) / 2),
        rtol=1e-6, atol=1e-8,
    )
    manual_var = (
        (d0.variance() + d1.variance()) / 2
        + (d0.mean - d1.mean) ** 2 / 4
    )
    np.testing.assert_allclose(
        np.asarray(mixed.variance()), np.asarray(manual_var),
        rtol=1e-5, atol=1e-8,
    )
    # Disagreement between components must only ever widen the band.
    assert np.all(
        np.asarray(mixed.variance())
        >= np.minimum(np.asarray(d0.variance()), np.asarray(d1.variance()))
        - 1e-12
    )


def test_mixture_predict_drops_nonfinite_components():
    """A draw whose predictive is non-finite (the reference k_xx family is
    indefinite at large D*l, so unclamped draws can legitimately fail the
    predictive Cholesky) must be dropped, not poison the mixture."""
    from dis_project_tpu.models.base import Gaussian

    mus = jnp.asarray([[1.0, 3.0], [jnp.nan, 0.0], [3.0, 5.0]])
    covs = jnp.stack([jnp.eye(2)] * 3)

    def predict(i):
        return Gaussian(mean=mus[i], cov=covs[i])

    mixed, comp = hmc.mixture_predict(predict, jnp.arange(3))
    assert comp.shape == (2, 2)  # the NaN component is gone
    np.testing.assert_allclose(np.asarray(mixed.mean), [2.0, 4.0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mixed.cov), [[2.0, 1.0], [1.0, 2.0]], rtol=1e-6
    )

    # All components non-finite: NaN Gaussian + zero components, so the
    # caller can skip instead of plotting an empty band.
    def predict_bad(i):
        return Gaussian(mean=mus[1], cov=covs[i])

    mixed_bad, comp_bad = hmc.mixture_predict(predict_bad, jnp.arange(2))
    assert comp_bad.shape[0] == 0
    assert not bool(jnp.isfinite(mixed_bad.mean).any())
