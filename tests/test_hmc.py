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
