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
