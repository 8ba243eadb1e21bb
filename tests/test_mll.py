"""Custom-VJP MLL tests: value vs direct formula, gradients vs pure AD and
finite differences."""

import jax
import jax.flatten_util  # explicit: no lazy attribute on jax>=0.9
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.data.dataset import P53Data, dataset_3d
from dis_project_tpu.models import simm
from dis_project_tpu.ops import mll as mll_ops


def _random_spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


def _logpdf_direct(y, mean, sigma):
    n = y.shape[0]
    yc = np.asarray(y - mean)
    s = np.asarray(sigma)
    sign, logdet = np.linalg.slogdet(s)
    assert sign > 0
    return float(
        -0.5 * yc @ np.linalg.solve(s, yc) - 0.5 * logdet - 0.5 * n * np.log(2 * np.pi)
    )


def test_mvn_logpdf_value():
    n = 17
    rng = np.random.default_rng(3)
    sigma = _random_spd(n, 3)
    y = jnp.asarray(rng.normal(size=n))
    mean = jnp.asarray(rng.normal(size=n))
    got = float(mll_ops.mvn_logpdf(y, mean, sigma))
    want = _logpdf_direct(y, mean, sigma)
    assert got == pytest.approx(want, rel=1e-10)


def test_mvn_logpdf_grads_match_pure_ad():
    """The custom VJP must agree with differentiating through the Cholesky."""
    n = 11
    rng = np.random.default_rng(4)
    sigma = _random_spd(n, 4)
    y = jnp.asarray(rng.normal(size=n))

    def with_custom(s_flat):
        return mll_ops.mvn_logpdf(y, jnp.zeros(n), s_flat.reshape(n, n))

    def pure_ad(s_flat):
        s = s_flat.reshape(n, n)
        L = jnp.linalg.cholesky(s)
        a = jax.scipy.linalg.cho_solve((L, True), y)
        return (
            -0.5 * y @ a
            - jnp.sum(jnp.log(jnp.diagonal(L)))
            - 0.5 * n * jnp.log(2 * jnp.pi)
        )

    g1 = jax.grad(with_custom)(sigma.reshape(-1))
    g2 = jax.grad(pure_ad)(sigma.reshape(-1))
    # Pure-AD cholesky gradients are lower-triangular-biased; symmetrise both
    # before comparing (both are valid cotangents of a symmetric input).
    g1m = np.asarray(g1.reshape(n, n))
    g2m = np.asarray(g2.reshape(n, n))
    sym1 = 0.5 * (g1m + g1m.T)
    sym2 = 0.5 * (g2m + g2m.T)
    np.testing.assert_allclose(sym1, sym2, rtol=1e-8, atol=1e-10)


def test_blocked_impl_value_and_grad_match_xla():
    """impl='blocked' (blocked factoriser + diag-inverse-reuse backward,
    the TPU f32 hot path's structure run here on CPU f64) must agree with
    impl='xla' in value and in the symmetrised Sigma cotangent."""
    n = 300  # non-multiple of the 512 default block via explicit block=128
    rng = np.random.default_rng(7)
    sigma = _random_spd(n, 7)
    y = jnp.asarray(rng.normal(size=n))

    def f(s_flat, impl):
        return mll_ops.mvn_logpdf(y, jnp.zeros(n), s_flat.reshape(n, n), impl)

    v1, g1 = jax.value_and_grad(f)(sigma.reshape(-1), "blocked")
    v2, g2 = jax.value_and_grad(f)(sigma.reshape(-1), "xla")
    assert float(v1) == pytest.approx(float(v2), rel=1e-12)
    s1 = np.asarray(g1.reshape(n, n))
    s2 = np.asarray(g2.reshape(n, n))
    np.testing.assert_allclose(
        0.5 * (s1 + s1.T), 0.5 * (s2 + s2.T), rtol=1e-8, atol=1e-10
    )


def test_hyperparameter_grads_match_finite_differences():
    """End-to-end: d(-MLL)/d(raw params) via the custom VJP vs central FD."""
    data = P53Data(replicate=0, source="synthetic")
    X, y, _ = dataset_3d(data)
    y = y.reshape(-1)
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    raw0 = simm.unconstrain(simm.init_params(5))

    flat0, unravel = jax.flatten_util.ravel_pytree(raw0)

    def loss(flat):
        return -model.mll(simm.constrain(unravel(flat)), X, y)

    g = np.asarray(jax.grad(loss)(flat0))
    eps = 1e-6
    fd = np.zeros_like(g)
    f0 = loss(flat0)
    for i in range(flat0.shape[0]):
        e = np.zeros_like(g)
        e[i] = eps
        fd[i] = (float(loss(flat0 + e)) - float(loss(flat0 - e))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=2e-5, atol=1e-7)
    assert np.isfinite(float(f0))


def test_grad_flows_to_all_leaves():
    data = P53Data(replicate=0, source="synthetic")
    X, y, _ = dataset_3d(data)
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    raw0 = simm.unconstrain(simm.init_params(5))
    g = jax.grad(lambda r: -model.mll(simm.constrain(r), X, y.reshape(-1)))(raw0)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
        assert np.any(np.asarray(leaf) != 0.0)
