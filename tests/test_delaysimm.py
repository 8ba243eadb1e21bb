"""Delayed-response SIMM: time-warp reduction, quadrature oracles, recovery.

The family's entire claim is the exact reduction x_j(t) = x~_j(max(t-d,0))
(``models/delaysimm.py`` module notes), so the oracles integrate the
DELAYED convolution directly and compare against the closed forms at the
warped inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.models import delaysimm, simm
from dis_project_tpu.models.delaysimm import (
    DelaySIMMParams,
    ExactDelaySIMM,
    warp_rows,
)
from dis_project_tpu.ops import lfm_kernels as lfk


def simpson(vals, dx):
    n = len(vals)
    assert n % 2 == 1
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    return float(np.dot(w, vals) * dx / 3.0)


def kff_consistent(u, v, lengthscale):
    return np.exp(-((u - v) ** 2) / lengthscale**2)


def quad_kxf_delay(t_x, t_f, d, s, l, delta, n=4001):
    """S * int_0^{t_x} e^{-d (t_x-u)} cov(f(u - delta), f(t_f)) du with the
    switch-on convention f(w) = 0 for w < 0: the integrand vanishes below
    u = delta, so integrate the smooth region [delta, t_x] (Simpson across
    the kink would need the cut on a grid point)."""
    if t_x <= delta:
        return 0.0
    u = np.linspace(delta, t_x, n)
    cov = kff_consistent(u - delta, t_f, l)
    return s * simpson(np.exp(-d * (t_x - u)) * cov, u[1] - u[0])


def quad_kxx_delay(t, t_p, dj, dk, sj, sk, l, delj, delk, n=801):
    if t <= delj or t_p <= delk:
        return 0.0
    u = np.linspace(delj, t, n)
    v = np.linspace(delk, t_p, n)
    U, V = np.meshgrid(u, v, indexing="ij")
    cov = kff_consistent(U - delj, V - delk, l)
    inner = np.exp(-dj * (t - U)) * np.exp(-dk * (t_p - V)) * cov
    rows = np.array([simpson(inner[i], v[1] - v[0]) for i in range(n)])
    return sj * sk * simpson(rows, u[1] - u[0])


@pytest.mark.parametrize(
    "t_x,t_f,d,s,l,delta",
    [
        (5.0, 3.0, 0.4, 1.0, 2.5, 1.2),
        (8.0, 8.0, 0.8, 1.3, 1.5, 0.5),
        (2.0, 9.0, 0.3, 0.9, 2.0, 3.0),  # t_x > delta but barely on
        (1.0, 4.0, 0.5, 1.0, 2.0, 2.5),  # t_x < delta: pre-onset, zero
    ],
)
def test_kxf_delay_matches_quadrature(t_x, t_f, d, s, l, delta):
    closed = float(lfk.k_xf(max(t_x - delta, 0.0), t_f, d, s, l))
    numeric = quad_kxf_delay(t_x, t_f, d, s, l, delta)
    assert closed == pytest.approx(numeric, abs=1e-7)


@pytest.mark.parametrize(
    "t,t_p,dj,dk,sj,sk,l,delj,delk",
    [
        (6.0, 4.0, 0.4, 0.6, 1.0, 1.1, 2.5, 1.0, 0.3),
        (10.0, 10.0, 0.8, 0.3, 1.2, 0.9, 1.5, 2.0, 2.0),
        (3.0, 8.0, 0.3, 0.5, 0.9, 1.0, 2.0, 0.0, 1.5),
    ],
)
def test_kxx_delay_matches_quadrature(t, t_p, dj, dk, sj, sk, l, delj, delk):
    closed = float(
        lfk.k_xx(max(t - delj, 0.0), max(t_p - delk, 0.0), dj, dk, sj, sk, l)
    )
    numeric = quad_kxx_delay(t, t_p, dj, dk, sj, sk, l, delj, delk)
    assert closed == pytest.approx(numeric, abs=5e-5)


def _rows(G, T, t_max=12.0):
    t = jnp.linspace(0.0, t_max, T)
    times = jnp.tile(t, G)
    genes = jnp.repeat(jnp.arange(G, dtype=t.dtype), T)
    return jnp.stack([times, genes, jnp.ones_like(times)], -1)


def test_warp_rows_semantics():
    X = jnp.asarray(
        [[2.0, 0.0, 1.0], [2.0, 1.0, 1.0], [2.0, -1.0, 0.0], [0.5, 1.0, 1.0]]
    )
    delay = jnp.asarray([0.5, 1.0])
    W = warp_rows(X, delay, 2)
    np.testing.assert_allclose(np.asarray(W[:, 0]), [1.5, 1.0, 2.0, 0.0])
    # gene/flag columns untouched
    np.testing.assert_array_equal(np.asarray(W[:, 1:]), np.asarray(X[:, 1:]))


def test_zero_delay_reduces_to_exact_simm():
    G, T = 4, 9
    X = _rows(G, T)
    grid = jnp.linspace(0.0, 13.0, 30)
    frows = jnp.stack(
        [grid, -jnp.ones_like(grid), jnp.zeros_like(grid)], -1
    )
    dm = ExactDelaySIMM(num_genes=G, jitter=1e-6)
    em = simm.ExactSIMM(num_genes=G, jitter=1e-6)
    dp = delaysimm.init_params(G)._replace(delay=jnp.zeros(G))
    sp = simm.init_params(G)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=G * T))
    var = jnp.full((G * T,), 0.04)

    np.testing.assert_array_equal(
        np.asarray(dm.gram(dp, X)), np.asarray(em.gram(sp, X))
    )
    np.testing.assert_array_equal(
        float(dm.mll(dp, X, y)), float(em.mll(sp, X, y))
    )
    a = dm.latent_predict(dp, frows, X, y, var)
    b = em.latent_predict(sp, frows, X, y, var)
    np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean),
                               rtol=1e-12, atol=1e-14)
    a = dm.multi_gene_predict(dp, frows, X, y, var)
    b = em.multi_gene_predict(sp, frows, X, y, var)
    np.testing.assert_allclose(np.asarray(a.mean), np.asarray(b.mean),
                               rtol=1e-12, atol=1e-14)


def test_gram_psd_and_preonset_zero():
    G = 3
    X = _rows(G, 9)
    p = delaysimm.init_params(G)._replace(
        delay=jnp.asarray([0.0, 1.5, 3.0])
    )
    m = ExactDelaySIMM(num_genes=G)
    K = m.gram(p, X)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K.T), atol=1e-12)
    eig = np.linalg.eigvalsh(np.asarray(K))
    assert eig.min() > -1e-9
    # Pre-onset observations are deterministic at B/D: zero variance rows.
    tt = jnp.asarray([[1.0, 2.0, 1.0]])  # t=1.0 < delay=3.0 for gene 2
    assert float(m.cross_covariance(p, tt, tt)[0, 0]) == 0.0


def test_fit_smoke_and_clamp():
    G, T = 3, 9
    X = _rows(G, T)
    rng = np.random.default_rng(1)
    y = jnp.asarray(0.5 + 0.1 * rng.normal(size=G * T))
    m = ExactDelaySIMM(num_genes=G, jitter=1e-4)
    params, hist = delaysimm.fit(
        m, delaysimm.init_params(G), X, y, num_iters=40,
        fix_params=True, clamp_gene=1,
    )
    assert hist.shape == (40,)
    assert float(hist[-1]) < float(hist[0])
    np.testing.assert_allclose(float(params.sensitivity[1]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(params.decay[1]), 0.8, rtol=1e-6)
    assert float(params.delay[1]) < 1e-8  # anchor gene pinned to zero delay
    assert np.isfinite(np.asarray(params.delay)).all()


def test_delay_recovery():
    """Draw expression jointly from the delayed prior with known per-gene
    delays, fit, and recover the delays relative to the pinned anchor."""
    rng = np.random.default_rng(3)
    G, T = 3, 25
    X = _rows(G, T)
    true = DelaySIMMParams(
        basal=jnp.asarray([0.02, 0.05, 0.08]),
        # anchor gene 0 at the clamp values so the pin is consistent
        sensitivity=jnp.asarray([1.0, 1.2, 0.8]),
        decay=jnp.asarray([0.8, 0.5, 0.6]),
        lengthscale=jnp.asarray(1.5),
        obs_stddev=jnp.asarray(0.025),
        delay=jnp.asarray([0.0, 1.0, 2.0]),
    )
    m = ExactDelaySIMM(num_genes=G, jitter=1e-8)
    K = np.asarray(m.gram(true, X)) + 1e-8 * np.eye(G * T)
    mean = np.asarray(m.mean_function(true, X))
    y = mean + np.linalg.cholesky(K) @ rng.standard_normal(G * T)
    y = jnp.asarray(y + 0.025 * rng.standard_normal(G * T))

    fitted, hist = delaysimm.fit(
        ExactDelaySIMM(num_genes=G, jitter=1e-6),
        delaysimm.init_params(G, delay0=0.3),
        X, y, num_iters=800, learning_rate=0.02,
        fix_params=True, clamp_gene=0,
    )
    assert float(hist[-1]) < float(hist[0])
    learned = np.asarray(fitted.delay)
    # Gene 0 pinned to 0; genes 1/2 recovered within the sampling interval
    # (dt = 0.5 here).
    assert learned[0] < 1e-8
    np.testing.assert_allclose(learned[1], 1.0, atol=0.5)
    np.testing.assert_allclose(learned[2], 2.0, atol=0.5)
    # And the ordering is right with a real gap.
    assert learned[2] > learned[1] > 0.2
