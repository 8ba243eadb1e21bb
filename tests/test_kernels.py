"""Kernel math tests.

The deepest check here is the quadrature oracle: the SIMM closed forms are
the analytic solution of

    k_xf(t_x, t_f) = S_j int_0^{t_x} e^{-D_j (t_x - u)} k_ff*(u, t_f) du
    k_xx(t, t')    = S_j S_k int_0^{t} int_0^{t'}
                       e^{-D_j (t-u)} e^{-D_k (t'-v)} k_ff*(u, v) du dv

with the Lawrence-convention RBF prior k_ff*(u, v) = exp(-(u-v)^2 / l^2).
Note the reference's *implemented* k_ff divides by ``2*l`` instead
(``src/model.py:307-310``) — internally inconsistent with its own closed
forms, and reproduced here verbatim as the k_ff code path; the closed-form
k_xx/k_xf are validated against the consistent prior.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dis_project_tpu.ops import lfm_kernels as lfk
from dis_project_tpu.ops import gram as gram_ops


def simpson(vals, dx):
    """Composite Simpson weights for an odd-length grid."""
    n = len(vals)
    assert n % 2 == 1
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    return float(np.dot(w, vals) * dx / 3.0)


def kff_consistent(u, v, lengthscale):
    return np.exp(-((u - v) ** 2) / lengthscale**2)


def quad_kxf(t_x, t_f, d_j, s_j, lengthscale, n=4001):
    u = np.linspace(0.0, t_x, n)
    integrand = np.exp(-d_j * (t_x - u)) * kff_consistent(u, t_f, lengthscale)
    return s_j * simpson(integrand, u[1] - u[0])


def quad_kxx(t, t_p, d_j, d_k, s_j, s_k, lengthscale, n=801):
    u = np.linspace(0.0, t, n)
    v = np.linspace(0.0, t_p, n)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    inner = np.exp(-d_j * (t - uu)) * np.exp(-d_k * (t_p - vv)) * kff_consistent(
        uu, vv, lengthscale
    )
    # Nested Simpson.
    du, dv = u[1] - u[0], v[1] - v[0]
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    inner_int = (inner @ w) * dv / 3.0
    return s_j * s_k * float(np.dot(w, inner_int) * du / 3.0)


@pytest.mark.parametrize(
    "t_x,t_f,d,s,l",
    [
        (4.0, 2.0, 0.4, 1.0, 2.5),
        (2.0, 6.0, 0.8, 1.3, 1.0),
        (12.0, 0.0, 0.3, 0.7, 3.4),
        (0.0, 5.0, 0.5, 1.0, 0.6),
    ],
)
def test_kxf_matches_quadrature(t_x, t_f, d, s, l):
    closed = float(lfk.k_xf(t_x, t_f, d, s, l))
    numeric = quad_kxf(t_x, t_f, d, s, l)
    assert closed == pytest.approx(numeric, abs=1e-7)


@pytest.mark.parametrize(
    "t,t_p,dj,dk,sj,sk,l",
    [
        (4.0, 2.0, 0.4, 0.4, 1.0, 1.0, 2.5),
        (6.0, 6.0, 0.8, 0.3, 1.2, 0.9, 1.5),
        (12.0, 2.0, 0.28, 0.8, 0.9, 1.0, 3.0),
        (1.0, 9.0, 0.36, 0.37, 0.97, 0.98, 0.7),
    ],
)
def test_kxx_matches_quadrature(t, t_p, dj, dk, sj, sk, l):
    closed = float(lfk.k_xx(t, t_p, dj, dk, sj, sk, l))
    numeric = quad_kxx(t, t_p, dj, dk, sj, sk, l)
    assert closed == pytest.approx(numeric, abs=5e-6)


def test_kff_reference_convention():
    # exp(-(t-t')^2 / (2*l)) — the 2*l (not 2*l^2) denominator is reference
    # behavior (src/model.py:307-310).
    assert float(lfk.k_ff(3.0, 1.0, 2.0)) == pytest.approx(np.exp(-4.0 / 4.0))
    assert float(lfk.k_ff(5.0, 5.0, 1.7)) == pytest.approx(1.0)


def test_kxx_symmetry():
    val1 = float(lfk.k_xx(3.0, 7.0, 0.4, 0.9, 1.1, 0.8, 2.0))
    val2 = float(lfk.k_xx(7.0, 3.0, 0.9, 0.4, 0.8, 1.1, 2.0))
    assert val1 == pytest.approx(val2, rel=1e-12)


def test_blocked_builders_match_elementwise():
    rng = np.random.default_rng(0)
    G, T1, T2 = 3, 5, 4
    t1 = jnp.asarray(np.sort(rng.uniform(0, 12, T1)))
    t2 = jnp.asarray(np.sort(rng.uniform(0, 12, T2)))
    decay = jnp.asarray(rng.uniform(0.2, 1.0, G))
    sens = jnp.asarray(rng.uniform(0.5, 1.5, G))
    l = 2.1

    K = lfk.k_xx_block(t1, t2, decay, sens, l)
    assert K.shape == (G * T1, G * T2)
    for j in range(G):
        for k in range(G):
            for a in range(T1):
                for b in range(T2):
                    want = float(
                        lfk.k_xx(t1[a], t2[b], decay[j], decay[k], sens[j], sens[k], l)
                    )
                    got = float(K[j * T1 + a, k * T2 + b])
                    assert got == pytest.approx(want, rel=1e-12)

    Kxf = lfk.k_xf_block(t1, t2, decay, sens, l)
    assert Kxf.shape == (G * T1, T2)
    want = float(lfk.k_xf(t1[2], t2[1], decay[1], sens[1], l))
    assert float(Kxf[T1 + 2, 1]) == pytest.approx(want, rel=1e-12)


def test_gram_flag_dispatch():
    """Mixed expression/force rows route to the right kernel branch."""
    decay = jnp.asarray([0.4, 0.7])
    sens = jnp.asarray([1.0, 1.2])
    l = 2.5
    # rows: gene0@t2 (expr), gene1@t5 (expr), force@t3, force@t8
    x = jnp.asarray(
        [
            [2.0, 0.0, 1.0],
            [5.0, 1.0, 1.0],
            [3.0, -1.0, 0.0],
            [8.0, -1.0, 0.0],
        ]
    )
    K = gram_ops.gram(x, decay, sens, l)
    assert float(K[0, 1]) == pytest.approx(
        float(lfk.k_xx(2.0, 5.0, 0.4, 0.7, 1.0, 1.2, l))
    )
    assert float(K[0, 2]) == pytest.approx(float(lfk.k_xf(2.0, 3.0, 0.4, 1.0, l)))
    assert float(K[2, 0]) == pytest.approx(float(lfk.k_xf(2.0, 3.0, 0.4, 1.0, l)))
    assert float(K[2, 3]) == pytest.approx(float(lfk.k_ff(3.0, 8.0, l)))
    np.testing.assert_allclose(np.asarray(K), np.asarray(K).T, rtol=1e-12)


def test_gram_clamped_gather_reproduces_one_based_quirk():
    """Reference one-based test grids rely on clamped out-of-bounds gathers
    (src/utils.py:92 + JAX clip semantics, SURVEY.md §2 #17)."""
    decay = jnp.asarray([0.4, 0.7, 0.9])
    sens = jnp.asarray([1.0, 1.2, 0.8])
    l = 2.0
    x_train = jnp.asarray([[2.0, 0.0, 1.0], [4.0, 1.0, 1.0], [6.0, 2.0, 1.0]])
    # One-based rows: gene indices 1..3; index 3 must clamp to gene 2.
    x_test = jnp.asarray([[3.0, 1.0, 1.0], [3.0, 2.0, 1.0], [3.0, 3.0, 1.0]])
    K = gram_ops.cross_covariance(x_train, x_test, decay, sens, l)
    k_clamped = float(lfk.k_xx(2.0, 3.0, 0.4, 0.9, 1.0, 0.8, l))
    assert float(K[0, 2]) == pytest.approx(k_clamped, rel=1e-12)


def test_gram_xx_blocked_matches_rows_and_tiles():
    rng = np.random.default_rng(1)
    G, T, R = 4, 6, 3
    t = jnp.asarray(np.linspace(0, 12, T))
    decay = jnp.asarray(rng.uniform(0.2, 1.0, G))
    sens = jnp.asarray(rng.uniform(0.5, 1.5, G))
    l = 1.8

    times = jnp.tile(t, G * R)
    genes = jnp.tile(jnp.repeat(jnp.arange(G), T), R).astype(jnp.float64)
    flags = jnp.ones(R * G * T)
    rows = jnp.stack([times, genes, flags], axis=-1)

    K_rows = gram_ops.gram(rows, decay, sens, l)
    K_blocked = gram_ops.gram_xx_blocked(t, decay, sens, l, replicates=R)
    np.testing.assert_allclose(np.asarray(K_rows), np.asarray(K_blocked), rtol=1e-12)


def test_kxx_family_indefinite_at_large_gamma():
    """The closed-form k_xx family is INDEFINITE at large D*l — a corollary
    of the reference's 2*l RBF convention (docs quirk catalogue): at the
    pinned D/l point the exact 35x35 p53 Gram has an eigenvalue near
    -9.0e-4. This is the formula, not roundoff (f64, and the independent
    torch stack reproduces the same spectrum), and it is why
    training.hmc.mixture_predict must drop non-finite predictive
    components for unclamped posterior draws."""
    G, T = 5, 7
    t = jnp.asarray(np.linspace(0, 12, T))
    decay = jnp.asarray([0.52, 0.71, 0.54, 2.61, 0.63])
    sens = jnp.ones(G)
    l = 3.15

    times = jnp.tile(t, G)
    genes = jnp.repeat(jnp.arange(G), T).astype(jnp.float64)
    rows = jnp.stack([times, genes, jnp.ones(G * T)], axis=-1)
    K = gram_ops.gram(rows, decay, sens, jnp.asarray(l))
    eigs = np.linalg.eigvalsh(np.asarray(K))
    assert eigs.min() == pytest.approx(-9.05e-4, rel=0.1), eigs.min()
    assert eigs.min() < -1e-4  # far below f64 roundoff: truly indefinite
    # Sanity: the trained region (gamma = D*l/2 < 1.5) stays PSD.
    K_ok = gram_ops.gram(rows, decay / 3, sens, jnp.asarray(l))
    assert np.linalg.eigvalsh(np.asarray(K_ok)).min() > -1e-12
