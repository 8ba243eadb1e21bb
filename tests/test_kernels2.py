"""Second-order (spring-damper) kernel math tests.

The oracle is brute-force quadrature of the damped-oscillator Green's
function against the consistent RBF force prior — completely independent of
the complex-exponential closed forms under test. Plus complex special
functions vs scipy, PSD checks, and first-order reduction sanity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dis_project_tpu.ops import lfm_kernels2 as lfk2
from dis_project_tpu.ops import special


def simpson_w(n):
    w = np.ones(n)
    w[1:-1:2] = 4.0
    w[2:-1:2] = 2.0
    return w


def kff_consistent(u, v, l):
    return np.exp(-((u - v) ** 2) / l**2)


def green(tau, a, w):
    return np.exp(-a * tau) * np.sin(w * tau) / w


def quad_kxf2(t_x, t_f, a, w, s, l, n=4001):
    if t_x == 0:
        return 0.0
    u = np.linspace(0.0, t_x, n)
    vals = green(t_x - u, a, w) * kff_consistent(u, t_f, l)
    return s * float(simpson_w(n) @ vals) * (u[1] - u[0]) / 3.0


def quad_kxx2(t, t_p, aj, wj, ak, wk, sj, sk, l, n=801):
    if t == 0 or t_p == 0:
        return 0.0
    u = np.linspace(0.0, t, n)
    v = np.linspace(0.0, t_p, n)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    inner = (
        green(t - uu, aj, wj) * green(t_p - vv, ak, wk) * kff_consistent(uu, vv, l)
    )
    wgt = simpson_w(n)
    inner_int = (inner @ wgt) * (v[1] - v[0]) / 3.0
    return sj * sk * float(wgt @ inner_int) * (u[1] - u[0]) / 3.0


class TestComplexSpecial:
    def test_faddeeva_vs_scipy(self):
        from scipy.special import wofz

        rng = np.random.default_rng(0)
        z = rng.uniform(-8, 8, 300) + 1j * rng.uniform(-8, 8, 300)
        got = np.asarray(special.faddeeva(jnp.asarray(z)))
        ref = wofz(z)
        assert np.abs((got - ref) / (np.abs(ref) + 1e-300)).max() < 1e-12

    def test_erf_complex_vs_scipy(self):
        from scipy.special import erf as serf

        rng = np.random.default_rng(1)
        z = rng.uniform(-6, 6, 300) + 1j * rng.uniform(-6, 6, 300)
        got = np.asarray(special.erf_complex(jnp.asarray(z)))
        ref = serf(z)
        assert np.abs(got - ref).max() / (np.abs(ref).max()) < 1e-12

    def test_erf_complex_real_axis_and_grad(self):
        from scipy.special import erf as serf

        x = np.linspace(-5, 5, 41)
        got = np.asarray(special.erf_complex(jnp.asarray(x + 0j))).real
        np.testing.assert_allclose(got, serf(x), atol=1e-14)
        g = jax.grad(lambda t: jnp.real(special.erf_complex(t + 0.5j)))(0.3)
        num = (
            special.erf_complex(0.3 + 1e-6 + 0.5j)
            - special.erf_complex(0.3 - 1e-6 + 0.5j)
        ).real / 2e-6
        assert float(g) == pytest.approx(float(num), rel=1e-6)


@pytest.mark.parametrize(
    "t_x,t_f,a,w,s,l",
    [
        (4.0, 2.0, 0.4, 1.0, 1.0, 2.5),
        (2.0, 6.0, 0.8, 0.5, 1.3, 1.0),
        (12.0, 0.0, 0.3, 1.5, 0.7, 2.0),
        (0.0, 5.0, 0.5, 1.0, 1.0, 0.6),
        (7.0, 7.0, 0.2, 2.0, 1.0, 1.2),
    ],
)
def test_kxf2_matches_quadrature(t_x, t_f, a, w, s, l):
    closed = float(lfk2.k_xf2(t_x, t_f, a, w, s, l))
    numeric = quad_kxf2(t_x, t_f, a, w, s, l)
    assert closed == pytest.approx(numeric, abs=1e-7)


@pytest.mark.parametrize(
    "t,t_p,aj,wj,ak,wk,sj,sk,l",
    [
        (4.0, 2.0, 0.4, 1.0, 0.4, 1.0, 1.0, 1.0, 2.5),
        (6.0, 6.0, 0.8, 0.5, 0.3, 1.2, 1.2, 0.9, 1.5),
        (12.0, 2.0, 0.3, 1.4, 0.8, 0.7, 0.9, 1.0, 2.0),
        (1.0, 9.0, 0.36, 0.9, 0.37, 1.1, 0.97, 0.98, 0.7),
    ],
)
def test_kxx2_matches_quadrature(t, t_p, aj, wj, ak, wk, sj, sk, l):
    closed = float(lfk2.k_xx2(t, t_p, aj, wj, ak, wk, sj, sk, l))
    numeric = quad_kxx2(t, t_p, aj, wj, ak, wk, sj, sk, l)
    assert closed == pytest.approx(numeric, abs=5e-6)


def test_kxx2_symmetry():
    t = jnp.linspace(0.0, 12.0, 8)
    alpha = jnp.asarray([0.3, 0.5, 0.8])
    omega = jnp.asarray([1.0, 0.7, 1.4])
    sens = jnp.asarray([1.0, 1.2, 0.9])
    K = lfk2.k_xx2_block(t, t, alpha, omega, sens, 2.0)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K.T), atol=1e-10)


def test_joint_covariance_psd():
    """The full (outputs + force) joint covariance must be PSD — checks the
    cross/auto terms are mutually consistent."""
    t = jnp.linspace(0.0, 12.0, 7)
    G = 3
    alpha = jnp.asarray([0.3, 0.5, 0.8])
    omega = jnp.asarray([1.0, 0.7, 1.4])
    sens = jnp.asarray([1.0, 1.2, 0.9])
    rows_x = jnp.stack(
        [
            jnp.tile(t, G),
            jnp.repeat(jnp.arange(G, dtype=t.dtype), t.shape[0]),
            jnp.ones(G * t.shape[0]),
        ],
        axis=-1,
    )
    rows_f = jnp.stack(
        [t, -jnp.ones_like(t), jnp.zeros_like(t)], axis=-1
    )
    rows = jnp.concatenate([rows_x, rows_f])
    K = lfk2.cross_covariance2(rows, rows, alpha, omega, sens, 2.0)
    evals = np.linalg.eigvalsh(np.asarray(K))
    assert evals.min() > -1e-9


def test_second_order_ode_statistics():
    """Simulated second-order ODE trajectories (independent integrator) must
    reproduce the closed-form k_xx2 covariance."""
    rng = np.random.default_rng(3)
    a, w, s, l = 0.5, 1.0, 1.0, 2.0
    T_out = np.linspace(0.0, 8.0, 5)
    n_fine = 801
    t_fine = np.linspace(0.0, 8.0, n_fine)
    dt = t_fine[1] - t_fine[0]
    Kff = kff_consistent(t_fine[:, None], t_fine[None, :], l)
    Lf = np.linalg.cholesky(Kff + 1e-10 * np.eye(n_fine))
    draws = []
    for _ in range(300):
        f = Lf @ rng.standard_normal(n_fine)
        # x(t) = int_0^t g(t-u) f(u) du by direct convolution quadrature
        x = np.array(
            [
                np.trapezoid(green(tt - t_fine[t_fine <= tt], a, w)[::-1] * 0
                             + green(tt - t_fine[t_fine <= tt], a, w)
                             * f[t_fine <= tt], dx=dt)
                for tt in T_out
            ]
        )
        draws.append(s * x)
    emp = np.cov(np.stack(draws).T, bias=True)
    K = np.asarray(
        lfk2.k_xx2_block(
            jnp.asarray(T_out),
            jnp.asarray(T_out),
            jnp.asarray([a]),
            jnp.asarray([w]),
            jnp.asarray([s]),
            l,
        )
    )
    scale = np.abs(K).max()
    assert np.abs(emp - K).max() < 0.35 * scale


class TestChunkedCrossCovariance:
    """cross_covariance2_chunked == cross_covariance2 in values AND grads
    (r2: the unchunked VJP's ~20 (N, N) complex-erf intermediates OOM a
    16 GB chip at N=1e4; the chunked form rematerialises per row chunk)."""

    def test_fwd_and_grad_parity(self):
        rng = np.random.default_rng(0)
        n = 300
        x = jnp.asarray(
            np.stack([rng.uniform(0, 12, n), rng.integers(0, 5, n),
                      rng.integers(0, 2, n)], 1)
        )
        a = jnp.asarray(rng.uniform(0.3, 1.0, 5))
        w = jnp.asarray(rng.uniform(0.5, 2.0, 5))
        s = jnp.asarray(rng.uniform(0.5, 1.5, 5))
        l = jnp.asarray(1.5)
        Kd = lfk2.cross_covariance2(x, x, a, w, s, l)
        # chunk=128 does not divide 300: exercises the benign-row padding
        Kc = lfk2.cross_covariance2_chunked(x, x, a, w, s, l, chunk=128)
        np.testing.assert_allclose(np.asarray(Kc), np.asarray(Kd), atol=1e-12)

        def loss(fn):
            return lambda a, w, s, l: jnp.sum(jnp.sin(fn(x, x, a, w, s, l)))

        ga = jax.grad(loss(lfk2.cross_covariance2), (0, 1, 2, 3))(a, w, s, l)
        gb = jax.grad(
            loss(lambda *args: lfk2.cross_covariance2_chunked(*args, chunk=128)),
            (0, 1, 2, 3),
        )(a, w, s, l)
        for u, v in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(v), np.asarray(u), atol=1e-9)
