r"""Second-order (spring-damper) LFM kernel family — new math beyond the
reference (SURVEY.md §2d: the reference implements first-order only).

Model: each output obeys a damped driven oscillator (mass normalised to 1)

.. math:: \ddot x_j + 2\alpha_j \dot x_j + (\alpha_j^2 + \omega_j^2) x_j
          = B_j + S_j f(t)

with an RBF GP prior on f (Lawrence-consistent convention
``k_ff* = exp(-r^2/l^2)``, see ``lfm_kernels.k_ff_consistent``). The system
is parameterised directly by the decay rate :math:`\alpha_j > 0` and the
damped frequency :math:`\omega_j > 0` (damping :math:`c = 2\alpha`, spring
:math:`k = \alpha^2 + \omega^2`) so it is always underdamped and the
Green's function is

.. math:: g_j(\tau) = e^{-\alpha_j \tau} \sin(\omega_j \tau)/\omega_j
        = \frac{e^{-p_j\tau} - e^{-q_j\tau}}{2i\,\omega_j},
        \qquad p_j = \alpha_j - i\omega_j,\; q_j = \alpha_j + i\omega_j.

Because the Green's function is a signed pair of **complex exponentials**,
every covariance integral reduces to the *first-order* closed forms of
``ops.lfm_kernels`` evaluated at complex decay rates, with
``ops.special.erf_complex`` supplying the complex-argument erf:

.. math::
    k^{(2)}_{x_j x_k}(t,t') = \frac{S_j S_k}{(2i\omega_j)(2i\omega_k)}
        \sum_{a \in \{p_j, -q_j\}} \sum_{b \in \{p_k, -q_k\}}
        \pm\, \mathrm{kxx}_1(t, t'; a, b)

(each ``-q`` term enters with a minus sign). The imaginary parts cancel
analytically; the implementation takes the real part.

Steady state (f = 0): ``x_j -> B_j / (alpha_j^2 + omega_j^2)`` — the mean
function of the second-order model.

Safe parameter region: the h-term combines ``exp(gamma^2)`` prefactors with
erf differences, and for complex ``gamma = d l / 2`` intermediate magnitudes
scale like ``exp((Im gamma)^2) = exp((omega l / 2)^2)``; keep
``omega * l < ~12`` in f64 (``< ~5`` in f32) to stay clear of overflow.
Validated against brute-force double quadrature of the Green's-function
integrals in ``tests/test_kernels2.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dis_project_tpu.ops import lfm_kernels as lfk
from dis_project_tpu.ops.special import erf_complex


def _complex_rates(alpha, omega):
    p = alpha - 1j * omega
    q = alpha + 1j * omega
    return p, q


def k_xx2(t, t_prime, a_j, w_j, a_k, w_k, s_j, s_k, lengthscale):
    """Output-output covariance of the second-order LFM (broadcasts)."""
    p_j, q_j = _complex_rates(a_j, w_j)
    p_k, q_k = _complex_rates(a_k, w_k)
    acc = 0.0
    for d_a, sign_a in ((p_j, 1.0), (q_j, -1.0)):
        for d_b, sign_b in ((p_k, 1.0), (q_k, -1.0)):
            acc = acc + sign_a * sign_b * lfk.k_xx(
                t, t_prime, d_a, d_b, 1.0, 1.0, lengthscale, erf_fn=erf_complex
            )
    # (2i w_j)(2i w_k) = -4 w_j w_k
    return jnp.real(acc) * s_j * s_k / (-4.0 * w_j * w_k)


def k_xf2(t_x, t_f, a_j, w_j, s_j, lengthscale):
    """Output-force cross-covariance of the second-order LFM (broadcasts)."""
    p_j, q_j = _complex_rates(a_j, w_j)
    ep = lfk.k_xf(t_x, t_f, p_j, 1.0, lengthscale, erf_fn=erf_complex)
    eq = lfk.k_xf(t_x, t_f, q_j, 1.0, lengthscale, erf_fn=erf_complex)
    # z / (2i) = Im(z) / 2 for the purely imaginary difference ep - eq
    return s_j * jnp.imag(ep - eq) / (2.0 * w_j)


def k_ff2(t, t_prime, lengthscale):
    """Force prior — the Lawrence-consistent RBF (the convention every
    closed form in this module integrates)."""
    return lfk.k_ff_consistent(t, t_prime, lengthscale)


# ---------------------------------------------------------------------------
# Block builders (gene-major layout, mirroring lfm_kernels block builders).
# ---------------------------------------------------------------------------


def k_xx2_block(t1, t2, alpha, omega, sens, lengthscale):
    """(G*T1, G*T2) dense output-output covariance for all gene pairs."""
    G = alpha.shape[0]
    T1, T2 = t1.shape[0], t2.shape[0]
    tt1 = t1[None, :, None, None]
    tt2 = t2[None, None, None, :]
    a_j = alpha[:, None, None, None]
    a_k = alpha[None, None, :, None]
    w_j = omega[:, None, None, None]
    w_k = omega[None, None, :, None]
    s_j = sens[:, None, None, None]
    s_k = sens[None, None, :, None]
    K = k_xx2(tt1, tt2, a_j, w_j, a_k, w_k, s_j, s_k, lengthscale)
    return K.reshape(G * T1, G * T2)


def k_xf2_block(t_x, t_f, alpha, omega, sens, lengthscale):
    """(G*T1, T2) dense output-force cross-covariance."""
    G = alpha.shape[0]
    T1, T2 = t_x.shape[0], t_f.shape[0]
    K = k_xf2(
        t_x[None, :, None],
        t_f[None, None, :],
        alpha[:, None, None],
        omega[:, None, None],
        sens[:, None, None],
        lengthscale,
    )
    return K.reshape(G * T1, T2)


def cross_covariance2(x1, x2, alpha, omega, sens, lengthscale):
    """Dense (N, M) covariance between (t, gene, flag) row sets — the
    second-order analogue of ``ops.gram.cross_covariance`` (flag 1 =
    output, flag 0 = latent force)."""
    G = alpha.shape[0]
    t1, g1, f1 = x1[:, 0], jnp.clip(x1[:, 1].astype(jnp.int32), 0, G - 1), x1[:, 2]
    t2, g2, f2 = x2[:, 0], jnp.clip(x2[:, 1].astype(jnp.int32), 0, G - 1), x2[:, 2]

    T1, T2 = t1[:, None], t2[None, :]
    A1, A2 = alpha[g1][:, None], alpha[g2][None, :]
    W1, W2 = omega[g1][:, None], omega[g2][None, :]
    S1, S2 = sens[g1][:, None], sens[g2][None, :]
    F1, F2 = f1[:, None], f2[None, :]

    kxx = k_xx2(T1, T2, A1, W1, A2, W2, S1, S2, lengthscale)
    kff = k_ff2(T1, T2, lengthscale)
    kxf = k_xf2(T1, T2, A1, W1, S1, lengthscale)
    kfx = k_xf2(T2, T1, A2, W2, S2, lengthscale)

    return (
        F1 * F2 * kxx
        + (1.0 - F1) * (1.0 - F2) * kff
        + F1 * (1.0 - F2) * kxf
        + (1.0 - F1) * F2 * kfx
    )


def gram_xx2_blocked_fast(timepoints, alpha, omega, sens, lengthscale):
    r"""Table-based (G*T, G*T) second-order output Gram on a UNIFORM grid.

    The order-2 closed form is the order-1 ``h``-term algebra over the
    *complex* rate pair :math:`p_g = a_g - i w_g,\ q_g = a_g + i w_g`
    (:func:`k_xx2` sums four sign-weighted :func:`lfm_kernels.k_xx` calls).
    On a shared time grid every transcendental argument lives on a small
    index set — exactly the factorisation of
    :func:`dis_project_tpu.ops.gram.gram_xx_blocked_fast`, with 2G complex
    rates instead of G real decays: O(T*G) erf_complex evaluations total
    instead of ~24 per output entry.  The remaining N^2 work is gathers and
    complex multiply-adds (bandwidth-bound).  This is what makes the
    ``dense10k --model simm2`` config tractable: the direct build costs
    ~2.4 s per training step at N=1e4 on a v5e (and its long device times
    crash the remote worker); the table build is milliseconds.

    Matches :func:`k_xx2_block` to float tolerance (tested); gene-major
    row layout ``(g, t)``.
    """
    t = timepoints
    # Reuse the order-1 host-side uniformity guard (dtype-aware).
    from dis_project_tpu.ops import gram as gram_ops

    gram_ops._check_uniform_grid(t)
    T = t.shape[0]
    G = alpha.shape[0]
    l = lengthscale
    cdtype = jnp.complex128 if t.dtype == jnp.float64 else jnp.complex64

    p, q = _complex_rates(alpha, omega)
    rates = jnp.concatenate([p, q]).astype(cdtype)  # (2G,): [p_1..p_G, q_1..q_G]
    g_c = (rates * l * 0.5).astype(cdtype)  # complex gamma per rate

    dt = t[1] - t[0]
    deltas = ((jnp.arange(2 * T - 1) - (T - 1)) * dt).astype(t.dtype)

    # Tables over the 2G complex rates (complex exp / erf):
    E1 = jnp.exp(-deltas[:, None].astype(cdtype) * rates[None, :])
    F1 = erf_complex(deltas[:, None] / l - g_c[None, :])
    F2 = erf_complex(t[:, None] / l + g_c[None, :])
    F3 = erf_complex(t[:, None] / l - g_c[None, :])
    F4 = erf_complex(g_c)
    e_row = jnp.exp(-t[:, None].astype(cdtype) * rates[None, :])  # (T, 2G)
    expg2 = jnp.exp(g_c * g_c)  # (2G,)

    didx = jnp.arange(T)[:, None] - jnp.arange(T)[None, :] + (T - 1)
    E1g = E1[didx]  # (T, T, 2G): exp(-c_g (t_a - t_b))
    F1g = F1[didx]  # (T, T, 2G): erf((t_a - t_b)/l - gamma_g)

    # h1[a, b, r] = E1g * (F1g + F2[b, r]); r_row[a, r] = e_row*(F3+F4)
    h1 = E1g * (F1g + F2[None, :, :])
    h2 = jnp.transpose(E1g, (1, 0, 2)) * (
        jnp.transpose(F1g, (1, 0, 2)) + F2[:, None, :]
    )
    r_row = e_row * (F3 + F4[None, :])  # (T, 2G)

    c = 0.5 * lfk.SQRT_PI * l
    signs = (1.0, -1.0)  # p -> +, q -> -

    K4 = jnp.zeros((G, T, G, T), t.dtype)
    for ia, sa in enumerate(signs):  # row-gene rate choice (j index)
        for ib, sb in enumerate(signs):  # col-gene rate choice (k index)
            rj = slice(ia * G, (ia + 1) * G)
            rk = slice(ib * G, (ib + 1) * G)
            inv_sum = 1.0 / (rates[rj][:, None] + rates[rk][None, :])
            w1 = c * inv_sum * expg2[rj][:, None]  # gamma_j-pair weight
            w2 = c * inv_sum * expg2[rk][None, :]  # gamma_k-pair weight
            contrib = w1[:, None, :, None] * (
                jnp.transpose(h1[:, :, rj], (2, 0, 1))[:, :, None, :]
                - r_row[:, rj].T[:, :, None, None]
                * e_row[:, rk].T[None, None, :, :]
            ) + w2[:, None, :, None] * (
                jnp.transpose(h2[:, :, rk], (0, 2, 1))[None, :, :, :]
                - e_row[:, rj].T[:, :, None, None]
                * r_row[:, rk].T[None, None, :, :]
            )
            K4 = K4 + (sa * sb) * jnp.real(contrib)

    # (2i w_j)(2i w_k) = -4 w_j w_k  (k_xx2's overall normalisation)
    norm = (sens[:, None] * sens[None, :]) / (
        -4.0 * omega[:, None] * omega[None, :]
    )
    K4 = K4 * norm[:, None, :, None]
    return K4.reshape(G * T, G * T)


def cross_covariance2_chunked(
    x1, x2, alpha, omega, sens, lengthscale, *, chunk: int = 1024
):
    """Row-chunked, rematerialised :func:`cross_covariance2`.

    The second-order closed forms hold ~20 (N, M) complex-erf
    intermediates through the VJP — at N=M=1e4 that is ~8 GB of live f32
    temps and the backward pass OOMs a 16 GB v5e (r2 finding on the
    ``dense10k --model simm2`` route).  This form maps a
    ``jax.checkpoint``-ed row-chunk build under ``lax.map``: the forward
    stores only the (N, M) output, and the backward recomputes each
    chunk's intermediates (elementwise work, ~2x the forward build —
    noise next to the O(N^3) factorisation).
    """
    n, m = x1.shape[0], x2.shape[0]
    nc = -(-n // chunk)
    npad = nc * chunk
    if npad != n:
        # Benign padding rows: t=0, gene 0, output flag — finite entries,
        # sliced off below.
        pad = jnp.zeros((npad - n, 3), x1.dtype).at[:, 2].set(1.0)
        x1 = jnp.concatenate([x1, pad], axis=0)
    xc = x1.reshape(nc, chunk, 3)

    @jax.checkpoint
    def body(rows):
        return cross_covariance2(rows, x2, alpha, omega, sens, lengthscale)

    K = jax.lax.map(body, xc).reshape(npad, m)
    return K[:n]
