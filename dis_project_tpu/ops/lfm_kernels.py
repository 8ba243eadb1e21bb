r"""Closed-form SIMM latent-force-model kernel family, fully vectorised.

The model (Lawrence, Sanguinetti & Rattray 2006): target-gene mRNA x_j obeys
the first-order linear ODE

    dx_j/dt = B_j + S_j f(t) - D_j x_j(t),

with an RBF GP prior on the latent transcription-factor activity f(t). The
cross-covariances of the joint GP over (x_1..x_G, f) integrate out in closed
form as erf/exp expressions.

Behavioral contract (matched to the reference, see SURVEY.md §2 #8-#11):

- ``k_ff`` divides the squared distance by ``2*l`` — NOT ``2*l**2``
  (reference ``src/model.py:307-310`` and the GPyTorch mirror
  ``src/gpytorch_alfi/model_alfi.py:469-471`` both do this; it is reference
  behavior to match, not a typo to fix).
- ``k_xx`` is eq. 5: S_j S_k (sqrt(pi) l / 2) [h(k,j,t',t) + h(j,k,t,t')]
  with the analytic ``h`` term of reference ``src/model.py:315-365``.
- ``k_xf`` is eq. 6 (reference ``src/model.py:237-282``).

Design: unlike the reference — a *scalar* kernel on (t, gene, flag) 3-vectors
dispatched through flag-product switches and lifted with a double ``vmap``
(reference ``src/model.py:152-195,392``) — every function here is an
elementwise/block function over arrays, so XLA fuses the whole Gram build
into one vectorised loop and the Pallas path can evaluate the same algebra
tile-by-tile on the VPU. All functions broadcast.

Numerical hazard inherited from the math: the ``exp(gamma**2)`` factor with
``gamma = D*l/2`` overflows for large ``D*l``. At reference scales
(D ~ 0.4-1, l in [0.5, 3.5]) this is benign; :func:`h_term` is written so the
overflow-prone factor is combined with the compensating erf difference in one
expression, and the trainer's bounded lengthscale bijector keeps l small.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SQRT_PI = 1.7724538509055159  # sqrt(pi), f64-exact to the ulp


def gamma(decay, lengthscale):
    """gamma_k = D_k * l / 2 (reference ``src/model.py:367-369``)."""
    return decay * lengthscale * 0.5


def erf(x):
    return jax.scipy.special.erf(x)


def h_term(d_a, d_b, t1, t2, lengthscale, erf_fn=erf):
    r"""The analytic double-integral term h(a, b, t1, t2).

    With :math:`\gamma_b = D_b l / 2`:

    .. math::
        h = \frac{e^{\gamma_b^2}}{D_a + D_b}\Big[
            e^{-D_b (t_2 - t_1)}\big(\mathrm{erf}(\tfrac{t_2-t_1}{l}-\gamma_b)
                + \mathrm{erf}(\tfrac{t_1}{l}+\gamma_b)\big)
          - e^{-(D_b t_2 + D_a t_1)}\big(\mathrm{erf}(\tfrac{t_2}{l}-\gamma_b)
                + \mathrm{erf}(\gamma_b)\big)\Big]

    Matches reference ``src/model.py:315-365`` where the reference's
    ``h(j, k, t1, t2)`` is ``h_term(d_a=D[j], d_b=D[k], t1, t2)``.
    All arguments broadcast elementwise.
    """
    g_b = gamma(d_b, lengthscale)
    t_dist = t2 - t1
    mult = jnp.exp(g_b * g_b) / (d_a + d_b)
    first = jnp.exp(-d_b * t_dist) * (
        erf_fn(t_dist / lengthscale - g_b) + erf_fn(t1 / lengthscale + g_b)
    )
    second = jnp.exp(-(d_b * t2 + d_a * t1)) * (
        erf_fn(t2 / lengthscale - g_b) + erf_fn(g_b)
    )
    return mult * (first - second)


def k_xx(t, t_prime, d_j, d_k, s_j, s_k, lengthscale, erf_fn=erf):
    """Gene-gene covariance k_{x_j x_k}(t, t') — eq. 5.

    Matches reference ``src/model.py:197-235``:
    ``S_j S_k (sqrt(pi) l / 2) * [h(k, j, t', t) + h(j, k, t, t')]``.
    All arguments broadcast elementwise.
    """
    mult = s_j * s_k * lengthscale * (0.5 * SQRT_PI)
    return mult * (
        h_term(d_k, d_j, t_prime, t, lengthscale, erf_fn)
        + h_term(d_j, d_k, t, t_prime, lengthscale, erf_fn)
    )


def k_xf(t_x, t_f, d_j, s_j, lengthscale, erf_fn=erf):
    """Gene-force cross-covariance k_{x_j f}(t_x, t_f) — eq. 6.

    Matches reference ``src/model.py:237-282`` (their ``gene_xpr``/
    ``latent_force`` are ``t_x``/``t_f`` here). Broadcasts elementwise.
    """
    g_j = gamma(d_j, lengthscale)
    t_dist = t_x - t_f
    first = (0.5 * SQRT_PI) * lengthscale * s_j
    return (
        first
        * jnp.exp(g_j * g_j)
        * jnp.exp(-d_j * t_dist)
        * (erf_fn(t_dist / lengthscale - g_j) + erf_fn(t_f / lengthscale + g_j))
    )


def k_ff(t, t_prime, lengthscale):
    """RBF prior over f(t) with the reference's ``2*l`` denominator
    (reference ``src/model.py:284-312``). Broadcasts elementwise."""
    sq = jnp.square(t - t_prime)
    return jnp.exp(-sq / (2.0 * lengthscale))


def k_ff_consistent(t, t_prime, lengthscale):
    """RBF force prior in the Lawrence convention: exp(-(t-t')^2 / l^2).

    This is the prior the closed-form ``k_xx``/``k_xf`` analytically
    integrate (their erf arguments are t/l, see :func:`h_term`); the
    reference's *implemented* ``k_ff`` above uses ``2*l`` instead — an
    internal inconsistency kept for parity on the exact path. New model
    families that require a jointly-PSD (f, x) covariance — the sparse
    inter-domain inducing path in particular — must use this one.
    """
    sq = jnp.square(t - t_prime)
    return jnp.exp(-sq / jnp.square(lengthscale))


# ---------------------------------------------------------------------------
# Block builders — the vectorised building blocks for Gram assembly.
# ---------------------------------------------------------------------------


def k_xx_block(t1, t2, decay, sens, lengthscale):
    """Dense (G*T1, G*T2) gene-gene covariance for all gene pairs at once.

    ``t1``: (T1,) times, ``t2``: (T2,) times, ``decay``/``sens``: (G,).
    Output is ordered gene-major: row block j covers gene j at times ``t1``
    — the layout of the reference's blocked torch assembly
    (``src/gpytorch_alfi/model_alfi.py:266-300``) and of ``dataset_3d`` rows
    for a single replicate.
    """
    G = decay.shape[0]
    T1, T2 = t1.shape[0], t2.shape[0]
    # Broadcast to (G, T1, G, T2) and collapse.
    tt1 = t1[None, :, None, None]
    tt2 = t2[None, None, None, :]
    d_j = decay[:, None, None, None]
    d_k = decay[None, None, :, None]
    s_j = sens[:, None, None, None]
    s_k = sens[None, None, :, None]
    K = k_xx(tt1, tt2, d_j, d_k, s_j, s_k, lengthscale)
    return K.reshape(G * T1, G * T2)


def k_xf_block(t_x, t_f, decay, sens, lengthscale):
    """Dense (G*T1, T2) gene-force cross-covariance, gene-major rows."""
    G = decay.shape[0]
    T1, T2 = t_x.shape[0], t_f.shape[0]
    K = k_xf(
        t_x[None, :, None],
        t_f[None, None, :],
        decay[:, None, None],
        sens[:, None, None],
        lengthscale,
    )
    return K.reshape(G * T1, T2)


def k_ff_block(t1, t2, lengthscale):
    """Dense (T1, T2) latent-force prior covariance (reference convention)."""
    return k_ff(t1[:, None], t2[None, :], lengthscale)


def k_ff_consistent_block(t1, t2, lengthscale):
    """Dense (T1, T2) latent-force prior covariance (Lawrence convention)."""
    return k_ff_consistent(t1[:, None], t2[None, :], lengthscale)
