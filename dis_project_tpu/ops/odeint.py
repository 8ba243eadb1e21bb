r"""Parallel-prefix integration of the first-order LFM response ODE.

The linear-response families never integrate anything at run time — their
covariances integrate the ODE analytically (``ops.lfm_kernels``).  The
nonlinear-response family (``models.nlfm``) cannot: with a response
``g(f)`` inside the convolution there is no closed form, so the gene
curves must be produced by quadrature against the force values on a dense
grid (the computation the reference's lineage — Lawrence et al. 2006 §5,
the ALFI package the reference's torch stack refactors — performs with
host-side loops).

TPU-native design: the integrating-factor solution

.. math:: x_j(t) = \frac{B_j}{D_j} + S_j\, e^{-D_j t} \int_0^t e^{D_j u}
    g(f(u))\,du

is evaluated through the *decay-propagated* trapezoid recurrence over a
uniform grid (spacing ``dt``),

.. math:: J_0 = 0,\qquad J_{k+1} = e^{-D_j\,dt} J_k +
    \tfrac{dt}{2}\left(e^{-D_j\,dt} g_k + g_{k+1}\right),

so that ``x_j(t_k) = B_j/D_j + S_j J_k`` — every factor is
:math:`e^{-D\,dt} \le 1`, so no large intermediate exponentials exist at
any ``D t`` (the naive ``cumtrapz(e^{D u} g)`` form overflows f32 at
``D t \gtrsim 80``).  In exact arithmetic the recurrence reproduces the
naive form's trapezoid sums EXACTLY (same weights), which is what makes
the oracle tests against :func:`data.synthetic.generate_ode` bit-tight.

A first-order linear recurrence is associative, so the whole grid is ONE
:func:`jax.lax.associative_scan` — an :math:`O(\log Q)`-depth parallel
prefix instead of a length-``Q`` sequential ``lax.scan``: the XLA/TPU
execution model serialises a sequential scan's per-step work no matter how
trivial, while the prefix form exposes all ``Q`` steps to the vector units
at once and vmaps/shards over genes and Monte-Carlo samples for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Supported response nonlinearities g(f). ``exp`` is the
#: positivity-constrained response of Lawrence et al. (2006) §5 (their MAP
#: model); ``softplus`` and ``sigmoid`` are the ALFI-lineage alternatives
#: (saturating / switch-like activation); ``identity`` recovers the linear
#: SIMM and is the parity oracle against the exact-GP family.
RESPONSE_NAMES = ("identity", "exp", "softplus", "sigmoid")


def response_fn(name: str, xp=jnp):
    """Return g as a function of the force values; ``xp`` selects the array
    module (``jnp`` for traced model code, ``numpy`` for the host-f64
    synthetic oracle)."""
    if name == "identity":
        return lambda f: f
    if name == "exp":
        return xp.exp
    if name == "softplus":
        return lambda f: xp.logaddexp(0.0, f)
    if name == "sigmoid":
        return lambda f: 1.0 / (1.0 + xp.exp(-f))
    raise ValueError(
        f"unknown response {name!r}; expected one of {RESPONSE_NAMES}"
    )


def decay_propagated_trapezoid(g_vals, decay, dt):
    r"""``J[j, k]`` of the recurrence above for every gene j and grid step k.

    Parameters
    ----------
    g_vals : (..., Q) response values ``g(f(t_k))`` on the uniform grid
        (leading axes broadcast — e.g. Monte-Carlo samples).
    decay : (G,) per-gene decay rates ``D_j``.
    dt : scalar grid spacing (static or traced).

    Returns
    -------
    (..., G, Q) array ``J`` with ``J[..., j, 0] = 0`` and the trapezoid
    convolution values at the grid points; the gene curve is
    ``B/D + S * J``.
    """
    g_vals = jnp.asarray(g_vals)
    decay = jnp.asarray(decay, g_vals.dtype)
    a = jnp.exp(-decay * dt)  # (G,)
    # b[j, k] covers the step ENDING at grid point k+1.
    b = 0.5 * dt * (
        a[..., :, None] * g_vals[..., None, :-1] + g_vals[..., None, 1:]
    )  # (..., G, Q-1)
    af = jnp.broadcast_to(a[..., :, None], b.shape)

    def combine(lhs, rhs):
        a1, b1 = lhs
        a2, b2 = rhs
        return a1 * a2, a2 * b1 + b2

    _, J = jax.lax.associative_scan(combine, (af, b), axis=-1)
    zero = jnp.zeros(J.shape[:-1] + (1,), J.dtype)
    return jnp.concatenate([zero, J], axis=-1)


def gene_curves(g_vals, basal, sensitivity, decay, dt):
    """Gene expression curves ``x_j(t_k)`` from response values on the grid.

    ``x_j = B_j / D_j + S_j * J_j`` with initial condition
    ``x_j(0) = B_j / D_j`` (the convention of the synthetic oracle,
    ``data.synthetic.generate_ode``). Shapes: ``g_vals (..., Q)``,
    kinetics ``(G,)`` -> ``(..., G, Q)``.
    """
    J = decay_propagated_trapezoid(g_vals, decay, dt)
    return (basal / decay)[:, None] + sensitivity[:, None] * J
