r"""Multivariate-normal log-density with a factorisation-reusing custom VJP.

The reference's exact conjugate MLL (``src/objectives.py:20-78``) builds
``Sigma = Kxx + jitter*I + obs_noise*I`` and evaluates a GPJax/cola MVN
``log_prob``, letting JAX differentiate *through* the Cholesky factorisation.
Here the O(N^3) core is a ``jax.custom_vjp``: the forward pass computes one
Cholesky and one triangular solve, and the backward pass reuses that factor
via the closed form

.. math::
    \partial \log p / \partial \mu   &= \alpha \\
    \partial \log p / \partial \Sigma &= \tfrac12(\alpha\alpha^\top - \Sigma^{-1}),
    \qquad \alpha = \Sigma^{-1}(y - \mu)

so no AD rules for ``cholesky``/``triangular_solve`` ever run, and the
gradient w.r.t. kernel hyperparameters flows through the (cheap, elementwise)
Gram construction only. On TPU the backward pass is two TRSMs (for
:math:`\Sigma^{-1}`) plus a rank-1 update — all MXU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_2PI = 1.8378770664093453  # log(2*pi)


def cholesky(sigma):
    """Lower Cholesky factor. Thin wrapper so the Pallas blocked factoriser
    can be swapped in behind one name (see ``ops.pallas_cholesky``)."""
    return jnp.linalg.cholesky(sigma)


def chol_solve(L, b):
    """Solve Sigma x = b given lower Cholesky factor L."""
    z = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)


@jax.custom_vjp
def mvn_logpdf_centered(y_centered, sigma):
    """log N(y_centered | 0, sigma) for a 1-D centered observation vector."""
    L = cholesky(sigma)
    alpha = chol_solve(L, y_centered)
    n = y_centered.shape[0]
    return (
        -0.5 * jnp.dot(y_centered, alpha)
        - jnp.sum(jnp.log(jnp.diagonal(L)))
        - 0.5 * n * LOG_2PI
    )


def _mvn_fwd(y_centered, sigma):
    L = cholesky(sigma)
    alpha = chol_solve(L, y_centered)
    n = y_centered.shape[0]
    logp = (
        -0.5 * jnp.dot(y_centered, alpha)
        - jnp.sum(jnp.log(jnp.diagonal(L)))
        - 0.5 * n * LOG_2PI
    )
    return logp, (L, alpha)


def _mvn_bwd(res, g):
    L, alpha = res
    n = alpha.shape[0]
    d_y = -g * alpha
    # Sigma^{-1} via two triangular solves against I — reuses the factor.
    eye = jnp.eye(n, dtype=L.dtype)
    sigma_inv = chol_solve(L, eye)
    d_sigma = (0.5 * g) * (jnp.outer(alpha, alpha) - sigma_inv)
    return d_y, d_sigma


mvn_logpdf_centered.defvjp(_mvn_fwd, _mvn_bwd)


def mvn_logpdf(y, mean, sigma):
    """log N(y | mean, sigma); gradients flow to all three arguments."""
    return mvn_logpdf_centered(y - mean, sigma)


def add_diagonal(mat, diag):
    """mat + diag(diag) — diag may be scalar or (N,)."""
    n = mat.shape[0]
    idx = jnp.arange(n)
    return mat.at[idx, idx].add(diag)
