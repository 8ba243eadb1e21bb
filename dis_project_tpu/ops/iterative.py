r"""Iterative (matmul-only) exact-GP inference: batched CG + stochastic
Lanczos quadrature — the TPU-native analogue of GPyTorch's BBMM engine
(Gardner et al. 2018, "Blackbox Matrix-Matrix Gaussian Process Inference").

Motivation: the Cholesky path costs O(N^3) with a sequential panel
dependency; everything here is *matrix-matrix products against Sigma*, which
the MXU executes at peak and which shard trivially over a mesh (a row-sharded
matmul needs one reduce-scatter — no factorisation dependency chain). For
the LFM family specifically, Sigma = K + noise*I with K effectively
low-rank (a few hundred latent-force degrees of freedom), so CG converges
in ~rank(K) iterations regardless of N — at N = 1e4+ the crossover over
Cholesky is decisive.

Pieces:

- :func:`batched_cg` — conjugate gradients on (N, R) blocks of RHS in one
  program (``lax.while_loop``; fused matmuls; converges on the max
  residual).
- :func:`lanczos` — m-step Lanczos tridiagonalisation with full
  reorthogonalisation, vmapped over probe vectors.
- :func:`slq_logdet` — stochastic Lanczos quadrature estimate of
  ``log det Sigma`` from Rademacher probes: eigendecompose the m x m
  tridiagonal (tiny) and quadrature ``z^T log(Sigma) z``.
- :func:`mvn_logpdf_cg` — the MLL with a custom VJP in the BBMM pattern:
  one batched CG solve against ``[y - mu, Z]`` serves the quadratic term,
  the logdet probes, AND the backward pass —
  ``d Sigma = g/2 (alpha alpha^T - E[Sigma^{-1} z z^T])`` reuses the probe
  solves as the Hutchinson estimator of ``Sigma^{-1}``.

The logdet (hence the MLL *value*) is a randomised estimate — unbiased in
``z^T log(Sigma) z`` and within O(1/sqrt(num_probes)) of the truth; the
*gradient* estimator is likewise unbiased, which is all SGD-style
hyperparameter optimisation needs. Use the Cholesky path when exact values
matter; use this at scales where O(N^3) does not fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LOG_2PI = 1.8378770664093453


def batched_cg(matvec, b, *, tol: float | None = None, max_iters: int = 256):
    """Solve A X = B for SPD A and B of shape (N, R) by block CG.

    ``matvec``: function (N, R) -> (N, R) applying A columnwise (one fused
    matmul for dense A). Iterations run per-column (standard CG recurrences
    vectorised over R); stops when every column's residual norm is below
    ``tol * ||b||`` or at ``max_iters``.

    ``tol=None`` resolves a dtype-aware default, ``100 * eps``: 1e-8 in
    f64, ~1.2e-5 in f32.  (The old fixed 1e-10 was unreachable in f32 —
    the residual stagnates near ``eps * ||b||`` — so the early exit never
    fired and every f32 solve silently ran all ``max_iters`` iterations.)
    """
    if tol is None:
        tol = 100 * float(jnp.finfo(jnp.result_type(b)).eps)
    # Krylov recurrences are precision-critical: on TPU the default matmul
    # precision (bf16-ish passes under allow_excess_precision) destroys
    # Lanczos orthogonality and can stall CG at large N — measured at
    # N=1e4: SLQ logdet -4722 (garbage; must be >= 0) at default precision
    # vs 63.2 at HIGHEST. Everything in this module traces under HIGHEST;
    # on v5e the measured f32 matmul rate is the same either way.
    return _batched_cg_hp(matvec, b, tol, max_iters)


def _batched_cg_hp(matvec, b, tol, max_iters):
    with jax.default_matmul_precision("highest"):
        return _batched_cg_impl(matvec, b, tol, max_iters)


def _batched_cg_impl(matvec, b, tol, max_iters):
    b_norm = jnp.linalg.norm(b, axis=0)  # (R,)
    thresh = tol * jnp.maximum(b_norm, 1e-30)

    x0 = jnp.zeros_like(b)
    r0 = b
    p0 = b
    rs0 = jnp.sum(r0 * r0, axis=0)  # (R,)

    def cond(state):
        _, r, _, _, i = state
        return jnp.logical_and(
            i < max_iters,
            jnp.any(jnp.linalg.norm(r, axis=0) > thresh),
        )

    def body(state):
        x, r, p, rs, i = state
        ap = matvec(p)
        denom = jnp.sum(p * ap, axis=0)
        alpha = rs / jnp.where(denom > 0, denom, 1.0)  # (R,)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        rs_new = jnp.sum(r * r, axis=0)
        beta = rs_new / jnp.where(rs > 0, rs, 1.0)
        p = r + beta[None, :] * p
        return x, r, p, rs_new, i + 1

    x, r, _, _, iters = jax.lax.while_loop(cond, body, (x0, r0, p0, rs0, 0))
    return x, iters


def lanczos(matvec, v0, m: int):
    """m-step Lanczos with full reorthogonalisation for one start vector.

    Returns (alphas (m,), betas (m-1,)) of the tridiagonal T_m. ``v0`` need
    not be normalised (handled internally). Runs at HIGHEST matmul
    precision (see :func:`batched_cg`).
    """
    with jax.default_matmul_precision("highest"):
        return _lanczos_impl(matvec, v0, m)


def _lanczos_impl(matvec, v0, m: int):
    n = v0.shape[0]
    v0 = v0 / jnp.linalg.norm(v0)
    V = jnp.zeros((m, n), v0.dtype).at[0].set(v0)
    alphas = jnp.zeros((m,), v0.dtype)
    betas = jnp.zeros((m,), v0.dtype)  # betas[j] links j and j+1

    def body(j, carry):
        V, alphas, betas = carry
        v = V[j]
        w = matvec(v[:, None])[:, 0]
        a = jnp.dot(v, w)
        w = w - a * v - jnp.where(j > 0, betas[j - 1], 0.0) * V[
            jnp.maximum(j - 1, 0)
        ]
        # Full reorthogonalisation against all previous vectors (mask the
        # not-yet-filled rows) — keeps T_m accurate past ~30 steps in f64.
        mask = (jnp.arange(m) <= j)[:, None]
        proj = (V * mask) @ w
        w = w - ((V * mask).T @ proj)
        b = jnp.linalg.norm(w)
        V = jax.lax.cond(
            j + 1 < m,
            lambda V: V.at[j + 1].set(
                jnp.where(b > 1e-30, w / b, jnp.zeros_like(w))
            ),
            lambda V: V,
            V,
        )
        alphas = alphas.at[j].set(a)
        betas = betas.at[j].set(b)
        return V, alphas, betas

    V, alphas, betas = jax.lax.fori_loop(0, m, body, (V, alphas, betas))
    return alphas, betas[: m - 1]


def _tridiag_logquad(alphas, betas):
    """e1^T log(T_m) e1 from the tridiagonal's eigendecomposition."""
    m = alphas.shape[0]
    T = (
        jnp.diag(alphas)
        + jnp.diag(betas, 1)
        + jnp.diag(betas, -1)
    )
    evals, evecs = jnp.linalg.eigh(T)
    evals = jnp.maximum(evals, 1e-30)
    w = evecs[0, :] ** 2
    return jnp.sum(w * jnp.log(evals))


def slq_logdet(
    matvec, n: int, key, *, num_probes: int = 16, m: int = 32, dtype=None
):
    """Stochastic Lanczos quadrature estimate of log det of an SPD operator.

    Rademacher probes; each contributes ``n * e1^T log(T_m) e1`` (the
    ``||z||^2 = n`` factor of the normalised start vector).  ``dtype``
    should be the operator's dtype: the old ``result_type(float)`` default
    silently promoted an f32 pipeline to emulated f64 under x64.
    """
    z = jax.random.rademacher(key, (num_probes, n)).astype(
        dtype or jnp.result_type(float)
    )

    def one(zi):
        a, b = lanczos(matvec, zi, m)
        return _tridiag_logquad(a, b)

    vals = jax.vmap(one)(z)
    return n * jnp.mean(vals), z


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def mvn_logpdf_cg(
    y_centered,
    sigma,
    key,
    num_probes: int = 16,
    lanczos_iters: int = 32,
    cg_iters: int = 256,
):
    """Stochastic-but-unbiased MVN log-density, matmul-only (BBMM)."""
    logp, _ = _cg_fwd(y_centered, sigma, key, num_probes, lanczos_iters, cg_iters)
    return logp


def _cg_fwd(y_centered, sigma, key, num_probes, lanczos_iters, cg_iters):
    n = y_centered.shape[0]
    matvec = lambda X: sigma @ X

    logdet, z = slq_logdet(
        matvec, n, key, num_probes=num_probes, m=lanczos_iters,
        dtype=y_centered.dtype,
    )
    # One batched solve serves quadratic term (col 0) and probes (rest).
    rhs = jnp.concatenate([y_centered[:, None], z.T], axis=1)
    sols, _ = batched_cg(matvec, rhs, max_iters=cg_iters)
    alpha = sols[:, 0]
    zsols = sols[:, 1:]  # Sigma^{-1} z_i

    logp = (
        -0.5 * jnp.dot(y_centered, alpha)
        - 0.5 * logdet
        - 0.5 * n * LOG_2PI
    )
    return logp, (alpha, z, zsols)


def _cg_bwd(num_probes, lanczos_iters, cg_iters, res, g):
    alpha, z, zsols = res
    # Hutchinson: E[Sigma^{-1} z z^T] = Sigma^{-1}; symmetrise the estimate.
    # Same HIGHEST-precision invariant as the rest of the module (the
    # forward traces under it; this product is the backward's dominant
    # Sigma-term and must not run at single-pass-bf16 default).
    with jax.default_matmul_precision("highest"):
        est = zsols @ z / z.shape[0]  # (N, N)
    sigma_inv_est = 0.5 * (est + est.T)
    d_y = -g * alpha
    d_sigma = (0.5 * g) * (jnp.outer(alpha, alpha) - sigma_inv_est)
    return d_y, d_sigma, None


mvn_logpdf_cg.defvjp(_cg_fwd, _cg_bwd)
