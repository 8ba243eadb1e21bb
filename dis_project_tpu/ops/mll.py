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
Gram construction only. On TPU the backward pass is triangular inversion plus
a rank-1 update — all MXU work.

``impl`` selects the O(N^3) backend at trace time:

- ``'xla'`` — ``jnp.linalg.cholesky`` + XLA ``triangular_solve`` (the f64
  CPU parity oracle and the small-N default);
- ``'blocked'`` — the MXU-blocked Pallas/matmul factoriser of
  ``ops.pallas_cholesky`` (large-N f32 TPU hot path); the backward pass
  builds ``Sigma^{-1}`` from the blocked triangular inverse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LOG_2PI = 1.8378770664093453  # log(2*pi)


# The blocked factoriser beats XLA's native cholesky on v5e f32 from
# N=2048 up (see ops.pallas_cholesky's measured table). Shared by every
# model family's dispatch (ExactSIMM, SecondOrderSIMM).
BLOCKED_CHOL_MIN_N = 2048


def resolve_chol_impl(n: int, dtype) -> str:
    """Trace-time O(N^3) backend choice: ``'blocked'`` for f32
    ``n >= BLOCKED_CHOL_MIN_N`` on TPU, else ``'xla'``."""
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if n >= BLOCKED_CHOL_MIN_N and dtype == jnp.float32 and on_tpu:
        return "blocked"
    return "xla"


def cholesky(sigma, impl: str = "xla"):
    """Lower Cholesky factor via the selected backend."""
    if impl == "blocked":
        from dis_project_tpu.ops import pallas_cholesky as pc

        if sigma.dtype == jnp.float32:
            # r3: the transposed-layout two-level factoriser (see
            # pc.blocked_cholesky_t) — one cheap transpose back to the
            # lower convention for callers that want L itself.
            return jnp.tril(pc.blocked_cholesky_t(sigma).T)
        return pc.blocked_cholesky(sigma)
    return jnp.linalg.cholesky(sigma)


def chol_solve(L, b):
    """Solve Sigma x = b given lower Cholesky factor L.

    XLA's ``triangular_solve`` primitive is already f32-accurate on TPU
    (measured ~2.6e-7 rel err; the matmul-precision config does not govern
    this primitive, so there is nothing to pin here — unlike the explicit
    matmul chains in ``ops.pallas_cholesky``, see ``MATMUL_PRECISION``).
    """
    z = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)


# Above this size, Sigma^{-1} = L^{-T} L^{-1} goes through the recursive
# blocked triangular inverse instead of XLA's triangular_solve against an
# N x N identity: the native solve materialises O(N/128) staggered (N, N)
# temporaries (measured: OOMs a 16 GB v5e at N = 10^4) and is also slower
# (v5e: 8.4 vs 4.9 ms at N=4096, 74 vs 35 ms at N=8192), while the blocked
# inverse is matmul-based with O(N^2) peak temps.
_TRI_INV_MIN_N = 2048


def _use_blocked_inv(L, impl: str) -> bool:
    """Trace-time choice of the Sigma^{-1} route in the backward pass."""
    return impl == "blocked" or L.shape[0] >= _TRI_INV_MIN_N


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mvn_logpdf_centered(y_centered, sigma, impl: str = "xla"):
    """log N(y_centered | 0, sigma) for a 1-D centered observation vector."""
    logp, _ = _mvn_fwd(y_centered, sigma, impl)
    return logp


def _mvn_fwd(y_centered, sigma, impl):
    dinvs = None
    if impl == "blocked":
        from dis_project_tpu.ops import pallas_cholesky as pc

        # Save the per-column diagonal-block inverses the factoriser
        # computes for its TRSM panels: the backward's full triangular
        # inverse (tri_inv_from_diag) then skips its diagonal stage.
        # Forward-only callers never materialise them (DCE).
        if sigma.dtype == jnp.float32:
            # r3 hot path: the transposed-layout factoriser. The forward
            # consumes Lt = L^T DIRECTLY (solves via trans, logdet from
            # the shared diagonal) — no transpose-back on the fwd path.
            Lt, dinvs = pc.blocked_cholesky_t(sigma, return_diag_inv=True)
            z = jax.scipy.linalg.solve_triangular(
                Lt, y_centered, lower=False, trans=1
            )
            alpha = jax.scipy.linalg.solve_triangular(Lt, z, lower=False)
            n = y_centered.shape[0]
            logp = (
                -0.5 * jnp.dot(y_centered, alpha)
                - jnp.sum(jnp.log(jnp.diagonal(Lt)))
                - 0.5 * n * LOG_2PI
            )
            # NOTE the residual factor is Lt (upper) on this path; the
            # backward recognises it by (impl == 'blocked', f32 dtype) —
            # both static at trace time.
            return logp, (Lt, alpha, dinvs)
        L, dinvs = pc.blocked_cholesky(sigma, return_diag_inv=True)
    else:
        L = cholesky(sigma, impl)
    alpha = chol_solve(L, y_centered)
    n = y_centered.shape[0]
    logp = (
        -0.5 * jnp.dot(y_centered, alpha)
        - jnp.sum(jnp.log(jnp.diagonal(L)))
        - 0.5 * n * LOG_2PI
    )
    return logp, (L, alpha, dinvs)


def _mvn_bwd(impl, res, g):
    L, alpha, dinvs = res
    if impl == "blocked" and L.dtype == jnp.float32:
        # Residual factor is the transposed-layout Lt on this path (see
        # _mvn_fwd): transpose back once here — the backward's tri-inverse
        # sweep is written against the lower convention, while the forward
        # stayed transpose-free.
        L = jnp.tril(L.T)
    d_y = -g * alpha
    if _use_blocked_inv(L, impl):
        from dis_project_tpu.ops import pallas_cholesky as pc

        # Sigma^{-1} reusing the factor via the blocked tri-inverse + SYRK.
        # d_sigma is emitted as a SYMMETRIC-EQUIVALENT cotangent: sigma is
        # an identically-symmetric function of everything upstream (a
        # covariance), so its tangent dSigma/dtheta is symmetric and only
        # sym(d_sigma) contributes to <d_sigma, dSigma/dtheta>.  We build
        #     d_sigma = g/2 * alpha alpha^T - g * (T - diag(T)/2),
        # with T = tril(Sigma^{-1}) incl. diagonal, whose symmetrization is
        # the textbook g/2 (alpha alpha^T - Sigma^{-1}) — skipping the
        # dense mirror of Sigma^{-1} (~0.7 ms of VPU passes at N=8192; the
        # minimal-tile SYRK produces the lower triangle natively).
        t = pc.inv_from_factor_tril(L, diag_inv=dinvs)
        d_sigma = (0.5 * g) * jnp.outer(alpha, alpha) - g * t
        idx = jnp.arange(L.shape[0])
        d_sigma = d_sigma.at[idx, idx].add((0.5 * g) * jnp.diagonal(t))
    else:
        # Small-N / oracle path: dense symmetric cotangent (the textbook
        # form), so raw-matrix comparisons against other estimators hold.
        eye = jnp.eye(L.shape[0], dtype=L.dtype)
        sigma_inv = chol_solve(L, eye)
        d_sigma = (0.5 * g) * (jnp.outer(alpha, alpha) - sigma_inv)
    return d_y, d_sigma


mvn_logpdf_centered.defvjp(_mvn_fwd, _mvn_bwd)


def mvn_logpdf(y, mean, sigma, impl: str = "xla"):
    """log N(y | mean, sigma); gradients flow to all three arguments."""
    return mvn_logpdf_centered(y - mean, sigma, impl)


def add_diagonal(mat, diag):
    """mat + diag(diag) — diag may be scalar or (N,)."""
    n = mat.shape[0]
    idx = jnp.arange(n)
    return mat.at[idx, idx].add(diag)
