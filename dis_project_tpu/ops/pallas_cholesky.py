r"""MXU-blocked Cholesky factorisation and triangular ops for large Gram
matrices.

Replaces the reference's library-delegated O(N^3) core — ``cola.inv`` /
``cola.solve`` / the MVN ``log_prob`` Cholesky (reference ``src/model.py:450,
504``, ``src/objectives.py:76-78``) — with a right-looking *blocked*
factorisation whose FLOPs live in MXU matmuls:

    for each block column k (static unrolled, shapes shrink):
        L_kk   = chol(A_kk)                 # B x B Pallas kernel (VPU)
        L_ik   = A_ik · L_kk^{-T}           # TRSM as matmul vs tri-inverse
        A_trail -= L_panel · L_panelᵀ       # rank-B SYRK on the MXU

- The B x B diagonal factorisation is a single-program Pallas kernel doing
  B rank-1 VPU updates entirely in VMEM (`chol_unblocked`).
- The panel TRSM is reformulated as a matmul against an explicitly inverted
  triangular block (`tri_inv`, recursive block inversion — log-depth, all
  matmuls), the standard GPU/TPU trick: trades a bit of conditioning on the
  B x B block for MXU throughput on the (N-kB) x B panel.
- The trailing SYRK — where ~N^3/3 of the FLOPs are — is a plain ``jnp.dot``
  so XLA schedules it on the MXU at full rate.

Everything is static-shaped (the block loop unrolls at trace time), so the
whole factorisation jits, vmaps, and shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 256


# ---------------------------------------------------------------------------
# Unblocked B x B Cholesky as a single Pallas program.
# ---------------------------------------------------------------------------


def _chol_kernel(a_ref, o_ref):
    """Cholesky of one (B, B) SPD block, entirely in VMEM.

    B rank-1 updates; column selection and the L write-back are done with
    iota masks (full-tile VPU ops) instead of dynamic lane indexing, which
    the TPU vector unit handles poorly.
    """
    B = a_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)

    def body(j, carry):
        M, L = carry
        is_j = cols == j
        # Pivot d = M[j, j] extracted via mask-reduce (scalar).
        d = jnp.sum(jnp.where(is_j & (rows == j), M, 0.0))
        inv_sqrt = jax.lax.rsqrt(d)
        # Column j of M, zeroed above the diagonal, scaled to a unit pivot.
        c = jnp.sum(jnp.where(is_j & (rows >= j), M, 0.0), axis=1) * inv_sqrt
        L = L + c[:, None] * is_j.astype(M.dtype)
        M = M - c[:, None] * c[None, :]
        return M, L

    M0 = a_ref[:]
    L0 = jnp.zeros_like(M0)
    _, L = jax.lax.fori_loop(0, B, body, (M0, L0))
    o_ref[:] = L


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_unblocked(a, *, interpret: bool = False):
    """Pallas Cholesky of a single (B, B) SPD block (B <= ~512 for VMEM)."""
    B = a.shape[0]
    return pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct((B, B), a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * B * B, bytes_accessed=8 * B * B, transcendentals=B
        ),
        interpret=interpret,
    )(a)


# ---------------------------------------------------------------------------
# Triangular inverse by recursive block partitioning (all matmuls).
# ---------------------------------------------------------------------------


def tri_inv(L, *, base: int = 64):
    """Inverse of a lower-triangular matrix via recursive 2x2 blocking.

    [[A, 0], [B, C]]^{-1} = [[A^{-1}, 0], [-C^{-1} B A^{-1}, C^{-1}]]

    Log-depth static recursion; the off-diagonal work is matmuls (MXU).
    Only the tiny ``base x base`` leaves use a sequential triangular solve,
    so the O(n^3/3) total cost is almost entirely MXU-resident.
    """
    n = L.shape[0]
    if n <= base:
        return _tri_inv_base(L)
    h = n // 2
    A = L[:h, :h]
    B = L[h:, :h]
    C = L[h:, h:]
    Ai = tri_inv(A, base=base)
    Ci = tri_inv(C, base=base)
    off = -Ci @ (B @ Ai)
    top = jnp.concatenate([Ai, jnp.zeros((h, n - h), L.dtype)], axis=1)
    bot = jnp.concatenate([off, Ci], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _tri_inv_base(L):
    """Leaf inverse of a small lower-triangular block (one solve op)."""
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    return jax.scipy.linalg.solve_triangular(L, eye, lower=True)


# ---------------------------------------------------------------------------
# Right-looking blocked Cholesky.
# ---------------------------------------------------------------------------


def blocked_cholesky(
    a,
    *,
    block: int = DEFAULT_BLOCK,
    diag: str = "pallas",
    interpret: bool = False,
):
    """Lower Cholesky factor of an SPD matrix, MXU-blocked.

    ``diag`` selects the B x B diagonal factoriser: ``'pallas'`` (the VMEM
    kernel above) or ``'xla'`` (``jnp.linalg.cholesky``, used automatically
    for f64 inputs where the Pallas kernel would need f64 VMEM tiles).

    Non-multiple-of-block sizes are padded with an identity tail (the
    Cholesky of ``blkdiag(A, I)`` is ``blkdiag(L, I)``) and sliced back.
    """
    n = a.shape[0]
    if n <= block:
        return _diag_chol(a, diag, interpret)
    nb = -(-n // block)
    npad = nb * block
    if npad != n:
        a = _pad_identity(a, npad)

    def factor(trail, out_cols):
        m = trail.shape[0]
        akk = trail[:block, :block]
        lkk = _diag_chol(akk, diag, interpret)
        if m == block:
            out_cols.append(lkk)
            return
        panel = trail[block:, :block]
        lkk_it = tri_inv(lkk).T  # (B, B) upper
        lpanel = panel @ lkk_it  # TRSM as matmul (MXU)
        out_cols.append(jnp.concatenate([lkk, lpanel], axis=0))
        new_trail = trail[block:, block:] - lpanel @ lpanel.T  # SYRK (MXU)
        factor(new_trail, out_cols)

    cols = []
    factor(a, cols)
    # Stitch block columns back into the full (npad, npad) lower factor.
    L = jnp.zeros((npad, npad), a.dtype)
    for k, colk in enumerate(cols):
        L = L.at[k * block :, k * block : (k + 1) * block].set(colk)
    return L[:n, :n]


# The single-program kernel holds ~4 (B, B) f32 buffers in VMEM (in, out,
# and the fori_loop carry pair); B=512 uses ~4 MiB, B=1024 would blow the
# 16 MiB budget — recurse with a smaller block instead.
_PALLAS_CHOL_MAX_B = 512


def _diag_chol(a, diag, interpret):
    if diag == "pallas" and a.dtype != jnp.float64:
        B = a.shape[0]
        if B > _PALLAS_CHOL_MAX_B:
            return blocked_cholesky(
                a, block=_PALLAS_CHOL_MAX_B, diag=diag, interpret=interpret
            )
        return chol_unblocked(a, interpret=interpret)
    return jnp.linalg.cholesky(a)


def _pad_identity(a, npad):
    n = a.shape[0]
    out = jnp.zeros((npad, npad), a.dtype)
    out = out.at[:n, :n].set(a)
    idx = jnp.arange(n, npad)
    return out.at[idx, idx].set(1.0)


# ---------------------------------------------------------------------------
# Blocked solves against a factored matrix.
# ---------------------------------------------------------------------------


def blocked_chol_solve(L, b, *, block: int = DEFAULT_BLOCK):
    """Solve (L Lᵀ) x = b via the explicit blocked triangular inverse.

    Costs ~N^3/3 matmul FLOPs for ``tri_inv`` plus O(N^2 M) for the two
    multiplies — all MXU-resident with no length-N sequential substitution.
    Right-sized for the MLL path, which needs Σ^{-1} anyway (backward pass);
    for a few RHS without a full inverse, XLA's ``triangular_solve`` wins.
    """
    Li = tri_inv(L, base=min(block, 256))
    z = Li @ b
    return Li.T @ z


def inv_from_factor(L, *, block: int = DEFAULT_BLOCK):
    """Σ^{-1} = L^{-T} L^{-1} from the Cholesky factor — the quantity the
    custom-VJP MLL backward pass consumes (``ops.mll._mvn_bwd``).

    base=256 measured best on v5e at N=8192 (34 ms vs 49 ms at base=64;
    the recursion's concatenates dominate below that)."""
    Li = tri_inv(L, base=min(block, 256))
    return Li.T @ Li
