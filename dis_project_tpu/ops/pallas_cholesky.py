r"""MXU-blocked Cholesky factorisation and triangular ops for large Gram
matrices.

Replaces the reference's library-delegated O(N^3) core — ``cola.inv`` /
``cola.solve`` / the MVN ``log_prob`` Cholesky (reference ``src/model.py:450,
504``, ``src/objectives.py:76-78``) — with blocked algorithms whose FLOPs
live in MXU matmuls and whose HBM traffic is minimised for the XLA
compilation model:

- :func:`blocked_cholesky_t` (r3, the f32 hot path) is a **transposed-
  layout, two-level left-looking** blocked factorisation: contiguous-row
  reads/writes of a single factor buffer, big per-panel correction dots,
  and a cheap 128-wide inner diagonal chain.  v5e r3, N=8192 f32
  real-Gram, mandatory 3-pass-bf16 matmul precision: **6.10 ms** vs 7.96
  for the r2 list-of-columns form and 12.9 for XLA's native cholesky
  (0.46 of the f32-faithful ceiling; see the measured floor decomposition
  below).
- :func:`blocked_cholesky` is the r2 **left-looking list-of-columns** form
  (kept as the f64 path and the explicit-block/diag-option research
  surface): each block column is corrected by ONE large matmul against the
  already-computed left factor and written exactly once.  v5e r2, N=8192
  f32 real-Gram at 3-pass precision: 7.8 ms (single-pass products ran
  4.3 ms but produce NaN on real conditioning).

**Measured floor decomposition at N=8192 f32 (v5e r3)** — why the
f32-faithful ceiling (N^3/3 "useful" FLOPs at bf16-peak/3 = 2.79 ms) is
not reachable by ANY implementation of this factorisation on this
toolchain, i.e. the tighter ceiling that actually binds:

====================================  ========  =========================
component                             measured  nature
====================================  ========  =========================
correction dots (N^3/6 MACs, 3-pass)  3.09 ms   217 TF/s big-dot rate is
                                                above nominal peak, but
                                                left-looking K-skew costs
                                                ~20% vs one square dot
serial diagonal chain (64 x 128)      0.52 ms   strictly sequential; XLA
                                                cannot overlap ops
TRSM-extra (N^2 x 128 / 2 MACs)       ~0.3 ms   explicit-inverse TRSM
                                                costs 2x substitution
factor-buffer updates (DUS)           ~0.7 ms   measured write cost of
                                                the in-place row updates
inner corrections + tri_inv + misc    ~1.4 ms   64 small dispatches
**sum (~= measured 6.10 ms)**         ~6.0 ms   => ~3.4 ms is the
                                                additive floor above the
                                                2.79 ms pure-MXU bound
====================================  ========  =========================

The single-kernel fusion route that would hide the serial chain was
measured unviable in r2 (``pallas_cholesky_fused``): Mosaic does not
co-issue VPU work under MXU dots, and in-kernel 3-pass split products run
at ~107 TF/s — half the XLA big-dot rate.
- :func:`tri_inv` inverts a lower-triangular matrix **bottom-up and
  batched**: all 2^k same-level off-diagonal corrections are one batched
  matmul pair, and results are written in place into a single threaded
  buffer (no concatenates — the concat-based recursive form spent more time
  copying than multiplying).
- :func:`inv_from_factor` assembles Sigma^{-1} = L^{-T} L^{-1}.  On TPU at
  scale the SYRK is :func:`syrk_ltl`, a Pallas kernel that enumerates
  exactly the substitution-minimal ``(i >= j, k >= i)`` tile triples with
  in-kernel split-bf16 3-pass products (v5e, N=8192 f32: 6.43 ms vs 8.06
  for the recursive :func:`_tril_t_tril`, which bottoms out in dense leaf
  products at ~2.1x the minimal tile count; both ~1.4e-5 rel vs f64).

Everything is static-shaped (block loops unroll at trace time), so the whole
factorisation jits, vmaps, and shards.  The B x B diagonal factorisation
defaults to XLA's native ``cholesky`` (measured faster than the Pallas VMEM
rank-1 kernel at every size on v5e: 0.03/0.12/0.17 ms at 256/512/1024 vs
0.13/0.96 ms for the Pallas kernel at 256/512); the Pallas path is kept for
environments where the XLA op is unavailable and for the interpret-mode
tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default block for the O(N^3) ops below mid scale; blocked_cholesky's
# block=None auto-dispatch upgrades to 1024 from N=8192 (v5e r2 sweep:
# 7.7 ms at 1024 vs 8.1 at 512 vs 12.5 for XLA's native cholesky at
# N=8192; 512 stays best at N=4096).
DEFAULT_BLOCK = 512

# f32 matmuls on TPU default to a SINGLE bf16 pass per product (~4e-3
# relative error).  The factorization chain amplifies that quadratically: a
# 5e-3-wrong TRSM panel corrupts every later Schur complement, and the real
# dense10k Gram (N=10^4, cond ~1e3) factorizes to NaN by block column 1
# (r2 bug — the random ``A A^T + N I`` benchmark matrix, cond ~4, never
# exposed it; XLA's native cholesky is accurate and was fine).  Every
# matmul in this module therefore runs at 3-pass-bf16 precision
# (~1.5e-5 relative — f32-class): correctness, not an option.  The VMEM
# kernels already pin HIGHEST explicitly (``_hdot``).
MATMUL_PRECISION = "high"  # = 3-pass bf16 on TPU (BF16_BF16_F32_X3)


def _f32_faithful(fn):
    """Trace ``fn`` with f32-faithful default matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision(MATMUL_PRECISION):
            return fn(*args, **kwargs)

    return wrapped


# ---------------------------------------------------------------------------
# Unblocked B x B Cholesky as a single Pallas program.
# ---------------------------------------------------------------------------


def _rank1_chol(M):
    """Cholesky of a small (SB, SB) SPD *value* via SB masked rank-1 updates.

    Column selection, pivot extraction and the L write-back all go through
    full-tile iota masks (VPU ops) instead of dynamic lane indexing, which
    the TPU vector unit handles poorly.  All arithmetic is exact f32 VPU —
    no MXU involvement, so no bf16-product rounding.
    """
    SB = M.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 1)

    def body(j, carry):
        M, L = carry
        is_j = cols == j
        d = jnp.sum(jnp.where(is_j & (rows == j), M, 0.0))
        c = jnp.sum(jnp.where(is_j & (rows >= j), M, 0.0), axis=1) * jax.lax.rsqrt(d)
        L = L + c[:, None] * is_j.astype(M.dtype)
        M = M - c[:, None] * c[None, :]
        return M, L

    _, L = jax.lax.fori_loop(0, SB, body, (M, jnp.zeros_like(M)))
    return L


def _chol_kernel(a_ref, o_ref):
    """Cholesky of one (B, B) SPD block, entirely in VMEM."""
    o_ref[:] = _rank1_chol(a_ref[:])


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
# Combined (B, B) Cholesky + triangular inverse in one VMEM program.
# ---------------------------------------------------------------------------

# Sub-block size for the in-VMEM left-looking panels of _chol_inv_vmem.
_SUB = 128


def _hdot(a, b):
    """MXU dot with true-f32 products (3-pass) — these dots are dispatch-
    overhead-bound, not rate-bound, so HIGHEST costs ~nothing and keeps the
    factor at f32 accuracy (measured 2.9e-7 vs 5.1e-4 rel. error at B=512
    for +20% kernel time inside the noise floor)."""
    return jax.lax.dot_general(
        a,
        b,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=a.dtype,
    )


def _tri_inv_doubling(L):
    """Inverse of a lower-triangular (SB, SB) value by nilpotent doubling.

    L = D (I + M) with M strictly lower => M^SB = 0 and
    (I + M)^{-1} = (I - M)(I + M^2)(I + M^4)...(I + M^{SB/2}): log2(SB)
    MXU matmul pairs, no substitution loop.  Exact for the nilpotent part
    in exact arithmetic.

    .. warning:: floating-point hazard — the intermediate powers ``M^2,
       M^4, ...`` can grow before the nilpotent cancellation kicks in.
       Safe at the 128-sub-block scale of the VMEM kernels for
       jittered-SPD factors; measured to DIVERGE (|LiL-I| ~ 1e2) as a
       512-leaf inverter on real LFM Gram factors at N=10^4.  Not used on
       any default path for that reason — prefer the exact substitution
       leaf (``_tri_inv_base``).
    """
    SB = L.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (SB, SB), 1)
    eye = (rows == cols).astype(L.dtype)
    dinv = 1.0 / jnp.sum(jnp.where(rows == cols, L, 0.0), axis=1)
    M = L * dinv[:, None] - eye  # strictly lower
    P = eye - M
    S = _hdot(M, M)
    # After k doublings P covers series exponents < 2^(k+1); nilpotency
    # needs exponents up to SB-1, so k = ceil(log2(SB)) - 1.  (The old
    # `SB.bit_length() - 2` was only correct for power-of-two SB —
    # truncated, silently wrong series otherwise.)
    steps = max((SB - 1).bit_length() - 1, 0)  # SB=128 -> 6 more doublings
    for _ in range(steps):
        P = P + _hdot(P, S)
        S = _hdot(S, S)
    return P * dinv[None, :]


def _chol_inv_vmem(C, l_ref, li_ref, m_ref, sub=_SUB):
    """Write L (lower factor of value ``C``) into ``l_ref`` and L^{-1} into
    ``li_ref``, entirely in VMEM.

    Left-looking over ``sub``-wide panels (static, unrolled): rank-1 f32
    diagonal factor, doubling inverse, TRSM panel as matmul, MXU trailing
    update in the ``m_ref`` workspace.  The full-block inverse is assembled
    blockwise from the panel inverses:
    ``Li[p, :off] = -dinv @ L[p, :off] @ Li[:off, :off]``.
    """
    B = C.shape[0]
    nb = B // sub
    dt = C.dtype
    m_ref[:] = C
    l_ref[:] = jnp.zeros((B, B), dt)
    li_ref[:] = jnp.zeros((B, B), dt)
    for p in range(nb):
        off = p * sub
        d = _rank1_chol(m_ref[off : off + sub, off : off + sub])
        dinv = _tri_inv_doubling(d)
        l_ref[off : off + sub, off : off + sub] = d
        if off + sub < B:
            below = _hdot(m_ref[off + sub :, off : off + sub], dinv.T)
            l_ref[off + sub :, off : off + sub] = below
            m_ref[off + sub :, off + sub :] = m_ref[
                off + sub :, off + sub :
            ] - _hdot(below, below.T)
        if p == 0:
            li_ref[:sub, :sub] = dinv
        else:
            corr = -_hdot(
                _hdot(dinv, l_ref[off : off + sub, :off]), li_ref[:off, :off]
            )
            li_ref[off : off + sub, :off] = corr
            li_ref[off : off + sub, off : off + sub] = dinv


def _chol_inv_kernel(a_ref, l_ref, li_ref, m_ref):
    _chol_inv_vmem(a_ref[:], l_ref, li_ref, m_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_inv_unblocked(a, *, interpret: bool = False):
    """L and L^{-1} of a single (B, B) SPD block in ONE Pallas program.

    Replaces the per-column XLA ``cholesky`` + ``tri_inv`` dispatch pair in
    :func:`blocked_cholesky` (measured: one 0.21 ms kernel at B=512 vs
    ~0.12 ms for XLA's cholesky alone plus the multi-dispatch triangular
    inverse).  f32 only; f32-accurate (all matmuls 3-pass HIGHEST, rank-1
    pivots on the VPU).
    """
    B = a.shape[0]
    return pl.pallas_call(
        _chol_inv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, B), a.dtype),
            jax.ShapeDtypeStruct((B, B), a.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((B, B), a.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * B * B, bytes_accessed=16 * B * B, transcendentals=B
        ),
        interpret=interpret,
    )(a)


# ---------------------------------------------------------------------------
# Triangular inverse: bottom-up, level-batched, in-place.
# ---------------------------------------------------------------------------


@_f32_faithful
def tri_inv_panels(L, *, panel: int = 2048, base: int = 256,
                   leaf: str = "solve"):
    """Two-level triangular inverse: batched panel-diagonal inverses + a
    row-panel sweep.

    The bottom-up doubling form (:func:`tri_inv`) spends much of its wall
    clock in level-gather copies and small batched matmuls.  This form has
    only ``nb = N/panel`` sequential steps: all ``panel``-sized diagonal
    inverses are ONE vmapped :func:`tri_inv` call, and each row-panel
    correction ``Li[i, :i] = -Dinv_i (L[i, :i] Li[:i, :i])`` is two
    full-width MXU matmuls, both triangle-aware (the left operand ``dinv``
    and the right operand's finished-prefix are triangular, so the sweep
    runs at the substitution-minimal N^3/6 MAC count).  v5e r2, N=8192 f32,
    mandatory 3-pass matmul precision: 6.39 ms vs 6.6 for the bottom-up
    doubling form; also friendlier under vmap/sharding (no O(log N)
    gather levels).
    """
    n = L.shape[0]
    if n <= panel:
        return tri_inv(L, base=base, leaf=leaf)
    nbp = -(-n // panel)
    npad = nbp * panel
    X = _pad_identity(L, npad) if npad != n else L
    diag = jnp.stack(
        [X[i * panel : (i + 1) * panel, i * panel : (i + 1) * panel]
         for i in range(nbp)]
    )
    dinv = jax.vmap(lambda Lb: tri_inv(Lb, base=base, leaf=leaf))(diag)
    rows = [dinv[0]]  # row-panel i: (panel, (i+1)*panel)
    for i in range(1, nbp):
        off = i * panel
        top = jnp.concatenate(
            [jnp.pad(r, ((0, 0), (0, off - r.shape[1]))) for r in rows]
        )  # (off, off) — finished prefix of Li
        Lrow = X[off : off + panel, :off]
        # Both products are triangle-aware: dinv[i] is lower-triangular, so
        # the left multiply skips its structural zeros too (v5e r2, N=8192
        # f32: 6.39 ms vs 6.86 for the dense left multiply — the ~22% MAC
        # saving that takes the sweep to the substitution-minimal count).
        Xi = -_mul_tril_dense(
            dinv[i], _mul_dense_tril(Lrow, top, base=panel // 2),
            base=panel // 2,
        )
        rows.append(jnp.concatenate([Xi, dinv[i]], axis=1))
    full = jnp.concatenate(
        [jnp.pad(r, ((0, 0), (0, npad - r.shape[1]))) for r in rows]
    )
    return full[:n, :n] if npad != n else full


@_f32_faithful
def tri_inv_from_diag(L, dinvs, *, panel: int = 2048):
    """``tril(L^{-1})`` given the per-block-column diagonal inverses from
    :func:`blocked_cholesky(return_diag_inv=True) <blocked_cholesky>`.

    The row-panel sweep of :func:`tri_inv_panels` with its diagonal stage
    deleted: ``Li[i, :i] = -dinvs[i] @ (L[i, :i] @ Li[:i, :i])``, both
    products triangle-aware.  The factoriser already inverted every
    diagonal block for its TRSM panels, so recomputing them in the MLL
    backward (the standalone :func:`tri_inv_panels` route) is pure waste —
    this is the factor-reuse analogue of the custom-VJP MLL itself.

    The sweep is cheapest at ``panel`` = 2048 on v5e (fewer, larger
    sequential steps; the :func:`tri_inv_panels` tuning carries over), so
    smaller factoriser blocks are first combined pairwise up to the panel
    size — each level is ONE pair of batched triangle-aware matmuls over
    all pairs (``[[Ai,0],[-Ci (B Ai), Ci]]``), far cheaper than the
    from-scratch diagonal inverses it replaces.  A sweep run directly at
    the factoriser's 1024 block measured 11.67 ms for the full
    ``tril(Sigma^{-1})`` at N=8192 vs 11.42 for the standalone panels
    route — the doubled step count ate the reuse; combining restores it.

    Identity-padded tails (``nb * B > n``) reproduce the factoriser's
    padding convention, so the slice-back is exact.
    """
    n = L.shape[0]
    nb, block = dinvs.shape[0], dinvs.shape[1]
    npad = nb * block
    # identity-pad: chol(blkdiag(A, I)) = blkdiag(L, I), so the padded
    # factor is exactly _pad_identity(L).
    X = _pad_identity(L, npad) if npad != n else L
    while block < panel and nb % 2 == 0 and nb > 1:
        # Pairwise combine: dinv of [[A,0],[B,C]] is [[Ai,0],[-Ci(B Ai),Ci]]
        # with Ai/Ci already in hand — batched over all nb/2 pairs.
        Ai = dinvs[0::2]
        Ci = dinvs[1::2]
        Bo = jnp.stack(
            [
                X[
                    (2 * p + 1) * block : (2 * p + 2) * block,
                    2 * p * block : (2 * p + 1) * block,
                ]
                for p in range(nb // 2)
            ]
        )
        X21 = -_mul_tril_dense(Ci, _mul_dense_tril(Bo, Ai))
        top = jnp.concatenate([Ai, jnp.zeros_like(Ai)], axis=2)
        bot = jnp.concatenate([X21, Ci], axis=2)
        dinvs = jnp.concatenate([top, bot], axis=1)
        block *= 2
        nb //= 2
    if nb == 1:
        return dinvs[0][:n, :n]
    rows = [dinvs[0]]  # row i: (block, (i+1)*block)
    for i in range(1, nb):
        off = i * block
        top = jnp.concatenate(
            [jnp.pad(r, ((0, 0), (0, off - r.shape[1]))) for r in rows]
        )  # (off, off) — finished tril prefix of Li
        Lrow = X[off : off + block, :off]
        Xi = -_mul_tril_dense(
            dinvs[i],
            _mul_dense_tril(Lrow, top, base=max(block // 2, 256)),
            base=max(block // 2, 256),
        )
        rows.append(jnp.concatenate([Xi, dinvs[i]], axis=1))
    full = jnp.concatenate(
        [jnp.pad(r, ((0, 0), (0, npad - r.shape[1]))) for r in rows]
    )
    return full[:n, :n] if npad != n else full


@_f32_faithful
def tri_inv(L, *, base: int = 256, leaf: str = "solve"):
    """Inverse of a lower-triangular matrix via bottom-up block doubling.

    [[A, 0], [B, C]]^{-1} = [[A^{-1}, 0], [-C^{-1} B A^{-1}, C^{-1}]]

    applied from the leaves up: all ``base x base`` diagonal blocks are
    inverted in ONE batched triangular solve, then each doubling level
    computes every off-diagonal correction ``-C^{-1} (B A^{-1})`` of that
    size as a single batched matmul pair and writes it in place.  The
    threaded buffer means zero concatenates; per level the traffic is one
    gather + one scatter of the touched blocks only.  O(n^3/3) FLOPs, ~all
    on the MXU.

    ``leaf`` selects the base-block inverter: ``'solve'`` (XLA batched
    ``triangular_solve`` — exact substitution, the f64/CPU default) or
    ``'doubling'`` (batched nilpotent-doubling, all MXU matmuls — measured
    faster on TPU, roundoff-exact for the diagonally-dominant factors of
    jittered SPD Grams).
    """
    n = L.shape[0]
    leaf_inv = _tri_inv_base if leaf == "solve" else _tri_inv_doubling
    if n <= base:
        return leaf_inv(L)
    # The doubling levels need size base * 2^m.  Padding up to the next
    # such size costs up to ~8x the FLOPs near a power-of-two boundary
    # (r2 review finding: N=10000 f64 padded to 16384 in the MLL backward)
    # — so non-conforming sizes instead SPLIT at the largest base * 2^k
    # <= n and recurse on the remainder, with one triangle-aware
    # correction: [[A,0],[B,C]]^{-1} = [[Ai,0],[-Ci (B Ai), Ci]].
    levels = int(math.log2(n / base))  # floor
    m = base << levels
    if m != n:
        A = L[:m, :m]
        C = L[m:, m:]
        B = L[m:, :m]
        Ai = tri_inv(A, base=base, leaf=leaf)
        Ci = tri_inv(C, base=base, leaf=leaf)
        X21 = -_mul_tril_dense(Ci, _mul_dense_tril(B, Ai))
        top = jnp.concatenate([Ai, jnp.zeros((m, n - m), L.dtype)], axis=1)
        bot = jnp.concatenate([X21, Ci], axis=1)
        return jnp.concatenate([top, bot], axis=0)
    npad = n
    X = L
    nb = npad // base

    # Leaf level: batched inverse of all diagonal base blocks.  All block
    # coordinates are static, so gathers are plain slices + stack (XLA copy
    # fusions), never gather HLOs.
    diag_blocks = jnp.stack(
        [X[i * base : (i + 1) * base, i * base : (i + 1) * base] for i in range(nb)]
    )
    dinv = jax.vmap(leaf_inv)(diag_blocks)
    for i in range(nb):
        X = jax.lax.dynamic_update_slice(X, dinv[i], (i * base, i * base))

    # Doubling levels: at size s, every pair's A^{-1}/C^{-1} are already in
    # place and the off-diagonal B block is still the original L content
    # (previous levels only wrote strictly inside their own diagonal
    # regions), so the update reads and writes disjoint regions of X.
    s = base
    while s < npad:
        P = npad // (2 * s)

        def _gather(r0, c0, s=s, P=P, X=X):
            return jnp.stack(
                [
                    X[p * 2 * s + r0 : p * 2 * s + r0 + s,
                      p * 2 * s + c0 : p * 2 * s + c0 + s]
                    for p in range(P)
                ]
            )

        Ai = _gather(0, 0)
        Ci = _gather(s, s)
        Bo = _gather(s, 0)
        # Both outer operands are triangular: triangle-aware batched
        # products cost ~2 s^3 per pair instead of the dense 4 s^3, taking
        # the whole inverse to the substitution-algorithm N^3/3 FLOPs.
        off = -_mul_tril_dense(Ci, _mul_dense_tril(Bo, Ai))
        for p in range(P):
            X = jax.lax.dynamic_update_slice(
                X, off[p], (p * 2 * s + s, p * 2 * s)
            )
        s *= 2
    return X[:n, :n] if npad != n else X


def _tri_inv_base(L):
    """Leaf inverse of a small lower-triangular block (one solve op)."""
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    return jax.scipy.linalg.solve_triangular(L, eye, lower=True)


def _mul_dense_tril(X, T, base: int = 512):
    """``X @ T`` for lower-triangular ``T`` (batched), skipping the
    structural zeros: [X1 X2] @ [[A,0],[B,C]] = [X1 A + X2 B, X2 C].
    ~half the FLOPs of the dense product."""
    n = T.shape[-1]
    if n <= base or n % 2:
        return X @ T
    h = n // 2
    X1, X2 = X[..., :, :h], X[..., :, h:]
    A = T[..., :h, :h]
    B = T[..., h:, :h]
    C = T[..., h:, h:]
    left = _mul_dense_tril(X1, A, base) + X2 @ B
    right = _mul_dense_tril(X2, C, base)
    return jnp.concatenate([left, right], axis=-1)


def _mul_tril_dense(T, X, base: int = 512):
    """``T @ X`` for lower-triangular ``T`` (batched), skipping the
    structural zeros: [[A,0],[B,C]] @ [X1; X2] = [A X1; B X1 + C X2]."""
    n = T.shape[-1]
    if n <= base or n % 2:
        return T @ X
    h = n // 2
    X1, X2 = X[..., :h, :], X[..., h:, :]
    A = T[..., :h, :h]
    B = T[..., h:, :h]
    C = T[..., h:, h:]
    top = _mul_tril_dense(A, X1, base)
    bot = B @ X1 + _mul_tril_dense(C, X2, base)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# Transposed-layout two-level left-looking blocked Cholesky (r3 default).
# ---------------------------------------------------------------------------


def _dot00(a, b, precision=None):
    """dot_general contracting dim 0 of BOTH operands: a^T @ b without an
    explicit transpose. With both operands read as contiguous ROW slices of
    the transposed factor buffer this orientation measured FASTER than the
    (1, 0) contraction against a strided column slice (v5e r3, N=8192
    correction chain: 3.09 vs 3.61 ms) — the strided slice materialises a
    copy, the row slice is a free bitcast view. ``precision=None`` inherits
    the ambient default (the module's f32-faithful 3-pass)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), precision=precision
    )


@_f32_faithful
def blocked_cholesky_t(
    a,
    *,
    block: int | None = None,
    inner: int = 128,
    probe_eps=None,
    return_diag_inv: bool = False,
    outer_precision=None,
):
    r"""UPPER-triangular Cholesky factor ``Lt = L^T`` (plus identically-zero
    strict-lower padding blocks), via a transposed-layout TWO-LEVEL
    left-looking blocked factorisation — the r3 redesign of
    :func:`blocked_cholesky` and the op the f32 MLL hot path consumes.

    Why transposed: the factor accumulates in ONE (npad, npad) buffer whose
    row-block ``j`` holds column-block ``j`` of L transposed, so every
    left-factor read in the correction

        panelT = A[off:off+Bo, off:] - Lt[:off, off:off+Bo]^T Lt[:off, off:]

    is a contiguous row slice (zero-copy) contracted on dim 0, and every
    write is a contiguous ``dynamic_update_slice``.  The r2 list-of-columns
    form paid ~1.7 ms of concat/assembly plus strided-slice copies at
    N=8192; this form pays ~0.7 ms of in-place row-range updates.

    Why two-level: the serial diagonal chain is the other fixed cost —
    XLA's ``cholesky`` costs 0.203/0.143/0.035/0.008 ms at B=1024/512/256/
    128 on v5e, so 64 x chol(128) = 0.5 ms beats 8 x chol(1024) = 1.6 ms —
    but ``inner``-sized OUTER blocks would re-read the left factor
    N/inner times (HBM-bound).  So: ``block``-wide outer panels take one
    big correction dot each, and ``inner``-wide columns inside the panel
    keep the diagonal chain and the TRSM-extra MACs (N^2 * inner / 2) at
    the cheap inner size.

    v5e r3 sweep, real-Gram f32, mandatory 3-pass matmul precision:

        N=8192: 6.10 ms (Bo=512) / 6.31 (1024) / 11.8 (Bi=64)
                vs 7.96 ms for the r2 list-form at its best block
        N=4096: 1.47 ms (Bo=2048)  vs 1.70 r2   N=2048: 0.52 vs 0.73

    ``probe_eps`` (optional scalar) is folded into the first panel read —
    a numerically-negligible dependency hook so chained benchmark
    executions stay CSE/replay-proof without an O(N^2) input perturbation.

    ``return_diag_inv=True`` also returns the stacked (nb_inner, inner,
    inner) per-inner-column diagonal-block inverses (identity on padded
    tails) for the MLL backward's factor reuse (:func:`tri_inv_from_diag`).

    ``outer_precision`` (research knob, VERDICT r3 #1): overrides the
    matmul precision of the OUTER trailing-correction dots only (inner
    panels stay f32-faithful). ``'default'`` = single-pass bf16 — see the
    mixed-precision study in PARITY.md r4 for why this is NOT the shipped
    configuration.
    """
    n = a.shape[0]
    if block is None:
        # v5e r3 sweep: Bo=512 wins at N=8192 (6.10 vs 6.31 ms at 1024);
        # Bo=2048 below (1.47 vs 1.55 at N=4096). Always a multiple of
        # ``inner`` (the inner loop tiles the panel exactly).
        block = 512 if n >= 8192 else min(2048, -(-n // inner) * inner)
    if block % inner:
        raise ValueError(
            f"blocked_cholesky_t: block ({block}) must be a multiple of "
            f"inner ({inner})"
        )
    Bo, Bi = block, inner
    nbo = -(-n // Bo)
    npad = nbo * Bo
    A = _pad_identity(a, npad) if npad != n else a
    nbi = Bo // Bi

    Lt = jnp.zeros((npad, npad), A.dtype)
    dinvs = []
    for K in range(nbo):
        off = K * Bo
        m = npad - off
        panelT = A[off : off + Bo, off:]
        if K == 0 and probe_eps is not None:
            panelT = panelT.at[0, 0].add(probe_eps)
        if K > 0:
            panelT = panelT - _dot00(
                Lt[:off, off : off + Bo], Lt[:off, off:],
                precision=outer_precision,
            )
        for c in range(nbi):
            io = c * Bi
            rowT = panelT[io : io + Bi, io:]
            if c > 0:
                rowT = rowT - _dot00(
                    panelT[:io, io : io + Bi], panelT[:io, io:]
                )
            lkk = jnp.linalg.cholesky(rowT[:, :Bi])
            dinv = tri_inv(lkk, base=min(Bi, 256))
            if return_diag_inv:
                dinvs.append(dinv)
            if io + Bi < m:
                rest = dinv @ rowT[:, Bi:]
                rowT = jnp.concatenate([lkk.T, rest], axis=1)
            else:
                rowT = lkk.T
            panelT = jax.lax.dynamic_update_slice(panelT, rowT, (io, io))
        Lt = jax.lax.dynamic_update_slice(Lt, panelT, (off, off))
    Lt = Lt[:n, :n] if npad != n else Lt
    if return_diag_inv:
        return Lt, jnp.stack(dinvs)
    return Lt


# ---------------------------------------------------------------------------
# Left-looking blocked Cholesky.
# ---------------------------------------------------------------------------


@_f32_faithful
def blocked_cholesky(
    a,
    *,
    block: int | None = None,
    diag: str = "xla",
    matmul_dtype=None,
    return_diag_inv: bool = False,
    interpret: bool = False,
):
    """Lower Cholesky factor of an SPD matrix, MXU-blocked, left-looking.

    For block column k (static Python loop, straight-line code):

        C      = A[k:, k] - L[k:, :k] @ L[k, :k]^T   # ONE large matmul
        L_kk   = chol(C[:B])                          # B x B diagonal factor
        L_k+1: = C[B:] @ L_kk^{-T}                    # TRSM as matmul

    The factor lives as a Python list of block columns until one final
    assembly concat — measured the fastest representation on v5e by a wide
    margin (3.6 ms vs 5.9 ms at N=8192 for the dynamic-update-slice form,
    whose in-place updates XLA cannot always prove, and 20 ms for the
    textbook right-looking form, which rewrites the trailing matrix every
    step).  FLOPs are the usual N^3/3; each output element is written once.

    ``diag`` selects the B x B diagonal factoriser: ``'xla'``
    (``jnp.linalg.cholesky``, measured fastest on v5e at every size) or
    ``'pallas'`` (the VMEM rank-1 kernel above, f32 only).

    ``matmul_dtype`` (e.g. ``jnp.bfloat16``) optionally demotes the inputs
    of the two panel matmuls (correction + TRSM) while keeping f32
    accumulation (``preferred_element_type``) and an f32 diagonal factor.
    On v5e this is nearly free to leave at None: XLA already runs f32
    matmuls at ~94% of the bf16 MXU rate, so bf16 buys only the smaller
    copies (~8%) at a ~1e-3 relative accuracy cost — measured and rejected
    as the default (VERDICT r1 experiment).

    Non-multiple-of-block sizes are padded with an identity tail (the
    Cholesky of ``blkdiag(A, I)`` is ``blkdiag(L, I)``) and sliced back.

    ``block=None`` picks the measured-best size: 1024 from N=8192 up
    (v5e r2 sweep at N=8192 f32: 7.7 / 8.1 / 8.4 ms for block
    1024 / 512 / 2048; non-power-of-two blocks lose badly to padding),
    512 below (N=4096: 1.74 ms at 512 vs 2.02 at 1024).

    ``return_diag_inv=True`` additionally returns the stacked per-column
    diagonal-block inverses ``dinvs[k] = L[kB:(k+1)B, kB:(k+1)B]^{-1}``
    (shape ``(nb, B, B)``, padded-tail blocks are identity).  The TRSM
    panels compute these anyway; the custom-VJP MLL saves them as
    residuals so the backward pass's full triangular inverse
    (:func:`tri_inv_from_diag`) can skip re-inverting every diagonal
    block.  Unused outputs are DCE'd, so forward-only callers pay nothing.
    """
    n = a.shape[0]
    if block is None:
        block = 1024 if n >= 8192 else DEFAULT_BLOCK
    if diag == "pallas_inv" and (
        a.dtype == jnp.float64 or block % _SUB or block > _PALLAS_CHOL_MAX_B
    ):
        diag = "xla"  # VMEM kernel is f32-only and sub-blocked at 128
    if n <= block:
        if diag == "pallas_inv" and n % _SUB == 0:
            L, linv = chol_inv_unblocked(a, interpret=interpret)
            L = jnp.tril(L)
            return (L, linv[None]) if return_diag_inv else L
        if diag == "pallas_inv":
            diag = "xla"
        L = jnp.tril(_diag_chol(a, diag, interpret))
        if return_diag_inv:
            return L, tri_inv(L, base=min(block, 256))[None]
        return L
    nb = -(-n // block)
    npad = nb * block
    A = _pad_identity(a, npad) if npad != n else a

    acc = A.dtype
    cols = []  # col j: (npad - j*block, block) — rows j*block and below
    dinvs = []
    for k in range(nb):
        off = k * block
        col = A[off:, off : off + block]  # (m, B) — original A content
        if k > 0:
            # Finished columns, sliced to rows >= off and concatenated into
            # the (m, off) left factor for ONE large correction matmul.
            left = jnp.concatenate(
                [c[off - j * block :] for j, c in enumerate(cols)], axis=1
            )
            if matmul_dtype is not None:
                left = left.astype(matmul_dtype)
                col = col - jnp.dot(
                    left, left[:block].T, preferred_element_type=acc
                )
            else:
                # Runs at MATMUL_PRECISION (module note): single-pass-bf16
                # products here made the real dense10k Schur complements
                # indefinite (NaN factor) — 3-pass is the correctness floor.
                col = col - left @ left[:block].T
        linv = None
        if diag == "pallas_inv":
            lkk, linv = chol_inv_unblocked(col[:block], interpret=interpret)
        else:
            lkk = jnp.tril(_diag_chol(col[:block], diag, interpret))
        last = off + block >= npad
        if linv is None and (not last or return_diag_inv):
            linv = tri_inv(lkk, base=min(block, 256))
        if return_diag_inv:
            dinvs.append(linv)
        if not last:
            linv_t = linv.T
            panel = col[block:]
            if matmul_dtype is not None:
                panel = panel.astype(matmul_dtype)
                linv_t = linv_t.astype(matmul_dtype)
                lpanel = jnp.dot(panel, linv_t, preferred_element_type=acc)
            else:
                lpanel = panel @ linv_t
            cols.append(jnp.concatenate([lkk, lpanel], axis=0))
        else:
            cols.append(lkk)

    full = [
        jnp.concatenate([jnp.zeros((j * block, block), acc), c], axis=0)
        if j
        else c
        for j, c in enumerate(cols)
    ]
    L = jnp.concatenate(full, axis=1)
    L = L[:n, :n] if npad != n else L
    if return_diag_inv:
        return L, jnp.stack(dinvs)
    return L


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


@_f32_faithful
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


@_f32_faithful
def _tril_t_tril(Li, *, base: int = 1024):
    # base retuned under the mandatory 'high' matmul precision (v5e r2,
    # N=8192 f32: 8.06 / 8.43 / 10.5 ms for base 1024 / 2048 / 4096).
    """``Li.T @ Li`` for lower-triangular ``Li``, skipping structural zeros.

    With Li = [[A, 0], [B, C]] (A, C lower-triangular):

        Li^T Li = [[A^T A + B^T B,  B^T C],
                   [(B^T C)^T,      C^T C]]

    Recursing on A and C does ~0.7 n^3 FLOPs instead of the dense 2 n^3.
    The result is exactly symmetric by construction (the lower-left block
    is the transpose of the upper-right).
    """
    n = Li.shape[0]
    if n <= base or n % 2:
        return Li.T @ Li
    h = n // 2
    A = Li[:h, :h]
    B = Li[h:, :h]
    C = Li[h:, h:]
    TL = _tril_t_tril(A, base=base) + B.T @ B
    TR = B.T @ C
    BR = _tril_t_tril(C, base=base)
    top = jnp.concatenate([TL, TR], axis=1)
    bot = jnp.concatenate([TR.T, BR], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _syrk_kernel(i_arr, j_arr, k_arr, a_ref, b_ref, o_ref):
    """One (tile, k) reduction step of the lower-triangle SYRK.

    Step ``s`` adds ``Li[k, i]^T @ Li[k, j]`` into output tile ``(i, j)``
    (``j <= i``, ``k`` ascending from ``i``).  Consecutive steps share the
    same output tile, so the f32 accumulator stays resident in VMEM across
    the whole ``k`` reduction and is flushed exactly once per tile.

    The products are in-kernel split-bf16 3-pass (hi/lo decomposition,
    ``a hi @ b hi + a hi @ b lo + a lo @ b hi``) — the same numerics as the
    module-wide mandatory ``BF16_BF16_F32_X3`` matmul precision (see
    ``MATMUL_PRECISION``), expressed explicitly because the kernel runs
    outside XLA's precision machinery.

    .. note:: losing experiment (r2): hoisting the hi/lo decomposition out
       of the kernel as four precomputed bf16 operand streams is both
       SLOWER (5.45 vs 5.12 ms at N=8192/tile=512 — the bf16 streams halve
       per-step DMA bytes but the kernel is MXU-bound, not DMA-bound) and
       WRONG: outside Mosaic, XLA's excess-precision simplification
       collapses the ``f32 -> bf16 -> f32`` round-trip, so the ``lo``
       stream silently loses its content (measured 3.0e-4 rel error vs
       3.1e-6 for the in-kernel split on the same operand).  The
       decomposition must stay inside the kernel.
    """
    s = pl.program_id(0)
    first = k_arr[s] == i_arr[s]
    a = a_ref[...]
    b = b_ref[...]
    f32 = jnp.float32
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(f32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(f32)).astype(jnp.bfloat16)
    # precision is pinned to DEFAULT: the split-bf16 passes ARE the
    # precision mechanism here, and the caller's ambient
    # default_matmul_precision('high') context (``_f32_faithful``) would
    # otherwise leak into these bf16 dots — Mosaic cannot lower
    # precision=HIGH and fails at pallas_call lowering time.
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.DEFAULT,
    )
    acc = dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)

    @pl.when(first)
    def _():
        o_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        o_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def syrk_ltl_tril(Li, *, tile: int = DEFAULT_BLOCK, interpret: bool = False):
    """``tril(Li.T @ Li)`` (diagonal included) for lower-triangular f32
    ``Li`` as a minimal-tile Pallas SYRK.

    The recursive :func:`_tril_t_tril` skips structural zeros down to its
    base size but its leaf ``B.T @ B`` products are dense — ~2.1x the
    substitution-minimal tile count.  This kernel enumerates exactly the
    tiles the triangular structure requires: one flattened grid step per
    ``(i >= j, k >= i)`` triple (``~nt^3/6`` of the dense ``nt^3``), with
    scalar-prefetch index streams driving the block maps.  Only the lower
    triangle is computed; :func:`syrk_ltl` adds the two-VPU-pass mirror for
    callers that need the dense symmetric matrix.
    """
    n = Li.shape[0]
    np_ = -(-n // tile) * tile
    X = jnp.pad(Li, ((0, np_ - n), (0, np_ - n))) if np_ != n else Li
    nt = np_ // tile
    import numpy as np

    ii, jj = np.tril_indices(nt)
    trip = [(i, j, k) for i, j in zip(ii, jj) for k in range(int(i), nt)]
    i_arr = jnp.asarray([t[0] for t in trip], jnp.int32)
    j_arr = jnp.asarray([t[1] for t in trip], jnp.int32)
    k_arr = jnp.asarray([t[2] for t in trip], jnp.int32)
    nsteps = len(trip)

    cost = pl.CostEstimate(
        flops=6 * nsteps * tile**3,  # 3 bf16 passes x 2 FLOP/MAC
        bytes_accessed=(2 * nsteps + nt * (nt + 1) // 2) * tile * tile * 4,
        transcendentals=0,
    )
    out = pl.pallas_call(
        _syrk_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec(
                    (tile, tile), lambda s, i_a, j_a, k_a: (k_a[s], i_a[s])
                ),
                pl.BlockSpec(
                    (tile, tile), lambda s, i_a, j_a, k_a: (k_a[s], j_a[s])
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile, tile), lambda s, i_a, j_a, k_a: (i_a[s], j_a[s])
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((np_, np_), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(i_arr, j_arr, k_arr, X, X)
    C = out[:n, :n]
    return jnp.tril(C)  # strict-upper tiles were never written


def syrk_ltl(Li, *, tile: int = DEFAULT_BLOCK, interpret: bool = False):
    """``Li.T @ Li`` (dense symmetric) via :func:`syrk_ltl_tril` + mirror."""
    lower = syrk_ltl_tril(Li, tile=tile, interpret=interpret)
    return lower + jnp.tril(lower, -1).T


def _syrk_backend() -> bool:
    """True when the minimal-tile Pallas SYRK should dispatch.

    Deliberately NARROW (``== 'tpu'``), unlike the not-cpu/gpu gates in
    ``mll.resolve_chol_impl`` / ``simm._on_tpu``: those route to portable
    XLA code where over-matching is harmless, while this one routes to a
    Pallas **TPU** kernel that cannot lower anywhere else — an unknown
    plugin backend must take the portable ``_tril_t_tril`` matmul
    recursion instead.  The axon remote tunnel resolves
    ``jax.default_backend()`` to ``'tpu'``, so the hot path still
    dispatches there (measured: the SYRK numbers in the module header).
    """
    return jax.default_backend() == "tpu"


@_f32_faithful
def inv_from_factor(L, *, block: int = DEFAULT_BLOCK):
    """Σ^{-1} = L^{-T} L^{-1} from the Cholesky factor.

    f32 above N=2048 takes the panel-trtri route, with the SYRK dispatched
    to the minimal-tile Pallas kernel on TPU (:func:`syrk_ltl` — v5e r2,
    N=8192: 6.43 ms vs 8.06 for the recursive :func:`_tril_t_tril`, same
    3-pass-bf16 numerics class at 1.4e-5 rel) and to the recursion
    elsewhere; f64 keeps the substitution path for the CPU parity oracle.

    The custom-VJP MLL backward (``ops.mll._mvn_bwd``) consumes the
    mirror-free :func:`inv_from_factor_tril` instead — the MLL's Σ
    cotangent only matters up to symmetrization, so the dense mirror
    (~0.7 ms of VPU passes at N=8192) is skipped on the hot path.
    """
    if L.dtype == jnp.float32 and L.shape[0] > 2048:
        Li = tri_inv_panels(L)
        if _syrk_backend():
            return syrk_ltl(Li)
        return _tril_t_tril(Li)
    Li = tri_inv(L, base=min(block, 256))
    return _tril_t_tril(Li)


@_f32_faithful
def inv_from_factor_tril(L, *, block: int = DEFAULT_BLOCK, diag_inv=None):
    """``tril(Σ^{-1})`` (diagonal included) from the Cholesky factor.

    Same dispatch as :func:`inv_from_factor` minus the mirror: on the TPU
    f32 hot path the minimal-tile SYRK already produces the lower triangle
    natively, so this is strictly cheaper; elsewhere it is a ``tril`` of
    the recursive product (the small-N / f64 oracle paths, where the extra
    VPU pass is irrelevant).

    ``diag_inv`` (the stacked per-column diagonal inverses from
    ``blocked_cholesky(return_diag_inv=True)``) routes the triangular
    inverse through :func:`tri_inv_from_diag`, skipping the diagonal-stage
    re-inversion — the MLL-backward factor-reuse path.
    """
    if L.dtype == jnp.float32 and L.shape[0] > 2048:
        Li = tri_inv_from_diag(L, diag_inv) if diag_inv is not None \
            else tri_inv_panels(L)
        if _syrk_backend():
            return syrk_ltl_tril(Li)
        return jnp.tril(_tril_t_tril(Li))
    if diag_inv is not None:
        Li = tri_inv_from_diag(L, diag_inv)
    else:
        Li = tri_inv(L, base=min(block, 256))
    return jnp.tril(_tril_t_tril(Li))
