r"""Single-kernel fused blocked Cholesky for TPU (Pallas, manual DMA).

**Status: experimental — measured SLOWER than the XLA-level blocked path on
v5e, kept as the scaffold + measurement record for the fusion approach.**

.. warning:: numerics — this kernel's correction dots use single-pass bf16
   operand staging, which the r2 precision study showed corrupts the Schur
   complements of *real* (cond ~1e3) LFM Grams to the point of a NaN
   factor (``pallas_cholesky.MATMUL_PRECISION``).  A production fused
   kernel would need 3-pass split-bf16 products (~3x the dot time), which
   also shifts this module's bound analysis: dots 1.25 -> ~3.7 ms, total
   single-kernel floor ~5.6 ms — no longer competitive with the XLA-level
   path (7.8 ms measured, of which only ~3 ms is dots).  Another reason it
   stays experimental.

The XLA-level blocked factoriser (:mod:`ops.pallas_cholesky`) is limited by
XLA's copy semantics: every left-looking correction either concatenates the
finished factor (O(N^3/B) extra HBM copy traffic) or dispatches O(nb^2)
small matmuls, and every block column pays a separate ~70 us XLA
``cholesky`` + triangular-inverse dispatch chain.  Measured floor on a v5e
at N=8192 f32: ~4.4 ms against a ~1.1 ms matmul-FLOP bound.

This module was built to beat that by fusing the whole factorisation into
ONE ``pallas_call``.  Outcome, measured at N=8192 f32 on v5e (r2):

- ``fused_cholesky`` (2-D grid) 7.2 ms; ``fused_cholesky2`` (1-D
  active-only grid) 7.3 ms — both LOSE to the 4.4 ms XLA-level path.
- Component floors measured in-kernel: bf16 MXU dot rate 170 TF/s (86% of
  the 197 TF/s peak; the correction dots alone are 1.25 ms), HBM->VMEM DMA
  380-660 GB/s, and the in-VMEM diagonal factor+inverse chain ~2.0 ms
  serial (16 x 0.12-0.17 ms at B=512; rank-1 pivot loops are VPU-pass
  bound at ~0.115 us/iteration x N total iterations).
- The decisive experiment: Mosaic does NOT co-issue independent VPU work
  under MXU dots (interleaving a rank-1 loop with big dots costs MORE than
  their sum), so the serial diagonal chain cannot be hidden behind the
  correction matmuls.  Lower bound for any single-kernel design on this
  toolchain: dots 1.1 ms + serial diag 1.9 ms + exposed DMA latency
  >= ~3.2 ms (frac 0.29 of bf16 peak) — within ~25% of what the far
  simpler XLA-level path already achieves.

The factorisation design (kept for when Mosaic gains MXU/VPU overlap):

    for k in columns:                       # grid dim 0 (sequential on TPU)
      for i in row tiles:                   # grid dim 1 (fastest)
        acc    = A[i, k]                    # DMA HBM -> VMEM
        acc   -= sum_j L[i, j] @ L[k, j]^T  # double-buffered DMA + MXU
        i == k: L_kk, L_kk^{-T} in VMEM     # sub-blocked rank-1 + doubling
        i  > k: L[i, k] = acc @ L_kk^{-T}   # TRSM as MXU matmul
        write L[i, k]                       # DMA VMEM -> HBM

so the factor is written to HBM exactly once, the finished panels are
*read* (matmul operands, overlapped with compute) but never re-copied, and
the per-column diagonal work runs entirely in VMEM with no XLA dispatch:

- the (B, B) diagonal factorisation is sub-blocked at 128: a rank-1
  ``fori_loop`` factors each 128-diagonal (iota-masked full-tile VPU ops,
  the pattern of ``pallas_cholesky._chol_kernel``), and the trailing update
  is an MXU matmul;
- the triangular inverse used for the TRSM panels is computed *with* the
  factorisation: each 128-block inverse by nilpotent doubling
  ``(I+M)^{-1} = (I-M)(I+M^2)(I+M^4)...`` (7 MXU matmuls, exact in exact
  arithmetic because ``M^128 = 0``), assembled blockwise via
  ``[[A,0],[B,C]]^{-1} = [[Ai,0],[-Ci B Ai, Ci]]``.

Synchronisation: the TPU grid executes sequentially, so program order gives
issue order; completion is tracked per buffer slot with DMA semaphores.  A
result-write started at grid step ``s`` is waited one step later (before the
slot is reused), and every cross-step read of ``L`` targets blocks written
at least one full column sweep (``>= nb_i`` steps) earlier — strictly after
their writes were waited.

Numerics: f32 in, f32 out, all matmuls with f32 accumulation.  The doubling
inverse is exact for the nilpotent part; against XLA's ``cholesky`` the
factor agrees to f32 roundoff for jittered SPD Gram matrices (tested in
``tests/test_pallas.py::TestFusedCholesky``, interpret mode on CPU).

Reference obligation: this replaces the O(N^3) core the reference delegates
to cola/LAPACK (``src/model.py:450,504``, ``src/objectives.py:76-78``) at
the BASELINE.json N=8192 roofline point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dis_project_tpu.ops.pallas_cholesky import (  # noqa: E402
    _chol_inv_vmem,
    _pad_identity,
)

# Column width (B) and row-tile height (R).  R == B keeps the diagonal
# handling trivial (diag block == first active tile of the column).
DEFAULT_BLOCK = 512
_SUB = 128    # in-VMEM diagonal sub-block
_CHUNK = 4    # finished-column blocks per correction DMA/dot


# ---------------------------------------------------------------------------
# The fused kernel.
# ---------------------------------------------------------------------------


def _fused_kernel(
    nb,
    a_hbm,
    l_hbm,
    lb_hbm,
    lt_hbm,
    acc,
    li,
    lk,
    res,
    resb,
    rest,
    linvt,
    libuf,
    mbuf,
    sem_a,
    sem_li,
    sem_lk,
    sem_w,
    sem_wb,
    sem_wt,
):
    """Grid step (k, i): block (row tile i, column k) of the factor.

    ``l_hbm`` is the authoritative f32 output; ``lb_hbm``/``lt_hbm`` are
    bf16 copies (plain / transposed) that the correction loop reads.  The
    MXU multiplies bf16 operands regardless (single-pass f32 matmuls on
    this toolchain are bf16 products with f32 accumulation), so staging the
    reads in bf16 halves the dominant DMA traffic at zero precision cost,
    and reading ``L[k, :]`` panels from the transposed copy keeps every dot
    a plain (1, 0) contraction (a (1, 1) contraction costs a ~3 us Mosaic
    relayout per dot — measured 4.1 vs 0.8 us at 512^2).
    """
    k = pl.program_id(0)
    i = pl.program_id(1)
    B = acc.shape[1]
    step = k * nb + i
    active = i >= k

    # Wait for the result writes issued last step before reusing the result
    # buffers.  The previous step is (k, i-1), or (k-1, nb-1) when i == 0 —
    # both write all three copies iff they were active, which is always
    # true for (k-1, nb-1) and means i-1 >= k otherwise.
    @pl.when(step >= 1)
    def _():
        pltpu.make_async_copy(res, res, sem_w).wait()

    @pl.when((step >= 1) & ((i == 0) | (i >= k + 1)))
    def _():
        pltpu.make_async_copy(resb, resb, sem_wb).wait()
        pltpu.make_async_copy(rest, rest, sem_wt).wait()

    @pl.when(active)
    def _():
        # A tile for this block.
        a_dma = pltpu.make_async_copy(
            a_hbm.at[pl.ds(i * B, B), pl.ds(k * B, B)], acc, sem_a
        )
        a_dma.start()

        # Correction loop over CHUNK-wide groups of finished columns: one
        # (B, CHUNK*B) x (CHUNK*B, B) MXU dot per group amortises the
        # per-iteration semaphore/DMA-issue overhead 4x and contracts over
        # 2048 for better MXU efficiency.  The last group may overhang past
        # column k; its unwritten rows are masked to zero before the dot.
        W = _CHUNK * B
        nch = pl.cdiv(k, jnp.int32(_CHUNK))

        def read(jc, slot):
            pltpu.make_async_copy(
                lb_hbm.at[pl.ds(i * B, B), pl.ds(jc * W, W)],
                li.at[slot],
                sem_li.at[slot],
            ).start()
            pltpu.make_async_copy(
                lt_hbm.at[pl.ds(jc * W, W), pl.ds(k * B, B)],
                lk.at[slot],
                sem_lk.at[slot],
            ).start()

        @pl.when(nch >= 1)
        def _():
            read(0, 0)

        a_dma.wait()

        rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
        cols_w = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

        def corr_body(jc, carry):
            slot = jax.lax.rem(jc, jnp.asarray(2, jc.dtype))

            @pl.when(jc + 1 < nch)
            def _():
                read(jc + 1, jax.lax.rem(jc + 1, jnp.asarray(2, jc.dtype)))

            pltpu.make_async_copy(li.at[slot], li.at[slot], sem_li.at[slot]).wait()
            pltpu.make_async_copy(lk.at[slot], lk.at[slot], sem_lk.at[slot]).wait()
            valid = (k - jc * _CHUNK) * B  # rows of the chunk inside col k

            # The last chunk can overhang into not-yet-written columns of
            # the factor; zero BOTH overhang operands (unwritten HBM can
            # hold NaN bit patterns, and NaN * 0 = NaN in the contraction).
            liv, lkv = jax.lax.cond(
                valid < W,
                lambda a, b: (
                    jnp.where(cols_w < valid, a, 0).astype(a.dtype),
                    jnp.where(rows_w < valid, b, 0).astype(b.dtype),
                ),
                lambda a, b: (a, b),
                li[slot],
                lk[slot],
            )
            return carry - jnp.dot(liv, lkv, preferred_element_type=carry.dtype)

        C = jax.lax.fori_loop(0, nch, corr_body, acc[:])

        @pl.when(i == k)
        def _():
            _chol_inv_vmem(C, res, libuf, mbuf)
            linvt[:] = libuf[:].T

        @pl.when(i > k)
        def _():
            res[:] = jnp.dot(C, linvt[:], preferred_element_type=C.dtype)

        resb[:] = res[:].astype(resb.dtype)
        rest[:] = resb[:].T
        pltpu.make_async_copy(
            resb, lb_hbm.at[pl.ds(i * B, B), pl.ds(k * B, B)], sem_wb
        ).start()
        pltpu.make_async_copy(
            rest, lt_hbm.at[pl.ds(k * B, B), pl.ds(i * B, B)], sem_wt
        ).start()

    @pl.when(jnp.logical_not(active))
    def _():
        res[:] = jnp.zeros_like(res)

    pltpu.make_async_copy(
        res, l_hbm.at[pl.ds(i * B, B), pl.ds(k * B, B)], sem_w
    ).start()

    # Drain the final writes on the last grid step (always active).
    @pl.when((k == nb - 1) & (i == nb - 1))
    def _():
        pltpu.make_async_copy(res, res, sem_w).wait()
        pltpu.make_async_copy(resb, resb, sem_wb).wait()
        pltpu.make_async_copy(rest, rest, sem_wt).wait()


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def fused_cholesky(a, *, block: int = DEFAULT_BLOCK, interpret: bool = False):
    """Lower Cholesky factor via the single fused Pallas kernel.

    f32 only (the f64 parity oracle uses the XLA path). Non-multiples of
    ``block`` are padded with an identity tail and sliced back.
    """
    n = a.shape[0]
    if a.dtype != jnp.float32:
        raise ValueError(f"fused_cholesky is f32-only, got {a.dtype}")
    # Pad to a multiple of block * _CHUNK so chunked panel reads (which may
    # overhang up to _CHUNK - 1 blocks past column k) stay in bounds.
    quantum = block * _CHUNK
    npad = -(-n // quantum) * quantum
    nb = npad // block
    if n <= block:
        from dis_project_tpu.ops.pallas_cholesky import blocked_cholesky

        return blocked_cholesky(a)
    A = _pad_identity(a, npad) if npad != n else a

    B = block
    out, _, _ = pl.pallas_call(
        functools.partial(_fused_kernel, nb),
        grid=(nb, nb),
        out_shape=(
            jax.ShapeDtypeStruct((npad, npad), jnp.float32),   # L
            jax.ShapeDtypeStruct((npad, npad), jnp.bfloat16),  # bf16 copy
            jax.ShapeDtypeStruct((npad, npad), jnp.bfloat16),  # bf16 L^T
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, B), jnp.float32),                  # acc
            pltpu.VMEM((2, B, _CHUNK * B), jnp.bfloat16),     # li
            pltpu.VMEM((2, _CHUNK * B, B), jnp.bfloat16),     # lk (transposed)
            pltpu.VMEM((B, B), jnp.float32),      # res
            pltpu.VMEM((B, B), jnp.bfloat16),     # resb
            pltpu.VMEM((B, B), jnp.bfloat16),     # rest
            pltpu.VMEM((B, B), jnp.float32),      # linvt (persists per column)
            pltpu.VMEM((B, B), jnp.float32),      # libuf
            pltpu.VMEM((B, B), jnp.float32),      # mbuf
            pltpu.SemaphoreType.DMA(()),          # sem_a
            pltpu.SemaphoreType.DMA((2,)),        # sem_li
            pltpu.SemaphoreType.DMA((2,)),        # sem_lk
            pltpu.SemaphoreType.DMA(()),          # sem_w
            pltpu.SemaphoreType.DMA(()),          # sem_wb
            pltpu.SemaphoreType.DMA(()),          # sem_wt
        ],
        cost_estimate=pl.CostEstimate(
            flops=npad**3 // 3,
            bytes_accessed=4 * npad * npad * 2,
            transcendentals=npad,
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Buffers total ~15 MiB + compiler temps: raise the default
            # 16 MiB scoped-vmem cap (v5e has headroom above it).
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(A)
    return out[:n, :n] if npad != n else out


# ---------------------------------------------------------------------------
# v2: 1-D active-only grid (scalar-prefetched block coordinates).
# ---------------------------------------------------------------------------


def _fused_kernel2(
    nb,
    chunk,
    kidx_ref,
    iidx_ref,
    a_hbm,
    l_hbm,
    lb_hbm,
    lt_hbm,
    acc,
    li,
    lk,
    res,
    resb,
    rest,
    zeros,
    linvt,
    libuf,
    mbuf,
    sem_a,
    sem_li,
    sem_lk,
    sem_w,
    sem_wb,
    sem_wt,
    sem_z,
):
    """Grid step ``s`` handles active block ``(k, i) = tables[s]`` directly.

    Differences from ``_fused_kernel``: the grid enumerates ONLY the
    nb(nb+1)/2 lower-triangle blocks (no wasted steps, no zero-block
    dispatches); the strict upper triangle is cleared by an overlapped
    mirror DMA from a zeroed VMEM buffer (step (k, i>k) also zeroes block
    (k, i)); and correction reads start only after the previous step's
    factor writes are waited (the first read of a new column targets the
    block written one step earlier).
    """
    s = pl.program_id(0)
    k = kidx_ref[s]
    i = iidx_ref[s]
    B = acc.shape[1]

    @pl.when(s == 0)
    def _():
        zeros[:] = jnp.zeros_like(zeros)

    # A tile for this block (input-only: safe to start before any waits).
    a_dma = pltpu.make_async_copy(
        a_hbm.at[pl.ds(i * B, B), pl.ds(k * B, B)], acc, sem_a
    )
    a_dma.start()

    # Wait the result/mirror writes issued by the previous step before the
    # buffers are reused *and* before issuing reads that may target the
    # just-written factor blocks.
    @pl.when(s >= 1)
    def _():
        pltpu.make_async_copy(res, res, sem_w).wait()
        pltpu.make_async_copy(resb, resb, sem_wb).wait()
        pltpu.make_async_copy(rest, rest, sem_wt).wait()

    @pl.when((s >= 1) & (iidx_ref[jnp.maximum(s - 1, 0)] > kidx_ref[jnp.maximum(s - 1, 0)]))
    def _():
        pltpu.make_async_copy(zeros, zeros, sem_z).wait()

    W = chunk * B
    nch = pl.cdiv(k, jnp.int32(chunk))

    def read(jc, slot):
        pltpu.make_async_copy(
            lb_hbm.at[pl.ds(i * B, B), pl.ds(jc * W, W)],
            li.at[slot],
            sem_li.at[slot],
        ).start()
        pltpu.make_async_copy(
            lt_hbm.at[pl.ds(jc * W, W), pl.ds(k * B, B)],
            lk.at[slot],
            sem_lk.at[slot],
        ).start()

    @pl.when(nch >= 1)
    def _():
        read(0, 0)

    a_dma.wait()

    rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    cols_w = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    def corr_body(jc, carry):
        slot = jax.lax.rem(jc, jnp.asarray(2, jc.dtype))

        @pl.when(jc + 1 < nch)
        def _():
            read(jc + 1, jax.lax.rem(jc + 1, jnp.asarray(2, jc.dtype)))

        pltpu.make_async_copy(li.at[slot], li.at[slot], sem_li.at[slot]).wait()
        pltpu.make_async_copy(lk.at[slot], lk.at[slot], sem_lk.at[slot]).wait()
        valid = (k - jc * chunk) * B  # rows of the chunk inside column k

        # The last chunk can overhang into not-yet-written columns; zero
        # BOTH overhang operands (unwritten HBM can hold NaNs).
        liv, lkv = jax.lax.cond(
            valid < W,
            lambda a, b: (
                jnp.where(cols_w < valid, a, 0).astype(a.dtype),
                jnp.where(rows_w < valid, b, 0).astype(b.dtype),
            ),
            lambda a, b: (a, b),
            li[slot],
            lk[slot],
        )
        return carry - jnp.dot(liv, lkv, preferred_element_type=carry.dtype)

    C = jax.lax.fori_loop(0, nch, corr_body, acc[:])

    @pl.when(i == k)
    def _():
        _chol_inv_vmem(C, res, libuf, mbuf)
        linvt[:] = libuf[:].T

    @pl.when(i > k)
    def _():
        res[:] = jnp.dot(C, linvt[:], preferred_element_type=C.dtype)
        # Mirror block (k, i) of the strict upper triangle <- 0.
        pltpu.make_async_copy(
            zeros, l_hbm.at[pl.ds(k * B, B), pl.ds(i * B, B)], sem_z
        ).start()

    resb[:] = res[:].astype(resb.dtype)
    rest[:] = resb[:].T
    pltpu.make_async_copy(
        res, l_hbm.at[pl.ds(i * B, B), pl.ds(k * B, B)], sem_w
    ).start()
    pltpu.make_async_copy(
        resb, lb_hbm.at[pl.ds(i * B, B), pl.ds(k * B, B)], sem_wb
    ).start()
    pltpu.make_async_copy(
        rest, lt_hbm.at[pl.ds(k * B, B), pl.ds(i * B, B)], sem_wt
    ).start()

    # Drain the final writes on the last grid step (the (nb-1, nb-1) diag,
    # which never issues a mirror write; the previous step's mirror was
    # waited above).
    @pl.when(s == (nb * (nb + 1)) // 2 - 1)
    def _():
        pltpu.make_async_copy(res, res, sem_w).wait()
        pltpu.make_async_copy(resb, resb, sem_wb).wait()
        pltpu.make_async_copy(rest, rest, sem_wt).wait()


DEFAULT_BLOCK2 = 1024
_CHUNK2 = 2


@functools.partial(jax.jit, static_argnames=("block", "chunk", "interpret"))
def fused_cholesky2(
    a, *, block: int = DEFAULT_BLOCK2, chunk: int = _CHUNK2, interpret: bool = False
):
    """Lower Cholesky factor via the active-only 1-D grid fused kernel."""
    n = a.shape[0]
    if a.dtype != jnp.float32:
        raise ValueError(f"fused_cholesky2 is f32-only, got {a.dtype}")
    quantum = block * chunk
    npad = -(-n // quantum) * quantum
    nb = npad // block
    if n <= block:
        from dis_project_tpu.ops.pallas_cholesky import blocked_cholesky

        return blocked_cholesky(a)
    A = _pad_identity(a, npad) if npad != n else a

    B = block
    nact = nb * (nb + 1) // 2
    kidx = jnp.asarray(
        [k for k in range(nb) for _ in range(k, nb)], dtype=jnp.int32
    )
    iidx = jnp.asarray(
        [i for k in range(nb) for i in range(k, nb)], dtype=jnp.int32
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nact,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, B), jnp.float32),                 # acc
            pltpu.VMEM((2, B, chunk * B), jnp.bfloat16),     # li
            pltpu.VMEM((2, chunk * B, B), jnp.bfloat16),     # lk
            pltpu.VMEM((B, B), jnp.float32),                 # res
            pltpu.VMEM((B, B), jnp.bfloat16),                # resb
            pltpu.VMEM((B, B), jnp.bfloat16),                # rest
            pltpu.VMEM((B, B), jnp.float32),                 # zeros
            pltpu.VMEM((B, B), jnp.float32),                 # linvt
            pltpu.VMEM((B, B), jnp.float32),                 # libuf
            pltpu.VMEM((B, B), jnp.float32),                 # mbuf
            pltpu.SemaphoreType.DMA(()),                     # sem_a
            pltpu.SemaphoreType.DMA((2,)),                   # sem_li
            pltpu.SemaphoreType.DMA((2,)),                   # sem_lk
            pltpu.SemaphoreType.DMA(()),                     # sem_w
            pltpu.SemaphoreType.DMA(()),                     # sem_wb
            pltpu.SemaphoreType.DMA(()),                     # sem_wt
            pltpu.SemaphoreType.DMA(()),                     # sem_z
        ],
    )
    out, _, _ = pl.pallas_call(
        functools.partial(_fused_kernel2, nb, chunk),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((npad, npad), jnp.float32),   # L
            jax.ShapeDtypeStruct((npad, npad), jnp.bfloat16),  # bf16 copy
            jax.ShapeDtypeStruct((npad, npad), jnp.bfloat16),  # bf16 L^T
        ),
        cost_estimate=pl.CostEstimate(
            flops=npad**3 // 3,
            bytes_accessed=4 * npad * npad * 2,
            transcendentals=npad,
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kidx, iidx, A)
    return out[:n, :n] if npad != n else out
