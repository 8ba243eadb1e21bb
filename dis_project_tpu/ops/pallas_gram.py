r"""Fused Pallas TPU Gram-matrix kernel for the SIMM LFM covariance.

The reference materialises the Gram matrix by dispatching a *scalar* kernel
per input pair through a nested ``vmap`` (reference ``src/model.py:392``)
with flag-product branch switches (``src/model.py:183-193``). Here the same
algebra — the erf/exp ``h``-term expressions of ``ops.lfm_kernels`` — is
generated tile-by-tile directly from per-row metadata ``(t, decay, sens,
flag)`` on the VPU:

- each grid step reads O(TM + TN) metadata and writes one (TM, TN) output
  tile, so HBM traffic is the write-only minimum — the kernel is
  transcendental-bound, not bandwidth-bound;
- ``erf`` does not lower in Pallas TPU (no Mosaic primitive), so the kernel
  uses the Abramowitz & Stegun 7.1.26 rational approximation (max abs error
  1.5e-7 — at the f32 ulp) through the *same* ``lfm_kernels`` block algebra
  via its ``erf_fn`` hook, keeping one source of truth for the math;
- the four flag branches (xx / ff / xf / fx) are selected at **trace time**
  by ``kind`` when the caller knows the row population (training rows are
  all gene-expression, latent-force grids are all force rows), avoiding the
  reference's evaluate-all-branches-per-pair cost; ``kind='mixed'`` keeps
  the fully general flag-weighted combination.

Padding: inputs are padded to tile multiples with benign metadata
(t=0, d=1, s=0, flag=1) so padded entries are finite (they evaluate k_xx
with zero sensitivity = 0.0) and then sliced off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dis_project_tpu.ops import lfm_kernels as lfk

# Default tile: 256x256 f32 = 256 KiB output tile in VMEM, VPU-aligned.
TILE_M = 256
TILE_N = 256

# Abramowitz & Stegun 7.1.26 coefficients.
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def erf_approx(x):
    """Vectorised erf via A&S 7.1.26 (max abs err 1.5e-7; f32-exact for
    practical purposes). Lowers on the TPU VPU — used inside Pallas kernels
    where the XLA ``erf`` primitive is unavailable."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + _AS_P * a)
    a1, a2, a3, a4, a5 = _AS_A
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.sign(x) * y


def _tile_values(kind, t1, d1, s1, f1, t2, d2, s2, f2, ell):
    """Covariance values for one (TM, TN) tile given broadcast metadata."""
    if kind == "xx":
        return lfk.k_xx(t1, t2, d1, d2, s1, s2, ell, erf_fn=erf_approx)
    if kind == "ff":
        return lfk.k_ff(t1, t2, ell)
    if kind == "xf":
        return lfk.k_xf(t1, t2, d1, s1, ell, erf_fn=erf_approx)
    if kind == "fx":
        return lfk.k_xf(t2, t1, d2, s2, ell, erf_fn=erf_approx)
    # Fully general: flag-weighted combination (reference src/model.py:183-193).
    kxx = lfk.k_xx(t1, t2, d1, d2, s1, s2, ell, erf_fn=erf_approx)
    kff = lfk.k_ff(t1, t2, ell)
    kxf = lfk.k_xf(t1, t2, d1, s1, ell, erf_fn=erf_approx)
    kfx = lfk.k_xf(t2, t1, d2, s2, ell, erf_fn=erf_approx)
    w_xx = f1 * f2
    w_ff = (1.0 - f1) * (1.0 - f2)
    w_xf = f1 * (1.0 - f2)
    w_fx = (1.0 - f1) * f2
    return w_xx * kxx + w_ff * kff + w_xf * kxf + w_fx * kfx


def _gram_kernel(kind, m1_ref, m2_ref, ell_ref, o_ref):
    """One (TM, TN) tile. ``m1_ref``: (4, TM) row metadata [t, d, s, flag];
    ``m2_ref``: (4, TN) column metadata; ``ell_ref``: (1, 1) SMEM scalar."""
    ell = ell_ref[0, 0]
    t1 = m1_ref[0, :][:, None]
    d1 = m1_ref[1, :][:, None]
    s1 = m1_ref[2, :][:, None]
    f1 = m1_ref[3, :][:, None]
    t2 = m2_ref[0, :][None, :]
    d2 = m2_ref[1, :][None, :]
    s2 = m2_ref[2, :][None, :]
    f2 = m2_ref[3, :][None, :]
    o_ref[:] = _tile_values(kind, t1, d1, s1, f1, t2, d2, s2, f2, ell)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _pack_meta(x, decay, sens, pad_to, dtype):
    """(N, 3) row metadata -> padded (4, Np) [t, d, s, flag] array.

    Gene indices are clipped to [0, G-1] before the gather — the same
    clamp-gather semantics as ``ops.gram`` (see its module docstring).
    Padding rows get benign values (t=0, d=1, s=0, flag=1) -> zero entries.
    """
    G = decay.shape[0]
    n = x.shape[0]
    g = jnp.clip(x[:, 1].astype(jnp.int32), 0, G - 1)
    t = x[:, 0].astype(dtype)
    d = decay[g].astype(dtype)
    s = sens[g].astype(dtype)
    f = x[:, 2].astype(dtype)
    pad = pad_to - n
    t = jnp.pad(t, (0, pad))
    d = jnp.pad(d, (0, pad), constant_values=1.0)
    s = jnp.pad(s, (0, pad))
    f = jnp.pad(f, (0, pad), constant_values=1.0)
    return jnp.stack([t, d, s, f])


@functools.partial(
    jax.jit,
    static_argnames=("kind", "tile_m", "tile_n", "interpret", "out_dtype"),
)
def _cross_covariance_fwd_impl(
    x1,
    x2,
    decay,
    sens,
    lengthscale,
    *,
    kind: str = "mixed",
    tile_m: int = TILE_M,
    tile_n: int = TILE_N,
    interpret: bool = False,
    out_dtype=None,
):
    """Pallas forward evaluation (no autodiff rule of its own)."""
    n, m = x1.shape[0], x2.shape[0]
    dtype = out_dtype or jnp.result_type(x1.dtype, decay.dtype)
    np_, mp_ = _round_up(n, tile_m), _round_up(m, tile_n)

    m1 = _pack_meta(x1, decay, sens, np_, dtype)
    m2 = _pack_meta(x2, decay, sens, mp_, dtype)
    ell = jnp.asarray(lengthscale, dtype).reshape(1, 1)

    grid = (np_ // tile_m, mp_ // tile_n)
    # ~60 flops and ~14 transcendentals (6 erf -> exp each, 4 bare exp) per
    # output element in the mixed case — tells the scheduler this kernel is
    # compute-heavy despite its tiny inputs.
    cost = pl.CostEstimate(
        flops=60 * np_ * mp_,
        bytes_accessed=np_ * mp_ * jnp.dtype(dtype).itemsize,
        transcendentals=14 * np_ * mp_,
    )
    out = pl.pallas_call(
        functools.partial(_gram_kernel, kind),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, tile_m), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(m1, m2, ell)
    return out[:n, :m]


@functools.lru_cache(maxsize=None)
def _ccov_batchable(kind: str, tile_m: int, tile_n: int, interpret: bool):
    """Pallas forward with a PUBLIC vmap fallback (``jax.custom_batching``).

    ``pallas_call`` with manual-DMA outputs has no working vmap lowering on
    TPU, so batched callers (ensemble fits, vmapped HMC chains) must take
    the XLA closed forms instead.  r2 routed this with a trace-time
    ``BatchTracer`` isinstance sniff on ``jax._src`` internals, which (a)
    depended on private API and (b) could not see ``vmap(jit(f))``.  A
    ``custom_vmap`` batch rule fixes both *by construction*: vmap — at any
    nesting, including through jit — rewrites this call to the vmapped
    closed-form build, and unbatched calls lower the Pallas kernel
    untouched.  (Verified composable with the surrounding ``custom_vjp``
    and with ``vmap(jit(f))`` / ``vmap(grad(f))`` in
    ``tests/test_pallas.py::TestBatchedDispatch``.)
    """

    @jax.custom_batching.custom_vmap
    def fn(x1, x2, decay, sens, lengthscale):
        return _cross_covariance_fwd_impl(
            x1, x2, decay, sens, lengthscale,
            kind=kind, tile_m=tile_m, tile_n=tile_n, interpret=interpret,
        )

    @fn.def_vmap
    def _rule(axis_size, in_batched, x1, x2, decay, sens, lengthscale):
        from dis_project_tpu.ops import gram as gram_ops

        in_axes = [0 if b else None for b in in_batched]
        out = jax.vmap(
            lambda x1, x2, d, s, l: gram_ops.cross_covariance_kind(
                x1, x2, d, s, l, kind
            ),
            in_axes=in_axes,
        )(x1, x2, decay, sens, lengthscale)
        return out, True

    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _cross_covariance_diffable(
    x1, x2, decay, sens, lengthscale, kind, tile_m, tile_n, interpret
):
    return _ccov_batchable(kind, tile_m, tile_n, interpret)(
        x1, x2, decay, sens, lengthscale
    )


def _ccov_fwd(x1, x2, decay, sens, lengthscale, kind, tile_m, tile_n, interpret):
    out = _ccov_batchable(kind, tile_m, tile_n, interpret)(
        x1, x2, decay, sens, lengthscale
    )
    return out, (x1, x2, decay, sens, lengthscale)


def _ccov_bwd(kind, tile_m, tile_n, interpret, res, g):
    # pallas_call has no autodiff rule; the backward pass differentiates
    # the XLA-fused closed-form implementation instead (identical math to
    # float tolerance — verified in tests/test_pallas.py). Forward keeps
    # the hand-tiled kernel, backward costs one fused elementwise VJP —
    # branch-specialised by ``kind`` (a declared population differentiates
    # only its own closed form: ~4x less transcendental work than the
    # 4-branch mixed combination; flag columns carry no gradient then,
    # see ``ops.gram.cross_covariance_kind``).
    from dis_project_tpu.ops import gram as gram_ops

    x1, x2, decay, sens, lengthscale = res
    _, vjp = jax.vjp(
        lambda x1, x2, d, s, l: gram_ops.cross_covariance_kind(
            x1, x2, d, s, l, kind
        ),
        x1, x2, decay, sens, lengthscale,
    )
    return vjp(g.astype(decay.dtype))


_cross_covariance_diffable.defvjp(_ccov_fwd, _ccov_bwd)


def cross_covariance(
    x1,
    x2,
    decay,
    sens,
    lengthscale,
    *,
    kind: str = "mixed",
    tile_m: int = TILE_M,
    tile_n: int = TILE_N,
    interpret: bool = False,
):
    """Dense (N, M) SIMM covariance from (t, gene, flag) rows, Pallas-fused
    and **differentiable** (custom VJP routes the backward pass through the
    XLA closed forms, since ``pallas_call`` carries no autodiff rule).

    Same semantics as :func:`dis_project_tpu.ops.gram.cross_covariance`
    (reference ``src/model.py:372-394``); ``kind`` specialises the branch at
    trace time when the row population is known statically:

    - ``'xx'``: all rows/cols are gene-expression rows (training Gram),
    - ``'ff'``: all are latent-force rows (prediction-grid prior),
    - ``'xf'`` / ``'fx'``: expression rows x force cols / vice versa,
    - ``'mixed'``: general flag-dispatched combination.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU tests).
    """
    return _cross_covariance_diffable(
        x1, x2, decay, sens, lengthscale, kind, tile_m, tile_n, interpret
    )


def gram(x, decay, sens, lengthscale, **kw):
    """Symmetric (N, N) Gram over one row set (Pallas-fused)."""
    return cross_covariance(x, x, decay, sens, lengthscale, **kw)


# ---------------------------------------------------------------------------
# Symmetric Gram: lower-triangle tiles only, mirrored by DMA.
# ---------------------------------------------------------------------------


def _gram_sym_kernel(
    kind, nsteps, i_arr, j_arr, m_ref, ell_ref, out_hbm,
    res, rest, sem_w, sem_wt,
):
    """One lower-triangle tile per grid step.

    Step ``s`` computes tile ``(i, j) = (i_arr[s], j_arr[s])`` (``j <= i``)
    into the VMEM slot ``s % 2``, DMA-writes it to ``out[i, j]`` and — for
    off-diagonal tiles — its in-VMEM transpose to ``out[j, i]``.  Each
    output block is written exactly once, and the covariance values are
    computed once per *unordered* pair: half the transcendental work of the
    dense kernel (the whole cost, since this kernel is VPU-bound).

    Double buffering: the writes issued at step ``s`` are waited at step
    ``s + 2`` (before slot reuse) and drained at the final step.  The
    metadata block (all rows) stays resident in VMEM; ``i``/``j`` only
    select slices, so no per-step input DMA beyond the tiny index stream.
    """
    s = pl.program_id(0)
    T = res.shape[1]
    slot = jax.lax.rem(s, jnp.asarray(2, s.dtype))
    i = i_arr[s]
    j = j_arr[s]

    # Reclaim this slot's buffers from the write issued two steps ago.
    @pl.when(s >= 2)
    def _():
        pltpu.make_async_copy(res.at[slot], res.at[slot], sem_w.at[slot]).wait()

    @pl.when((s >= 2) & (i_arr[s - 2] != j_arr[s - 2]))
    def _():
        pltpu.make_async_copy(rest.at[slot], rest.at[slot], sem_wt.at[slot]).wait()

    ell = ell_ref[0, 0]
    m1 = m_ref[:, pl.ds(i * T, T)]
    m2 = m_ref[:, pl.ds(j * T, T)]
    t1, d1, s1, f1 = (m1[r, :][:, None] for r in range(4))
    t2, d2, s2, f2 = (m2[r, :][None, :] for r in range(4))
    res[slot] = _tile_values(kind, t1, d1, s1, f1, t2, d2, s2, f2, ell)
    pltpu.make_async_copy(
        res.at[slot], out_hbm.at[pl.ds(i * T, T), pl.ds(j * T, T)], sem_w.at[slot]
    ).start()

    @pl.when(i != j)
    def _():
        rest[slot] = res[slot].T
        pltpu.make_async_copy(
            rest.at[slot], out_hbm.at[pl.ds(j * T, T), pl.ds(i * T, T)],
            sem_wt.at[slot],
        ).start()

    # Drain: the final step waits its own writes and the previous step's.
    @pl.when(s == nsteps - 1)
    def _():
        pltpu.make_async_copy(res.at[slot], res.at[slot], sem_w.at[slot]).wait()

        @pl.when(i != j)
        def _():
            pltpu.make_async_copy(
                rest.at[slot], rest.at[slot], sem_wt.at[slot]
            ).wait()

        prev = 1 - slot

        @pl.when(s >= 1)
        def _():
            pltpu.make_async_copy(res.at[prev], res.at[prev], sem_w.at[prev]).wait()

        @pl.when((s >= 1) & (i_arr[s - 1] != j_arr[s - 1]))
        def _():
            pltpu.make_async_copy(
                rest.at[prev], rest.at[prev], sem_wt.at[prev]
            ).wait()


@functools.partial(
    jax.jit, static_argnames=("kind", "tile", "interpret", "out_dtype")
)
def _gram_sym_impl(
    x,
    decay,
    sens,
    lengthscale,
    *,
    kind: str = "mixed",
    tile: int = TILE_M,
    interpret: bool = False,
    out_dtype=None,
):
    """Pallas symmetric-Gram forward (no autodiff rule of its own)."""
    import numpy as np

    n = x.shape[0]
    dtype = out_dtype or jnp.result_type(x.dtype, decay.dtype)
    np_ = _round_up(n, tile)
    nt = np_ // tile

    meta = _pack_meta(x, decay, sens, np_, dtype)
    ell = jnp.asarray(lengthscale, dtype).reshape(1, 1)

    # np.tril_indices is already row-major over the lower triangle — the
    # order the kernel's slot-reuse waits assume.
    ii, jj = np.tril_indices(nt)
    i_arr = jnp.asarray(ii, jnp.int32)
    j_arr = jnp.asarray(jj, jnp.int32)
    nsteps = int(i_arr.shape[0])

    cost = pl.CostEstimate(
        flops=60 * np_ * np_ // 2,
        bytes_accessed=np_ * np_ * jnp.dtype(dtype).itemsize,
        transcendentals=14 * np_ * np_ // 2,
    )
    out = pl.pallas_call(
        functools.partial(_gram_sym_kernel, kind, nsteps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # metadata, resident
                pl.BlockSpec(memory_space=pltpu.SMEM),  # lengthscale scalar
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, tile, tile), dtype),
                pltpu.VMEM((2, tile, tile), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((np_, np_), dtype),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(i_arr, j_arr, meta, ell.reshape(1, 1))
    return out[:n, :n]


@functools.lru_cache(maxsize=None)
def _gram_sym_batchable(kind: str, tile: int, interpret: bool):
    """Symmetric-Gram forward with a PUBLIC vmap fallback — see
    :func:`_ccov_batchable` (this is the kernel whose manual-DMA ``ANY``
    output crashed vmapped ensemble fits in r2)."""

    @jax.custom_batching.custom_vmap
    def fn(x, decay, sens, lengthscale):
        return _gram_sym_impl(
            x, decay, sens, lengthscale, kind=kind, tile=tile,
            interpret=interpret,
        )

    @fn.def_vmap
    def _rule(axis_size, in_batched, x, decay, sens, lengthscale):
        from dis_project_tpu.ops import gram as gram_ops

        in_axes = [0 if b else None for b in in_batched]
        out = jax.vmap(
            lambda x, d, s, l: gram_ops.cross_covariance_kind(
                x, x, d, s, l, kind
            ),
            in_axes=in_axes,
        )(x, decay, sens, lengthscale)
        return out, True

    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gram_sym_diffable(x, decay, sens, lengthscale, kind, tile, interpret):
    return _gram_sym_batchable(kind, tile, interpret)(
        x, decay, sens, lengthscale
    )


def _gram_sym_fwd(x, decay, sens, lengthscale, kind, tile, interpret):
    out = _gram_sym_batchable(kind, tile, interpret)(
        x, decay, sens, lengthscale
    )
    return out, (x, decay, sens, lengthscale)


def _gram_sym_bwd(kind, tile, interpret, res, g):
    # Backward through the XLA-fused closed forms (pallas_call has no AD
    # rule) — same route as the rectangular kernel's ``_ccov_bwd``,
    # branch-specialised by ``kind``.
    from dis_project_tpu.ops import gram as gram_ops

    x, decay, sens, lengthscale = res
    _, vjp = jax.vjp(
        lambda x, d, s, l: gram_ops.cross_covariance_kind(x, x, d, s, l, kind),
        x, decay, sens, lengthscale,
    )
    return vjp(g.astype(decay.dtype))


_gram_sym_diffable.defvjp(_gram_sym_fwd, _gram_sym_bwd)


def gram_sym(
    x,
    decay,
    sens,
    lengthscale,
    *,
    kind: str = "mixed",
    tile: int = TILE_M,
    interpret: bool = False,
):
    """Symmetric (N, N) SIMM Gram computed over lower-triangle tiles only.

    Exploits K(a, b) = K(b, a) (a covariance — symmetric for every flag
    population, including ``'mixed'``): each off-diagonal tile is evaluated
    once and mirrored by an in-VMEM transpose + second DMA write, halving
    the erf/exp transcendental work that bounds the dense kernel
    (VERDICT r1 item 2b).  Differentiable via the same XLA-closed-form VJP
    as :func:`cross_covariance`.  Semantics match
    ``ops.gram.gram`` / reference ``src/model.py:396-414``.
    """
    return _gram_sym_diffable(x, decay, sens, lengthscale, kind, tile, interpret)
