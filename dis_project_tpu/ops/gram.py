"""Dense Gram / cross-covariance assembly from (t, gene, flag) row metadata.

The reference encodes every input point as a 3-vector ``(time, gene_index,
flag)`` with flag 1 = gene expression and flag 0 = latent force
(``src/dataset.py:358-399``), dispatches a *scalar* kernel per pair through
flag-product switches, and lifts it with a nested ``vmap``
(``src/model.py:152-195, 372-394``). That shape is hostile to TPUs: it
evaluates all four kernel branches per scalar pair and prevents blocked
vectorisation.

Here the same semantics are computed as one fused elementwise program over
the full (N, M) pair grid: per-row parameter gathers, all four branch values
evaluated *vectorised* on the VPU, combined with the same multiplicative flag
switches. XLA fuses the entire build into a single kernel; ``pallas_gram``
provides the hand-tiled variant of the identical algebra for the hot path.

Gather semantics: gene indices are clipped to [0, G-1] before the gather.
This reproduces the reference's out-of-bounds behavior for *positive*
overflow — JAX gathers clamp, which is load-bearing for the reference's
1-based gene-expression test grids (``src/utils.py:92`` indexes genes 1..G
into length-G parameter arrays; see SURVEY.md §2 #17) — while keeping the
masked-out force rows (gene index -1) in-bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dis_project_tpu.ops import lfm_kernels as lfk


def split_rows(x):
    """Split an (N, 3) row-metadata array into (t, gene_idx, flag)."""
    t = x[:, 0]
    g = x[:, 1].astype(jnp.int32)
    f = x[:, 2].astype(x.dtype)
    return t, g, f


def cross_covariance(x1, x2, decay, sens, lengthscale):
    """Dense (N, M) covariance between two sets of (t, gene, flag) rows.

    Semantics match reference ``ExactLFM.cross_covariance``
    (``src/model.py:372-394``) including the flag-switch dispatch of
    ``src/model.py:183-193``, but evaluated as four vectorised block
    formulas over the pair grid instead of a scalar kernel per pair.
    """
    G = decay.shape[0]
    t1, g1, f1 = split_rows(x1)
    t2, g2, f2 = split_rows(x2)

    g1 = jnp.clip(g1, 0, G - 1)
    g2 = jnp.clip(g2, 0, G - 1)

    d1, s1 = decay[g1], sens[g1]
    d2, s2 = decay[g2], sens[g2]

    # Pairwise broadcast: rows index 1, cols index 2.
    T1, T2 = t1[:, None], t2[None, :]
    D1, D2 = d1[:, None], d2[None, :]
    S1, S2 = s1[:, None], s2[None, :]
    F1, F2 = f1[:, None], f2[None, :]

    kxx = lfk.k_xx(T1, T2, D1, D2, S1, S2, lengthscale)
    kff = lfk.k_ff(T1, T2, lengthscale)
    # Row is the gene, column is the force (and the transpose case).
    kxf = lfk.k_xf(T1, T2, D1, S1, lengthscale)
    kfx = lfk.k_xf(T2, T1, D2, S2, lengthscale)

    w_xx = F1 * F2
    w_ff = (1.0 - F1) * (1.0 - F2)
    w_xf = F1 * (1.0 - F2)
    w_fx = (1.0 - F1) * F2

    return w_xx * kxx + w_ff * kff + w_xf * kxf + w_fx * kfx


def gram(x, decay, sens, lengthscale):
    """Symmetric (N, N) Gram matrix over one set of rows."""
    return cross_covariance(x, x, decay, sens, lengthscale)


def cross_covariance_kind(x1, x2, decay, sens, lengthscale, kind="mixed"):
    """Branch-specialised dense covariance.

    When the row population is statically known (``kind`` in
    ``{'xx','ff','xf','fx'}`` — the same trace-time contract as
    ``pallas_gram.cross_covariance``), only that branch's closed form is
    evaluated: ~4x less transcendental work than the flag-weighted
    combination, which matters most in the *backward* pass where this
    function is the AD route for the Pallas kernels.

    Semantics: identical values to :func:`cross_covariance` whenever the
    flags actually match the declared kind.  The flag columns are treated
    as static labels under a declared kind — they carry no gradient
    (flags are population markers from ``dataset_3d``, never trainable;
    reference ``src/dataset.py:384-391``).
    """
    if kind == "mixed":
        return cross_covariance(x1, x2, decay, sens, lengthscale)
    G = decay.shape[0]
    t1, g1, _ = split_rows(x1)
    t2, g2, _ = split_rows(x2)
    T1, T2 = t1[:, None], t2[None, :]
    if kind == "ff":
        return lfk.k_ff(T1, T2, lengthscale)
    g1 = jnp.clip(g1, 0, G - 1)
    g2 = jnp.clip(g2, 0, G - 1)
    d1, s1 = decay[g1][:, None], sens[g1][:, None]
    d2, s2 = decay[g2][None, :], sens[g2][None, :]
    if kind == "xx":
        return lfk.k_xx(T1, T2, d1, d2, s1, s2, lengthscale)
    if kind == "xf":
        return lfk.k_xf(T1, T2, d1, s1, lengthscale)
    if kind == "fx":
        return lfk.k_xf(T2, T1, d2, s2, lengthscale)
    raise ValueError(f"unknown kind {kind!r}")


def is_uniform_grid(t) -> bool:
    """True when a concrete time grid is uniformly spaced — the SINGLE
    spacing predicate shared by the table-Gram guard and callers that
    choose between the gridded and row paths (``trainer.fit``); sharing it
    keeps the fallback decision and the op's hard guard from diverging
    (r2 review finding: two hand-rolled checks with different tolerances
    meant a near-uniform grid could pass the caller's check and then
    crash inside the op instead of falling back).

    Tracers return True (spacing cannot be inspected at trace time — the
    op's guard documents that jitted-timepoint callers own the check).
    Tolerance scales with the dtype: an f32 linspace grid is uniform only
    to ~|t|*eps per diff (7e-7 at t_max=12), which a fixed rtol=1e-6 on
    the ~0.06 spacing falsely rejected (r2 bug: the dense10k preset's own
    grid failed the check).  Truly irregular grids differ at the percent
    level and are still caught.
    """
    if isinstance(t, jax.core.Tracer):
        return True
    import numpy as np

    t_host = np.asarray(t)
    diffs = np.diff(t_host)
    if not diffs.size:
        return True
    if not np.issubdtype(t_host.dtype, np.inexact):
        # Integer grids: exact spacing comparison (np.finfo would raise).
        return bool(np.all(diffs == diffs[0]))
    tol = 32 * np.finfo(t_host.dtype).eps * max(1.0, float(np.abs(t_host).max()))
    return bool(np.allclose(diffs, diffs[0], rtol=0.0, atol=tol))


def _check_uniform_grid(t):
    """Host-side uniform-spacing guard shared by the table Grams: raises
    ``ValueError`` on a concrete irregular grid, passes tracers."""
    if not is_uniform_grid(t):
        raise ValueError(
            "the table Gram requires a UNIFORM time grid (its "
            "delta table is indexed by row-col index difference); got "
            "irregular spacing. Use ops.lfm_kernels.k_xx_block / "
            "ops.gram.gram for shared-but-irregular grids."
        )


def gram_xx_blocked_fast(timepoints, decay, sens, lengthscale):
    r"""Table-based (G*T, G*T) gene-gene Gram for UNIFORMLY-gridded
    timepoints (the delta table is indexed by the row/col index
    difference; an irregular shared grid would be silently wrong).

    Misuse guard: when ``timepoints`` is concrete (not a tracer) the op
    validates the spacing on the host and raises ``ValueError`` on an
    irregular grid.  Inside a jit trace the values are unavailable, so
    callers that jit over traced timepoints must check spacing themselves
    (``trainer.fit`` does, and falls back to the row path).

    On a shared time grid every transcendental argument in the k_xx
    closed form lives on a small index set — time differences take only
    2T-1 values, and the remaining erf/exp factors depend on (time, gene)
    or (gene,) alone — so the build needs O(T*G + T*G^2) transcendentals
    instead of 14 per output entry (~1e6 vs ~1.4e9 at N=10^4). The N^2
    work that remains is gathers and multiply-adds (bandwidth-bound).

    Derivation: with rows (a, j) and cols (b, k),

        K = c_jk * [ E1*(F1+F2)  +  (row ⊗ col rank-1 terms) ... ]

    assembled from tables indexed by delta = a - b. Matches
    :func:`dis_project_tpu.ops.lfm_kernels.k_xx_block` to float tolerance
    (tested); use for training Grams when data sits on one grid (the
    canonical and all synthetic stress configs).
    """
    t = timepoints
    _check_uniform_grid(t)
    T = t.shape[0]
    G = decay.shape[0]
    l = lengthscale
    g = lfk.gamma(decay, l)  # (G,)

    # Time-difference axis: delta in [-(T-1), T-1] -> index a - b + T - 1.
    dt = t[1] - t[0]
    deltas = (jnp.arange(2 * T - 1) - (T - 1)) * dt  # (2T-1,)

    # --- tables -----------------------------------------------------------
    # E1[d, j]  = exp(-D_j * delta_d)          F1[d, j] = erf(delta_d/l - g_j)
    # F2[b, j]  = erf(t_b/l + g_j)             F3[a, j] = erf(t_a/l - g_j)
    # e_row[a,j] = exp(-D_j t_a)               F4[j] = erf(g_j)
    E1 = jnp.exp(-deltas[:, None] * decay[None, :])
    F1 = lfk.erf(deltas[:, None] / l - g[None, :])
    F2 = lfk.erf(t[:, None] / l + g[None, :])
    F3 = lfk.erf(t[:, None] / l - g[None, :])
    F4 = lfk.erf(g)
    e_row = jnp.exp(-t[:, None] * decay[None, :])  # (T, G)

    didx = jnp.arange(T)[:, None] - jnp.arange(T)[None, :] + (T - 1)  # (T,T)

    expg2 = jnp.exp(g * g)  # (G,)
    inv_sum = 1.0 / (decay[:, None] + decay[None, :])  # (G, G)

    # Gathered delta-tables, laid out [a, b, gene].
    E1g = E1[didx]  # exp(-D_g (t_a - t_b))
    F1g = F1[didx]  # erf((t_a - t_b)/l - g_g)

    # First h-term of each pair (the only genuinely 2-D-in-time factor):
    #   h1[a, b, j] from h(d_k, d_j, t_b, t_a): E1g * (F1g + F2[b, j])
    #   h2[a, b, k] from h(d_j, d_k, t_a, t_b): E1g^T * (F1g^T + F2[a, k])
    h1 = E1g * (F1g + F2[None, :, :])
    h2 = jnp.transpose(E1g, (1, 0, 2)) * (
        jnp.transpose(F1g, (1, 0, 2)) + F2[:, None, :]
    )
    # Second h-terms are rank-1 in time: r_row[a,g] = e_row*(F3+F4) pairs
    # with a bare e_row on the other index.
    r_row = e_row * (F3 + F4[None, :])  # (T, G)

    c = 0.5 * lfk.SQRT_PI * l
    s_jk = sens[:, None] * sens[None, :] * c * inv_sum  # (G, G)
    w1 = s_jk * expg2[:, None]  # weight of the gamma_j pair
    w2 = s_jk * expg2[None, :]  # weight of the gamma_k pair

    # K4[j, a, k, b]; gene-major collapse matches k_xx_block's layout.
    K4 = w1[:, None, :, None] * (
        jnp.transpose(h1, (2, 0, 1))[:, :, None, :]
        - r_row.T[:, :, None, None] * e_row.T[None, None, :, :]
    ) + w2[:, None, :, None] * (
        jnp.transpose(h2, (0, 2, 1))[None, :, :, :]
        - e_row.T[:, :, None, None] * r_row.T[None, None, :, :]
    )
    return K4.reshape(G * T, G * T)


# Stable handle to the table build for the hybrid op below: the hybrid
# must keep working even if a caller rebinds ``gram_xx_blocked_fast``
# (e.g. to the hybrid itself, to route every gridded consumer through
# the row backward) — resolving the module global at call time would
# then recurse.
_TABLE_BUILD = gram_xx_blocked_fast


@jax.custom_vjp
def gram_xx_blocked_hybrid(timepoints, decay, sens, lengthscale):
    """Table-Gram FORWARD, row-algebra BACKWARD (r5, VERDICT r4 #4).

    The table build (:func:`gram_xx_blocked_fast`) needs O(T G^2)
    transcendentals but its AD backward must scatter-add an (T, T, G)
    cotangent into the (2T-1, G) delta tables — a serialised
    segment-sum that made the gridded train step SLOWER end-to-end than
    the row path at N=8192 (BENCH_r04: 14.6 vs 12.9 ms) despite the 11x
    faster forward. This wrapper keeps the table forward and routes the
    backward through ``jax.vjp`` of the ROW closed forms
    (:func:`lfm_kernels.k_xx_block` — pure elementwise algebra, no
    scatter): the cotangent contraction is a fused elementwise+reduce
    program.

    MEASURED OUTCOME (r5, v5e; VERDICT r4 #4): a refutation. Full
    train-step probes — table-AD 14.38 ms vs hybrid 14.51 ms at N=8192,
    3.89 vs 4.37 ms at N=4096. The row backward's O(N^2) transcendental
    re-evaluation costs more than the table backward's segment-sum
    saves at every shape tried, so the gridded MLL consumers keep plain
    AD-through-the-table and this op stays as a tested, documented
    negative result (same status as ``pallas_cholesky_fused``). Forward values are the table build's bit-for-bit; parameter
    gradients match AD-through-the-table to float tolerance (the two
    algebras are the same math — pinned in tests/test_gridded.py). The
    ``timepoints`` cotangent follows the ROW algebra — the true kernel
    derivative; the table build's own t-gradient is only meaningful
    along uniform grid perturbations (it reads t through ``t[1]-t[0]``),
    so the two t-gradients legitimately differ off that subspace. No
    training caller differentiates w.r.t. the grid."""
    return _TABLE_BUILD(timepoints, decay, sens, lengthscale)


def _gram_hybrid_fwd(timepoints, decay, sens, lengthscale):
    k = _TABLE_BUILD(timepoints, decay, sens, lengthscale)
    return k, (timepoints, decay, sens, lengthscale)


def _gram_hybrid_bwd(res, kbar):
    timepoints, decay, sens, lengthscale = res
    from dis_project_tpu.ops import lfm_kernels as _lfk

    _, vjp = jax.vjp(
        lambda t, d, s, l: _lfk.k_xx_block(t, t, d, s, l),
        timepoints, decay, sens, lengthscale,
    )
    return vjp(kbar)


gram_xx_blocked_hybrid.defvjp(_gram_hybrid_fwd, _gram_hybrid_bwd)


def gram_xx_blocked(timepoints, decay, sens, lengthscale, replicates=1):
    """Specialised training-path Gram: all rows are gene-expression rows.

    Training rows are ``replicates`` stacked blocks of (G genes x T times)
    with identical timepoints (reference ``dataset_3d``,
    ``src/dataset.py:358-399``), so k_xx does not depend on the replicate
    index at all: the full (R*G*T)^2 Gram is an R x R tiling of one
    (G*T, G*T) block. The reference recomputes every one of the (R*G*T)^2
    entries (105x105 at R=3); here only the distinct (G*T)^2 block is built
    and tiled — an R^2 saving before any kernel fusion.
    """
    block = lfk.k_xx_block(timepoints, timepoints, decay, sens, lengthscale)
    if replicates == 1:
        return block
    return jnp.tile(block, (replicates, replicates))
