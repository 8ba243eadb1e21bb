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
