"""Test-grid builders for posterior prediction.

Mirrors reference ``src/utils.py:268-314`` and the
``GeneExpressionPredictor.generate_test_times_pred`` grid
(``src/utils.py:81-98``):

- :func:`latent_grid` — rows ``(linspace(0, 13, t), -1, 0)``: latent-force
  queries; the gene index is irrelevant and flagged out.
- :func:`expression_grid` — times tiled per gene, flag 1. The reference uses
  gene indices 1..G (``one_based=True``), which combined with clamped gathers
  evaluates gene i's block with gene i+1's kinetics (SURVEY.md §2 #17) and
  forces the reporting layer's 3<->4 swap; the correct 0-based convention is
  the default here.
"""

from __future__ import annotations

import jax.numpy as jnp

from dis_project_tpu.ops.precision import default_float


def latent_grid(t: int = 100, t_max: float = 13.0) -> jnp.ndarray:
    dtype = default_float()
    times = jnp.linspace(0.0, t_max, t, dtype=dtype)
    gene_idx = jnp.full((t,), -1.0, dtype)
    flags = jnp.zeros((t,), dtype)
    return jnp.stack([times, gene_idx, flags], axis=-1)


def expression_grid(
    num_genes: int, t: int = 100, t_max: float = 13.0, one_based: bool = False
) -> jnp.ndarray:
    dtype = default_float()
    times = jnp.tile(jnp.linspace(0.0, t_max, t, dtype=dtype), num_genes)
    start = 1 if one_based else 0
    gene_idx = jnp.repeat(
        jnp.arange(start, num_genes + start, dtype=dtype), t
    )
    flags = jnp.ones_like(times)
    return jnp.stack([times, gene_idx, flags], axis=-1)
