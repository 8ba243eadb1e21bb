"""Training objectives.

``neg_mll`` is the reference's ``CustomConjMLL(negative=True)``
(``src/objectives.py:19-78``) as a pure function; the ELBO for the sparse
variational path lives with its model (``models.svlfm``).
"""

from __future__ import annotations

import jax.numpy as jnp

from dis_project_tpu.models.simm import ExactSIMM, SIMMParams


def mll(model: ExactSIMM, params: SIMMParams, x, y) -> jnp.ndarray:
    """Exact conjugate marginal log-likelihood (maximise)."""
    return model.mll(params, x, y)


def neg_mll(model: ExactSIMM, params: SIMMParams, x, y) -> jnp.ndarray:
    """Negative MLL (minimise) — the canonical training loss."""
    return -model.mll(params, x, y)
