"""Orbax checkpointing (params, opt state, step, PRNG key) with resume.

The reference pins orbax-checkpoint but never imports it; models live only in
process memory (SURVEY.md §5). Here checkpoints are a first-class trainer
feature: :func:`save` / :func:`restore` round-trip arbitrary pytrees, and
:func:`latest_step` supports resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(directory: str, tree: Any, step: int) -> str:
    """Save ``tree`` under ``directory/step_{step}``. Returns the path."""
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    _checkpointer().save(path, jax.device_get(tree), force=True)
    return path


def restore(directory: str, step: int, template: Optional[Any] = None) -> Any:
    path = os.path.abspath(os.path.join(directory, f"step_{step}"))
    if template is not None:
        return _checkpointer().restore(path, item=jax.device_get(template))
    return _checkpointer().restore(path)


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name[len("step_"):]))
            except ValueError:
                continue
    return max(steps) if steps else None
