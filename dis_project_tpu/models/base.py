"""Shared model-layer types: Gaussian predictive distributions."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Gaussian(NamedTuple):
    """A multivariate normal predictive distribution.

    ``mean``: (N,), ``cov``: (N, N). Mirrors the slice of GPJax's
    ``GaussianDistribution`` API the reference consumes (``mean()``,
    ``stddev()`` — reference ``src/plotter.py:62-63``).
    """

    mean: jnp.ndarray
    cov: jnp.ndarray

    def stddev(self) -> jnp.ndarray:
        return jnp.sqrt(jnp.diagonal(self.cov))

    def variance(self) -> jnp.ndarray:
        return jnp.diagonal(self.cov)
