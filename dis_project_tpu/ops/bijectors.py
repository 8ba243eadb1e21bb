"""Parameter bijectors (constrained <-> unconstrained transforms).

The reference leans on TFP-on-JAX bijectors attached to GPJax ``param_field``s
(reference ``src/model.py:65-121``): Softplus for positivity (obs_stddev,
decays, sensitivities, basal rates) and a Sigmoid bounded to [0.5, 3.5] for
the lengthscale. Here they are small, dependency-free, jit-traceable
dataclasses; a parameter pytree is paired with a matching pytree of bijectors
and transformed with :func:`constrain` / :func:`unconstrain`.

Numerics match TFP's implementations (stable softplus-inverse via
``y + log(-expm1(-y))``) so that unconstrained-space trajectories — and hence
the reference's quirky raw-space parameter clamp (reference
``src/trainer.py:151-158``) — are reproducible bit-for-bit in f64.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Bijector:
    """Base transform. ``forward`` maps unconstrained -> constrained."""

    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Bijector):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y


@dataclasses.dataclass(frozen=True)
class Softplus(Bijector):
    """y = log(1 + exp(x)); x = y + log(-expm1(-y))."""

    def forward(self, x):
        return jnp.logaddexp(x, 0.0)

    def inverse(self, y):
        # Stable softplus-inverse; valid for y > 0.
        return y + jnp.log(-jnp.expm1(-y))


@dataclasses.dataclass(frozen=True)
class SigmoidBounded(Bijector):
    """y = low + (high - low) * sigmoid(x); inverse is a logit."""

    low: float = 0.0
    high: float = 1.0

    def forward(self, x):
        return self.low + (self.high - self.low) * jax.nn.sigmoid(x)

    def inverse(self, y):
        z = (y - self.low) / (self.high - self.low)
        return jnp.log(z) - jnp.log1p(-z)


def constrain(raw: Any, bijectors: Any) -> Any:
    """Map a pytree of unconstrained leaves to constrained space.

    ``bijectors`` must be a pytree with the same structure whose leaves are
    :class:`Bijector` instances.
    """
    return jax.tree.map(
        lambda b, x: b.forward(x),
        bijectors,
        raw,
        is_leaf=lambda n: isinstance(n, Bijector),
    )


def unconstrain(params: Any, bijectors: Any) -> Any:
    """Inverse of :func:`constrain`."""
    return jax.tree.map(
        lambda b, y: b.inverse(y),
        bijectors,
        params,
        is_leaf=lambda n: isinstance(n, Bijector),
    )
