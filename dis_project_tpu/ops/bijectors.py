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

    def log_det_grad(self, x):
        """Elementwise ``log |d forward / dx|`` — the change-of-variables
        term for densities moved between the two spaces (used by the HMC
        hyperparameter posterior, ``training.hmc``)."""
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Bijector):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def log_det_grad(self, x):
        return jnp.zeros_like(x)


@dataclasses.dataclass(frozen=True)
class Softplus(Bijector):
    """y = log(1 + exp(x)); x = y + log(-expm1(-y))."""

    def forward(self, x):
        return jnp.logaddexp(x, 0.0)

    def inverse(self, y):
        # Stable softplus-inverse; valid for y > 0.
        return y + jnp.log(-jnp.expm1(-y))

    def log_det_grad(self, x):
        # d softplus / dx = sigmoid(x); log sigmoid(x) = -softplus(-x).
        return -jnp.logaddexp(-x, 0.0)


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

    def log_det_grad(self, x):
        # d/dx = (high - low) * sigmoid(x) * sigmoid(-x).
        return (
            jnp.log(self.high - self.low)
            - jnp.logaddexp(x, 0.0)
            - jnp.logaddexp(-x, 0.0)
        )


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


def constrain_log_det(raw: Any, bijectors: Any):
    """``log |d constrain(raw) / d raw|`` summed over every leaf element —
    the Jacobian correction that makes a flat prior in CONSTRAINED space
    into the matching unconstrained-space density (``training.hmc``)."""
    per_leaf = jax.tree.map(
        lambda b, x: jnp.sum(b.log_det_grad(x)),
        bijectors,
        raw,
        is_leaf=lambda n: isinstance(n, Bijector),
    )
    return jax.tree.reduce(lambda a, b: a + b, per_leaf)
