"""Precision policy for the framework.

The reference runs everything in float64 via a global import side-effect
(reference ``src/dataset.py:18``). TPUs have no fast native f64, so this
framework makes precision an explicit, switchable policy instead:

- **Parity/oracle runs** (CPU tests, golden-value comparisons): enable x64 and
  every op runs in f64.
- **TPU runs**: f32 accumulation for the erf/exp kernel algebra and the
  Cholesky (the p53-scale problems are tiny and comfortably inside f32;
  the N~1e4-1e5 stress configs use f32 Gram + f32 Cholesky, with bf16 only
  where the MXU matmuls dominate and the conditioning allows it).

Nothing in this module mutates global JAX state at import time; callers opt
in via :func:`enable_x64` (entry points, conftest) so that library import
order can never silently change numerics — unlike the reference.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def enable_x64(enable: bool = True) -> None:
    """Turn on (or off) 64-bit mode. Call before creating arrays."""
    jax.config.update("jax_enable_x64", enable)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_float() -> jnp.dtype:
    """The widest float available under the current x64 setting."""
    return jnp.float64 if x64_enabled() else jnp.float32


@dataclasses.dataclass(frozen=True)
class Policy:
    """A compute/accumulation dtype pair.

    ``compute``: dtype kernel algebra (erf/exp terms) is evaluated in.
    ``accum``:  dtype Gram accumulation, Cholesky and the MLL run in.
    """

    compute: jnp.dtype
    accum: jnp.dtype

    def cast_compute(self, x):
        return jnp.asarray(x, self.compute)

    def cast_accum(self, x):
        return jnp.asarray(x, self.accum)


def parity_policy() -> Policy:
    """Highest precision available — used for oracle/parity runs."""
    d = default_float()
    return Policy(compute=d, accum=d)


def tpu_policy() -> Policy:
    """f32 everywhere: right default for TPU exact-GP workloads, where the
    Cholesky conditioning (not the matmul throughput) bounds precision."""
    return Policy(compute=jnp.float32, accum=jnp.float32)
