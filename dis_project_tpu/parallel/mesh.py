"""Device-mesh helpers.

The reference has no parallelism of any kind (SURVEY.md §2: no pmap /
shard_map / pjit / Mesh / collectives anywhere). The framework's scale-out
story is a 2-D ``jax.sharding.Mesh``:

- ``"data"`` axis — ensemble/replicate parallelism: independent model
  instances (ablation sweeps, per-replicate fits, restarts) train as one
  SPMD program, one member per data-slice.
- ``"model"`` axis — Gram-matrix row-block sharding: the erf-heavy Gram
  build is computed where the rows live, and the factorisation's collectives
  (all-gathers of panel blocks) ride ICI via XLA.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``shape=None`` puts every device on the first axis. Works identically on
    a real TPU slice and on the CPU backend with
    ``--xla_force_host_platform_device_count=N``.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(dev_array, tuple(axis_names))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
