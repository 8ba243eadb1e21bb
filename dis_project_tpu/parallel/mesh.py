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


def make_hybrid_mesh(
    model_axis: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
    slice_id=None,
) -> Mesh:
    """Multi-slice (DCN-aware) 2-D mesh.

    On a multi-slice TPU deployment the two mesh axes have very different
    bandwidth underneath: intra-slice links (ICI) are an order of magnitude
    faster than the data-center network (DCN) between slices. The framework's
    communication pattern makes the right placement unambiguous:

    - the ``"model"`` axis carries the factorisation's panel all-gathers
      every step — it must stay INSIDE a slice (ICI);
    - the ``"data"`` axis carries independent ensemble members — no
      per-step communication at all — so it is the axis that may span
      slices over DCN.

    ``model_axis`` is the per-slice model-parallel degree (default: the
    whole slice). Devices are grouped by ``slice_index`` (fallback 0 — a
    single-slice or CPU environment degrades to :func:`make_mesh`
    semantics), each slice is laid out topology-aware via
    ``mesh_utils.create_device_mesh``, and slices are stacked along the
    leading (data) axis so no model-axis collective ever crosses DCN.

    ``slice_id`` (device -> hashable) exists for tests, where virtual CPU
    devices carry no slice topology. When the devices DO carry a real
    ``slice_index`` (and no custom ``slice_id`` is given), assembly is
    delegated to ``mesh_utils.create_hybrid_device_mesh`` — the upstream
    implementation of exactly this placement.
    """
    if len(axis_names) != 2:
        raise ValueError(f"hybrid mesh is 2-D (data, model); got {axis_names}")
    devices = list(devices) if devices is not None else jax.devices()
    real_topology = slice_id is None and all(
        getattr(d, "slice_index", None) is not None for d in devices
    )
    if slice_id is None:
        slice_id = lambda d: getattr(d, "slice_index", None) or 0  # noqa: E731
    groups: dict = {}
    for d in devices:
        groups.setdefault(slice_id(d), []).append(d)
    sizes = {k: len(g) for k, g in groups.items()}
    per_slice = next(iter(sizes.values()))
    if any(s != per_slice for s in sizes.values()):
        raise ValueError(f"uneven slices cannot form a mesh: {sizes}")
    model = per_slice if model_axis is None else int(model_axis)
    if model < 1 or per_slice % model:
        raise ValueError(
            f"model axis {model} does not divide the slice size {per_slice}"
        )
    if real_topology:
        dev_array = mesh_utils.create_hybrid_device_mesh(
            (per_slice // model, model), (len(groups), 1), devices
        )
        return Mesh(dev_array, tuple(axis_names))
    # Injected slice ids (tests) or topology-less devices (CPU): the same
    # placement by hand — per-slice topology-aware layout, slices stacked
    # along the leading (data) axis.
    blocks = [
        mesh_utils.create_device_mesh(
            (per_slice // model, model), devices=groups[k]
        )
        for k in sorted(groups, key=str)
    ]
    return Mesh(np.concatenate(blocks, axis=0), tuple(axis_names))
