"""Mesh-parallel execution: device meshes, sharded ensemble training."""

from dis_project_tpu.parallel.mesh import make_mesh, named
from dis_project_tpu.parallel.sharding import (
    ensemble_shardings,
    fit_ensemble,
    make_ensemble_train_step,
    replicate_params,
)

__all__ = [
    "make_mesh",
    "named",
    "ensemble_shardings",
    "fit_ensemble",
    "make_ensemble_train_step",
    "replicate_params",
]
