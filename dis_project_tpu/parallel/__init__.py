"""Mesh-parallel execution: device meshes, sharded ensemble training,
distributed Cholesky/MLL for beyond-HBM Gram matrices."""

from dis_project_tpu.parallel.mesh import make_hybrid_mesh, make_mesh, named
from dis_project_tpu.parallel.sharding import (
    ensemble_shardings,
    fit_ensemble,
    make_ensemble_train_step,
    replicate_params,
)
from dis_project_tpu.parallel.dist_cholesky import (
    sharded_cholesky,
    sharded_mvn_logpdf,
    sharded_tri_inv,
)

__all__ = [
    "make_hybrid_mesh",
    "make_mesh",
    "named",
    "ensemble_shardings",
    "fit_ensemble",
    "make_ensemble_train_step",
    "replicate_params",
    "sharded_cholesky",
    "sharded_mvn_logpdf",
    "sharded_tri_inv",
]
