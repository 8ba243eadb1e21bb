"""Training loop and checkpointing.

The training objectives live with their owners: the exact conjugate MLL on
``models.simm.ExactSIMM`` (over ``ops.mll``'s custom-VJP MVN log-density —
the reference's ``CustomConjMLL``, ``src/objectives.py:19-78``) and the
sparse-variational ELBOs on ``models.svlfm.SparseLFM``.
"""

from dis_project_tpu.training.trainer import (
    TrainConfig,
    TrainResult,
    fit,
    fit_checkpointed,
)
from dis_project_tpu.training import hmc, svtrainer

__all__ = [
    "TrainConfig",
    "TrainResult",
    "fit",
    "fit_checkpointed",
    "hmc",
    "svtrainer",
]
