"""Training loop, objectives, checkpointing."""

from dis_project_tpu.training.trainer import (
    TrainConfig,
    TrainResult,
    fit,
    fit_checkpointed,
)
from dis_project_tpu.training import objectives, svtrainer

__all__ = ["TrainConfig", "TrainResult", "fit", "fit_checkpointed", "objectives", "svtrainer"]
