"""Training loop, objectives, checkpointing."""

from dis_project_tpu.training.trainer import TrainConfig, TrainResult, fit
from dis_project_tpu.training import objectives, svtrainer

__all__ = ["TrainConfig", "TrainResult", "fit", "objectives", "svtrainer"]
