"""Data layer: Barenco p53 loader, containers, encodings, synthetic generators."""

from dis_project_tpu.data import barenco, synthetic
from dis_project_tpu.data.dataset import (
    P53Data,
    dataset_3d,
    flatten_blocked,
    train_arrays,
)

__all__ = ["barenco", "synthetic", "P53Data", "dataset_3d", "flatten_blocked", "train_arrays"]
