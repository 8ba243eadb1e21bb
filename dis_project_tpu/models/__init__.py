"""Model families: exact SIMM (first-order ODE), second-order, variational."""

from dis_project_tpu.models.base import Gaussian
from dis_project_tpu.models.simm import (
    ExactSIMM,
    SIMMParams,
    SIMM_BIJECTORS,
    clamp_params,
    constrain,
    init_params,
    unconstrain,
)

__all__ = [
    "Gaussian",
    "ExactSIMM",
    "SIMMParams",
    "SIMM_BIJECTORS",
    "clamp_params",
    "constrain",
    "init_params",
    "unconstrain",
]
