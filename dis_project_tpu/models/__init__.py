"""Model families: exact SIMM (first-order ODE), multi-force, second-order,
delayed-response, nonlinear-response, variational."""

from dis_project_tpu.models.base import Gaussian
from dis_project_tpu.models import delaysimm, multisimm, nlfm, simm2, svlfm
from dis_project_tpu.models.delaysimm import DelaySIMMParams, ExactDelaySIMM
from dis_project_tpu.models.multisimm import ExactMultiSIMM, MultiSIMMParams
from dis_project_tpu.models.nlfm import NLFMParams, NonlinearLFM
from dis_project_tpu.models.simm2 import SecondOrderSIMM, SIMM2Params
from dis_project_tpu.models.svlfm import SparseSIMM, SVLFMParams
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
    "delaysimm",
    "multisimm",
    "nlfm",
    "simm2",
    "svlfm",
    "DelaySIMMParams",
    "ExactDelaySIMM",
    "NLFMParams",
    "NonlinearLFM",
    "ExactMultiSIMM",
    "MultiSIMMParams",
    "SecondOrderSIMM",
    "SIMM2Params",
    "SparseSIMM",
    "SVLFMParams",
    "ExactSIMM",
    "SIMMParams",
    "SIMM_BIJECTORS",
    "clamp_params",
    "constrain",
    "init_params",
    "unconstrain",
]
