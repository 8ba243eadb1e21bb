"""dis_project_tpu — a TPU-native latent force model (LFM) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
project ``wejpurvis/DIS_project`` (the Lawrence, Sanguinetti & Rattray 2006
Single Input Motif transcriptional-regulation latent force model):

- analytic ODE-derived cross-covariance kernels (``ops.lfm_kernels``),
  vectorised as block/pairwise functions instead of the reference's
  scalar-kernel double-vmap (reference ``src/model.py:392``),
- exact multi-output GP inference with a custom-VJP conjugate marginal
  log-likelihood (``ops.mll``) that reuses the Cholesky factorisation,
- fused Pallas Gram-matrix kernels and MXU-blocked Cholesky (``ops.pallas_*``),
- a jit-compiled constrained-parameter trainer with checkpoint/metrics
  (``training``), mesh-sharded execution (``parallel``), sparse variational
  and second-order model families (``models``), and reporting parity with the
  reference's plot/CSV artifact matrix (``reporting``).

Subpackages are imported lazily where they carry heavy dependencies
(matplotlib, orbax); the numerics core only needs jax + numpy.
"""

from dis_project_tpu import ops
from dis_project_tpu.ops.precision import default_float, enable_x64
from dis_project_tpu.models.simm import SIMMParams, ExactSIMM
from dis_project_tpu.data.dataset import P53Data, dataset_3d, flatten_blocked

__version__ = "0.3.0"  # keep in sync with pyproject.toml

__all__ = [
    "ops",
    "default_float",
    "enable_x64",
    "SIMMParams",
    "ExactSIMM",
    "P53Data",
    "dataset_3d",
    "flatten_blocked",
]
