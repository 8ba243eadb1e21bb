"""Cross-framework validation stack (torch CPU parity oracle).

Plays the role of the reference's GPyTorch/ALFI second implementation
(``src/gpytorch_alfi/``): the same SIMM math written independently in torch
with an eager trainer and blockwise Gram assembly, used to validate the JAX
framework's values, gradients, and trained posteriors (tests/test_validation.py).
"""

from dis_project_tpu.validation.torch_lfm import TorchSIMM

__all__ = ["TorchSIMM"]
