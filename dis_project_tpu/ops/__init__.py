"""Numerics core: kernels, Gram assembly, linear algebra, precision policy."""

from dis_project_tpu.ops import bijectors, gram, lfm_kernels, mll, precision
from dis_project_tpu.ops import iterative, lfm_kernels2, pallas_cholesky, pallas_gram, special, statespace

__all__ = ["bijectors", "gram", "lfm_kernels", "mll", "precision", "iterative", "lfm_kernels2", "pallas_cholesky", "pallas_gram", "special", "statespace"]
