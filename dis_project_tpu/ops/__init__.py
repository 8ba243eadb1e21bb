"""Numerics core: kernels, Gram assembly, linear algebra, precision policy."""

from dis_project_tpu.ops import bijectors, gram, lfm_kernels, mll, precision

__all__ = ["bijectors", "gram", "lfm_kernels", "mll", "precision"]
