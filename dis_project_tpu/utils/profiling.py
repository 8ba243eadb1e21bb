"""Tracing / profiling instrumentation (SURVEY.md §5: absent in the
reference — its only progress surface is a progress bar).

Three layers:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory (XLA ops, fusion boundaries, HBM
  traffic) for any region of the pipeline.
- :func:`annotate` / :func:`annotated` — named traced regions
  (``jax.profiler.TraceAnnotation``/``annotate_function``) so Gram builds,
  factorisations and optimizer steps are attributable inside a trace.
- :func:`flop_report` — static roofline accounting for the exact-MLL
  pipeline at a given N (Gram transcendentals + Cholesky/solve FLOPs vs
  device peak), used by ``bench.py`` and sanity checks; the reference has
  no performance accounting anywhere.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax

# v5e single-chip peaks (see bench.py for the measured f32-matmul rate).
PEAK_MATMUL_FLOPS = 197e12
PEAK_HBM_BYTES = 819e9


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region into ``log_dir`` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate("gram-build"): ...``"""
    return jax.profiler.TraceAnnotation(name)


def annotated(name: str):
    """Decorator form of :func:`annotate`."""

    def deco(fn):
        return jax.profiler.annotate_function(fn, name=name)

    return deco


def dump_hlo(fn, *args, path: str | None = None, optimized: bool = True) -> str:
    """Lower+compile ``fn(*args)`` and return (optionally write) its HLO
    text — fusion decisions, layouts and rematerialisation are all visible
    here. ``optimized=False`` gives the pre-optimisation stable HLO."""
    lowered = jax.jit(fn).lower(*args)
    if optimized:
        text = lowered.compile().as_text()
    else:
        text = lowered.as_text()
    if path:
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(text)
    return text


@dataclasses.dataclass(frozen=True)
class FlopReport:
    n: int
    gram_transcendentals: int
    gram_flops: int
    chol_flops: int
    solve_flops: int
    bytes_touched: int

    @property
    def total_flops(self) -> int:
        return self.gram_flops + self.chol_flops + self.solve_flops

    def seconds_at_peak(self) -> float:
        """Lower bound: max of compute-limited and bandwidth-limited time."""
        compute = self.total_flops / PEAK_MATMUL_FLOPS
        memory = self.bytes_touched / PEAK_HBM_BYTES
        return max(compute, memory)

    def utilization(self, measured_seconds: float) -> float:
        return self.seconds_at_peak() / max(measured_seconds, 1e-12)


def flop_report(n: int, itemsize: int = 4) -> FlopReport:
    """Static cost model of one exact-MLL evaluation at N rows.

    Gram: ~60 flops + ~14 transcendentals per entry (the erf/exp h-term
    algebra, see ``ops.pallas_gram``); Cholesky N^3/3; one triangular solve
    pair ~2 N^2. Bytes: the N x N Gram written once and read by the
    factoriser (in-place model).
    """
    n2 = n * n
    return FlopReport(
        n=n,
        gram_transcendentals=14 * n2,
        gram_flops=60 * n2,
        chol_flops=n**3 // 3,
        solve_flops=2 * n2,
        bytes_touched=3 * n2 * itemsize,
    )
