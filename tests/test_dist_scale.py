"""Scale validation of the distributed dense path (VERDICT r2 #3): the
GSPMD factoriser at N=16384 on the 8-device virtual mesh — compile-time
bound for the trace-time-unrolled block loop, per-device memory against the
promised ~N^2/D + N*B model (from XLA's own memory_analysis), and sampled
numerical verification. Slow lane only (one core executes all 8 virtual
devices). The N=32768 datapoint is recorded in PARITY.md from the same
harness run manually (too slow for the suite)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dis_project_tpu.parallel import dist_cholesky as dc

pytestmark = pytest.mark.slow

N = 16384
BLOCK = 2048


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("model",))


def _build_spd(n):
    """RBF + diagonal SPD test matrix, built in row blocks to keep the
    host peak at O(n^2/8)."""
    t = np.linspace(0, 12, n).astype(np.float32)
    rows = []
    step = n // 8
    for lo in range(0, n, step):
        rows.append(
            0.95 * np.exp(-((t[lo:lo + step, None] - t[None, :]) ** 2) / 4.0)
        )
    A = np.concatenate(rows, 0)
    A[np.arange(n), np.arange(n)] += 1.05
    return A


def test_sharded_cholesky_at_16k(mesh):
    spec = NamedSharding(mesh, P("model", None))
    A_np = _build_spd(N)
    A = jax.device_put(jnp.asarray(A_np), spec)

    f = jax.jit(
        lambda a: dc.sharded_cholesky(a, mesh, "model", block=BLOCK),
        out_shardings=spec,
    )
    t0 = time.perf_counter()
    compiled = f.lower(A).compile()
    compile_s = time.perf_counter() - t0
    # The block loop unrolls nb=8 staged matmul groups at trace time; the
    # bound catches an unrolling blowup (r2 concern: nobody had measured
    # compile at nb >= 8 with N >= 16k). Measured ~35 s on the 1-core CI
    # host; 300 s leaves slack for load while still failing on a blowup.
    assert compile_s < 300, f"compile blowup: {compile_s:.0f}s"

    ma = compiled.memory_analysis()
    model_bytes = (N * N / 8 + N * BLOCK) * 4
    total = ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes
    # Per-device window: args + out + temps within 3x the promised
    # ~N^2/D + N*B working set (measured r3: 0.125 + 0.125 + 0.465 GiB =
    # 2.9x — the factor-column temps, trailing-matrix double buffer and
    # the one assembly temp; the r2 zeros+at-set assembly measured 6.5x,
    # fixed in dist_cholesky.sharded_cholesky).
    assert total < 3 * model_bytes, (
        f"per-device memory {total/2**30:.2f} GiB vs model "
        f"{model_bytes/2**30:.2f} GiB"
    )

    L = np.asarray(jax.device_get(compiled(A)))
    _reconstruction_checks(L, A_np)


def test_sharded_cholesky_compile_at_65k(mesh):
    """VERDICT r3 #6 'Done' gate: N=65536 (nb=8 after coarsening) must
    COMPILE in < 120 s on the 8-device virtual mesh with bounded
    per-device temps. (Execution at 65k is ~30 min on the single CI core
    running all 8 virtual devices — the 16k test above covers numerics;
    this pins the compile-scaling fix: r3 measured 144.5 s at HALF this
    size, r4's sharding-pinned form measures ~18 s here. Temps bound
    3.25x the N^2/D model = the measured 5.88 GiB + slack; the r3 form
    measured 7.4 GiB and every at-set/ragged assembly variant >20 GiB —
    see sharded_cholesky's docstring for the measured design space.)"""
    N2 = 65536
    spec = NamedSharding(mesh, P("model", None))
    A = jax.ShapeDtypeStruct((N2, N2), jnp.float32)
    f = jax.jit(
        lambda a: dc.sharded_cholesky(a, mesh, "model", block=2048),
        out_shardings=spec,
    )
    t0 = time.perf_counter()
    compiled = f.lower(A).compile()
    compile_s = time.perf_counter() - t0
    assert compile_s < 120, f"compile blowup: {compile_s:.0f}s"
    ma = compiled.memory_analysis()
    model_bytes = N2 * N2 * 4 / 8
    assert ma.temp_size_in_bytes < 3.25 * model_bytes, (
        f"temps {ma.temp_size_in_bytes/2**30:.2f} GiB vs model "
        f"{model_bytes/2**30:.2f} GiB"
    )


def _reconstruction_checks(L, A_np):
    # Sampled verification: 64 rows of L L^T against A, plus diagonal
    # positivity — a full second factorisation at 16k is minutes on the
    # single host core executing all 8 virtual devices.
    idx = np.linspace(0, L.shape[0] - 1, 64).astype(int)
    recon = L[idx] @ L.T
    err = np.max(np.abs(recon - A_np[idx]))
    assert err < 5e-4, err
    assert (np.diag(L) > 0).all()
    # And the factor is exactly lower-triangular (strict upper all zero).
    assert np.triu(L, 1).max() == 0.0
