"""Canonical benchmark. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Headline: wall-clock **to the converged MLL** for the canonical p53 SIMM LFM
training run (the reference's ``src/main.py`` pipeline: Adam lr=0.01) on the
available accelerator, steady-state (post-compile).

Equal-convergence methodology (r3, fixing the r2 headline): the reference's
nominal 150 iterations leave the run far from converged (loss +4.8 of a
-23.7 optimum; measured convergence at ~400-500 iterations), and at
iteration counts in the chaotic descent region the final loss is dominated
by f32 roundoff trajectory divergence (r2's "regression" — the gridded and
row routes agree to ~1e-5 for 30 steps, then separate into equally-valid
trajectories 0.06 nats apart at step 150). So both programs run
``BENCH_ITERS`` = 600 iterations (one scan each), a shared convergence
target is set at ``max(min loss of either trajectory) + 0.01`` nats, and
the headline is

    time_to_target = wall_clock * steps_to_target / BENCH_ITERS

for each route — a fixed-quality finish line, not a fixed-iteration one.
``vs_baseline`` is the ratio of the baseline's time-to-target to ours.

``vs_baseline`` is the speedup over a faithful re-creation of the
*reference's computational pattern* on the same device: a scalar kernel on
(t, gene, flag) 3-vectors evaluating all four flag-switched branches per
pair, lifted with a double vmap (reference ``src/model.py:152-195,392``), and
a marginal log-likelihood differentiated *through* the Cholesky factorisation
(no custom VJP). Same math, same optimiser, same iteration count — isolating
the value of the TPU-first design (vectorised block Gram + factorisation-
reusing custom-VJP MLL).

Timing methodology: all kernel probes go through
``dis_project_tpu.utils.benchmarking.time_op`` (chained executions inside one
program, scalar fetch, slope of two chain lengths) because
``block_until_ready`` does not block over the axon TPU tunnel and repeated
identical dispatches can be served from a replay cache. The training runs are
already a single chained 150-step scan; their timer varies an input epsilon
per repeat and fetches the final loss.

Extra fields: Gram-build and Cholesky throughput at N=8192 (f32, the
BASELINE.json north-star point) plus full-train-step probes at N=4096 and
N=8192, with utilisation against the v5e peak and the f32-faithful ceiling.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import optax


def _probe_backend(timeout_s=540):
    """Probe the default accelerator in a SUBPROCESS: a wedged remote-TPU
    tunnel hangs even a scalar op indefinitely and a blocked XLA call
    cannot be interrupted in-process, so the health check must be killable.
    A healthy tunnel answers a fresh-process scalar matmul well inside the
    bound (cold compile ~20-40 s; a DEGRADED-but-alive tunnel was measured
    at 257 s on 2026-08-19, hence the generous default — a spurious CPU
    fallback costs the round its real TPU numbers, a slow probe only costs
    minutes). Returns the effective backend platform
    string (e.g. "tpu", "cpu") on success, or None if the probe hung or
    failed — the CALLER must distinguish "responsive" from "not CPU"
    (a CPU-default host answers the probe happily)."""
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax, jax.numpy as jnp\n"
                "x = jnp.ones((8, 8))\n"
                "float((x @ x).sum())\n"
                "print(jax.default_backend())\n",
            ],
            capture_output=True,
            timeout=timeout_s,
        )
        if proc.returncode != 0:
            return None
        return proc.stdout.decode().strip().splitlines()[-1]
    except subprocess.TimeoutExpired:
        return None


def _setup_platform():
    """Pick the platform BEFORE any in-process device op; returns a note
    (or None) for the result JSON.

    Healthy accelerator: enable the persistent compile cache (the N=8192
    probes compile ~10 large programs, ~7 min cold over the tunnel; over
    the remote-compile tunnel even one-op programs cost ~0.37 s of HTTP
    round trip, hence min_compile_time 0). Dead tunnel: pin the CPU
    backend and measure there — vs_baseline compares our design against
    the reference compute pattern ON THE SAME DEVICE, so the ratio stays
    an honest like-for-like even on CPU. The persistent cache must NOT be
    enabled for CPU runs: the remote service cross-compiles CPU AOT with
    its own machine features and a local reload risks SIGILL (see
    main._setup_backend)."""
    import sys

    backend = _probe_backend()
    if backend is not None:
        # Enable the persistent cache only when the effective backend is
        # an accelerator: a CPU-default host (JAX_PLATFORMS=cpu, or no TPU
        # plugin) answers the probe too, and caching CPU executables from
        # the remote-compile service is exactly the SIGILL hazard the
        # docstring forbids.
        if backend != "cpu":
            try:
                jax.config.update(
                    "jax_compilation_cache_dir", "/tmp/jax_bench_cache"
                )
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 0.0
                )
            except Exception:
                pass
        return None
    print(
        "bench: default accelerator unresponsive (dead TPU tunnel?) — "
        "falling back to a CPU measurement; rerun on a healthy "
        "accelerator for the real numbers",
        file=sys.stderr,
        flush=True,
    )
    jax.config.update("jax_platforms", "cpu")
    return "accelerator unresponsive; CPU fallback measurement"

# v5e single-chip peak (shared with utils.profiling so the per-op and
# train-step fractions in one JSON line can never desynchronise):
# ~197 TFLOP/s bf16. Single-pass-bf16 f32 matmuls run at ~190 TF/s but are
# only ~4e-3 accurate — enough to NaN the real Gram's factorization (r2
# finding; see ops/pallas_cholesky.MATMUL_PRECISION) — so the O(N^3) chain
# is pinned to 3-pass bf16 (~63 TF/s effective for f32-faithful products).
# Peak fractions below are quoted against the raw bf16 peak AND against
# the f32-faithful ceiling (~1/3 of it).
from dis_project_tpu.utils.profiling import PEAK_MATMUL_FLOPS as V5E_PEAK_FLOPS


def _build_problem(dtype=jnp.float32):
    from dis_project_tpu.data.dataset import P53Data, dataset_3d

    data = P53Data(replicate=0, source="synthetic")
    X, y, _ = dataset_3d(data)
    t = jnp.asarray(data.timepoints, dtype)
    return jnp.asarray(X, dtype), jnp.asarray(y.reshape(-1), dtype), t


def _time_fit(fit_fn, raw0, X, repeats=3):
    """Time a jitted (raw, X) -> history training program.

    The 150-step scan is internally chained; per-repeat we perturb X by a
    numerically negligible epsilon (distinct each call, defeating the tunnel
    replay cache) and force completion by fetching the final loss.
    """
    def run(Xi):
        out = fit_fn(raw0, Xi)
        hist = out[0] if isinstance(out, tuple) else out
        float(hist[-1])  # force completion over the tunnel
        return out

    run(X)  # compile + warm
    best = float("inf")
    out = None
    for k in range(1, repeats + 1):
        Xk = X + jnp.asarray(k * 1e-30, X.dtype)
        t0 = time.perf_counter()
        out = run(Xk)
        best = min(best, time.perf_counter() - t0)
    return best, out


def _make_fit(loss_fn, num_iters=150, guarded=False):
    """``guarded=True`` (bench_ours) runs the production loop's
    backtrack-and-retry finite guard (``training.generic.
    guarded_transition``) and returns ``(hist, guard_flags)`` — the
    measured indefinite-Sigma event (PARITY.md r3 item 2) then shows up
    as a guard-recovery COUNT instead of a NaN history prefix. The
    reference-pattern loop stays unguarded on purpose: it emulates the
    reference's raw scan, whose NaN poisoning the finite-prefix stats
    exist to surface honestly."""
    from dis_project_tpu.models import simm

    optimizer = optax.adam(0.01)

    @jax.jit
    def fit(raw, X):
        opt_state = optimizer.init(raw)

        def step(carry, i):
            raw, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(raw, X)
            updates, opt_state = optimizer.update(grads, opt_state)
            raw = optax.apply_updates(raw, updates)
            raw = jax.lax.cond(
                i == 0, lambda r: simm.clamp_params(r), lambda r: r, raw
            )
            return (raw, opt_state), loss

        (raw, _), hist = jax.lax.scan(step, (raw, opt_state), jnp.arange(num_iters))
        return hist

    if not guarded:
        return fit

    from dis_project_tpu.training import generic

    @jax.jit
    def fit_guarded(raw, X):
        opt_state = optimizer.init(raw)

        def vg(r):
            return jax.value_and_grad(loss_fn)(r, X)

        def do_update(grads, opt_state, raw, loss_val):
            return optimizer.update(grads, opt_state, raw)

        def step(carry, i):
            raw, opt_state, good, streak, count = carry
            (raw, opt_state, good, streak, count, loss, _, fired
             ) = generic.guarded_transition(
                vg, do_update, raw, opt_state, good, streak, count
            )
            raw = jax.lax.cond(
                i == 0, lambda r: simm.clamp_params(r), lambda r: r, raw
            )
            return (raw, opt_state, good, streak, count), (loss, fired)

        init = (raw, opt_state, (raw, opt_state),
                jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
        _, (hist, flags) = jax.lax.scan(
            step, init, jnp.arange(num_iters)
        )
        return hist, flags

    return fit_guarded


def bench_ours(X, y, t, num_iters=150):
    """Our canonical-path trainer: the table-Gram gridded MLL — the same
    route ``main.py`` takes for the canonical run (bit-identical to the
    row-path MLL on the shared grid, see tests/test_gridded.py)."""
    from dis_project_tpu.models import simm

    model = simm.ExactSIMM(num_genes=5, jitter=1e-4, canonical_rows=True)
    raw0 = simm.unconstrain(simm.init_params(5, dtype=X.dtype))

    def loss_fn(raw, tg):
        return -model.mll_gridded(simm.constrain(raw), tg, y)

    wall, (hist, flags) = _time_fit(
        _make_fit(loss_fn, num_iters, guarded=True), raw0, t
    )
    return wall, hist, int(jnp.sum(flags))


def bench_reference_pattern(X, y, num_iters=150):
    """The reference's compute pattern, re-created in JAX on this device."""
    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import lfm_kernels as lfk

    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    raw0 = simm.unconstrain(simm.init_params(5, dtype=X.dtype))
    G = 5

    def scalar_kernel(params, t1, t2):
        # All four branches evaluated per scalar pair, selected by
        # flag-product switches — reference src/model.py:152-195.
        f1 = t1[2]
        f2 = t2[2]
        j = jnp.clip(t1[1].astype(jnp.int32), 0, G - 1)
        k = jnp.clip(t2[1].astype(jnp.int32), 0, G - 1)
        dj, dk = params.decay[j], params.decay[k]
        sj, sk = params.sensitivity[j], params.sensitivity[k]
        l = params.lengthscale
        kxx = lfk.k_xx(t1[0], t2[0], dj, dk, sj, sk, l)
        kff = lfk.k_ff(t1[0], t2[0], l)
        kxf = lfk.k_xf(t1[0], t2[0], dj, sj, l)
        kfx = lfk.k_xf(t2[0], t1[0], dk, sk, l)
        return (
            f1 * f2 * kxx
            + (1 - f1) * (1 - f2) * kff
            + f1 * (1 - f2) * kxf
            + (1 - f1) * f2 * kfx
        )

    def loss_fn(raw, X):
        params = simm.constrain(raw)
        K = jax.vmap(lambda a: jax.vmap(lambda b: scalar_kernel(params, a, b))(X))(X)
        n = K.shape[0]
        sigma = K + (model.jitter + params.obs_stddev**2) * jnp.eye(n, dtype=K.dtype)
        mx = model.mean_function(params, X)
        yc = y - mx
        # AD through the factorisation — no custom VJP.
        L = jnp.linalg.cholesky(sigma)
        alpha = jax.scipy.linalg.cho_solve((L, True), yc)
        logp = (
            -0.5 * yc @ alpha
            - jnp.sum(jnp.log(jnp.diagonal(L)))
            - 0.5 * n * jnp.log(2 * jnp.pi).astype(K.dtype)
        )
        return -logp

    return _time_fit(_make_fit(loss_fn, num_iters), raw0, X)


def bench_gram_chol(n=8192, genes=50, dtype=jnp.float32):
    """Gram build (Pallas vs XLA) + Cholesky throughput at the BASELINE.json
    north-star point (N=8192, f32)."""
    import numpy as np

    from dis_project_tpu.ops import gram as gram_ops
    from dis_project_tpu.ops import pallas_cholesky as pc
    from dis_project_tpu.ops import pallas_gram as pg
    from dis_project_tpu.utils.benchmarking import time_op

    rng = np.random.default_rng(0)
    t = rng.uniform(0, 12.0, n)
    gi = rng.integers(0, genes, n)
    x = jnp.asarray(np.stack([t, gi, np.ones(n)], 1), dtype)
    decay = jnp.asarray(rng.uniform(0.2, 1.0, genes), dtype)
    sens = jnp.asarray(rng.uniform(0.5, 1.5, genes), dtype)
    ell = jnp.asarray(2.5, dtype)

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    gram_s = {}
    gram_s["xla"] = time_op(
        lambda eps, x: gram_ops.gram(x + eps, decay, sens, ell), x, iters=4
    )
    if on_tpu:
        # What the model dispatch actually runs for square Grams at this
        # scale: the lower-triangle symmetric kernel.
        gram_s["pallas_sym"] = time_op(
            lambda eps, x: pg.gram_sym(x + eps, decay, sens, ell, kind="xx"),
            x,
            iters=4,
        )

    # Factor the REAL Sigma (Gram + jitter + unit obs noise), not a random
    # diagonally-dominant SPD stand-in: the r2 NaN regression (single-pass
    # bf16 matmul products corrupting the Schur complements at cond ~1e3)
    # was invisible on A A^T + N I (cond ~4). The probe doubles as a
    # correctness canary.
    A = gram_ops.gram(x, decay, sens, ell) + 1.0001 * jnp.eye(n, dtype=dtype)
    # The op the f32 MLL hot path consumes (r3): the transposed-layout
    # two-level factoriser, timed through its probe_eps dependency hook
    # (an O(1) perturbation — `A + eps` would add a full O(N^2) copy to
    # every chained execution and bill it to the factorisation).
    @jax.jit  # eager would dispatch O(nb^2) one-op programs over the tunnel
    def _canary(A):
        Lt = pc.blocked_cholesky_t(A)
        L = jnp.tril(Lt.T)
        resid = jnp.max(jnp.abs(L[:256] @ L.T[:, :256] - A[:256, :256]))
        return jnp.all(jnp.isfinite(Lt)), resid

    finite, resid = _canary(A)
    assert bool(finite), "blocked_cholesky_t produced NaN"
    assert float(resid) < 1e-1, f"reconstruction off: {float(resid)}"
    L = jax.jit(lambda A: jnp.tril(pc.blocked_cholesky_t(A).T))(A)
    chol_s = time_op(
        lambda eps, A: pc.blocked_cholesky_t(A, probe_eps=eps), A, iters=3
    )
    chol_xla_s = time_op(lambda eps, A: jnp.linalg.cholesky(A + eps), A, iters=3)
    # The quantity the MLL backward actually consumes: the mirror-free
    # tril(Sigma^{-1}) (ops.mll._mvn_bwd emits a symmetric-equivalent
    # cotangent, so the dense mirror never runs on the training path).
    inv_s = time_op(
        lambda eps, L: pc.inv_from_factor_tril(jnp.tril(L) + eps), L, iters=3
    )

    best_gram = min(gram_s.values())
    return {
        "gram_n": n,
        "gram_s": {k: round(v, 6) for k, v in gram_s.items()},
        "gram_gelems": round(n * n / best_gram / 1e9, 2),
        "chol_s": round(chol_s, 6),
        "chol_xla_s": round(chol_xla_s, 6),
        "chol_gflops": round(n**3 / 3 / chol_s / 1e9, 1),
        "chol_peak_frac": round(n**3 / 3 / chol_s / V5E_PEAK_FLOPS, 4),
        # Fraction of the f32-FAITHFUL ceiling: correctness pins every
        # O(N^3) product to 3-pass bf16 (see module header), so the honest
        # MXU rate limit for this factorisation is V5E_PEAK/3.
        "chol_f32_ceiling_frac": round(
            n**3 / 3 / chol_s / (V5E_PEAK_FLOPS / 3), 4
        ),
        "sigma_inv_s": round(inv_s, 6),
    }


def bench_train_step_at_scale(n=4096, genes=50, dtype=jnp.float32):
    """Steady-state time of ONE full exact-MLL training step (forward Gram
    + Cholesky + custom-VJP backward + Adam update) at stress scale, with
    utilization against the static roofline model."""
    import numpy as np

    from dis_project_tpu.models import simm
    from dis_project_tpu.utils.benchmarking import time_op
    from dis_project_tpu.utils.profiling import flop_report

    rng = np.random.default_rng(0)
    T = n // genes
    n = genes * T  # exact block structure
    t = np.linspace(0, 12.0, T)
    X = jnp.asarray(
        np.stack(
            [np.tile(t, genes), np.repeat(np.arange(genes), T), np.ones(n)], 1
        ),
        dtype,
    )
    y = jnp.asarray(rng.standard_normal(n) * 0.5 + 1.0, dtype)
    model = simm.ExactSIMM(num_genes=genes, jitter=1e-4, canonical_rows=True)
    raw0 = simm.unconstrain(simm.init_params(genes, dtype=dtype))
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(raw0)

    def one_step(eps, raw, opt_state):
        loss, grads = jax.value_and_grad(
            lambda r: -model.mll(simm.constrain(r), X + eps, y)
        )(raw)
        updates, _ = optimizer.update(grads, opt_state)
        return jax.tree.leaves(optax.apply_updates(raw, updates))[0]

    tp = jnp.asarray(t, dtype)

    def one_step_gridded(eps, raw, opt_state):
        loss, grads = jax.value_and_grad(
            lambda r: -model.mll_gridded(simm.constrain(r), tp + eps, y)
        )(raw)
        updates, _ = optimizer.update(grads, opt_state)
        return jax.tree.leaves(optax.apply_updates(raw, updates))[0]

    step_s = time_op(one_step, raw0, opt_state, iters=4)
    grid_s = time_op(one_step_gridded, raw0, opt_state, iters=4)
    from dis_project_tpu.utils import profiling

    report = flop_report(n)
    # forward + backward ~ 3x the forward O(N^3) work (chol + tri-inv + syrk);
    # utilisation is quoted for the best exact-MLL path (the row path with
    # the symmetric Pallas Gram overtook the table-Gram gridded path in r2).
    suffix = "" if n <= 4096 else f"_{n}"
    best = min(step_s, grid_s)
    compute_raw = report.total_flops / profiling.PEAK_MATMUL_FLOPS
    memory = report.bytes_touched / profiling.PEAK_HBM_BYTES
    frac = 3 * max(compute_raw, memory) / best
    # f32-FAITHFUL ceiling: the mandated 3-pass matmul precision derates
    # the MXU rate (x3 the compute term) — HBM bandwidth is unaffected, so
    # only the compute leg of the roofline moves (r2 review fix: deriving
    # it as 3*frac silently derated the memory bound too).
    frac_f32 = 3 * max(3 * compute_raw, memory) / best
    return {
        f"train_step_n{suffix}": n,
        f"train_step_s{suffix}": round(step_s, 6),
        f"train_step_gridded_s{suffix}": round(grid_s, 6),
        f"train_step_roofline_frac{suffix}": round(frac, 4),
        f"train_step_f32_ceiling_frac{suffix}": round(frac_f32, 4),
    }


def bench_ss_engine(n=8192, genes=64, dtype=jnp.float32):
    """One value+grad step of the O(T) state-space Kalman engine
    (ops.statespace) at the SAME gridded shape as the N=8192 train-step
    probe — the like-for-like number against ``train_step_s_8192``.

    Guarded: the probe is additive context (the engine is approximate —
    ~1e-4 nats at order 10 — so it extends the table rather than moving
    the headline); a failure degrades to an explicit note field instead
    of killing the bench.
    """
    import numpy as np

    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import statespace as ss_ops
    from dis_project_tpu.utils.benchmarking import time_op

    try:
        rng = np.random.default_rng(0)
        T = n // genes
        n = genes * T
        t = jnp.asarray(np.linspace(0, 12.0, T), dtype)
        y = jnp.asarray(rng.standard_normal(n) * 0.5 + 1.0, dtype)
        raw0 = simm.unconstrain(simm.init_params(genes, dtype=dtype))
        # parallel=None: the engine's own schedule policy (the measured
        # dispatch — sequential scan everywhere single-device since r4,
        # see ops.statespace._AUTO_PARALLEL_NOTE).
        vg = jax.value_and_grad(
            lambda r, yy: -ss_ops.lfm_mll_ss(
                simm.constrain(r), t, yy, jitter=1e-4, parallel=None
            )
        )

        def op(eps, raw, yy):
            v, g = vg(raw, yy + eps.astype(yy.dtype))
            leaves = jax.tree_util.tree_leaves(g)
            return v + sum(jnp.sum(le) for le in leaves) * 1e-30

        s = time_op(op, raw0, y, iters=3)
        return {"ss_step_n": n, "ss_step_s": round(s, 6)}
    except Exception as e:  # noqa: BLE001 — degrade honestly, never hang
        return {"ss_probe_failed": f"{type(e).__name__}: {e}"[:200]}


def bench_route_matrix(dtype=jnp.float32):
    """Per-round TPU regression numbers for every flagship route (r5,
    VERDICT r4 #3): SVI step, union-grid predict, the simm2/multisimm/
    delay state-space steps, the EKF marginal step, an 8-step HMC
    leapfrog trajectory, and a 64-draw FFBS sample — so a regression on
    any route shows in BENCH_rN.json instead of living in PARITY prose.
    Every probe is guarded: a failure degrades to a ``*_failed`` note
    field, never kills the bench."""
    import numpy as np

    from dis_project_tpu.models import (
        delaysimm, multisimm, simm, simm2, svlfm,
    )
    from dis_project_tpu.ops import statespace as ss_ops
    from dis_project_tpu.training import hmc
    from dis_project_tpu.utils.benchmarking import time_op

    rng = np.random.default_rng(0)
    out = {}

    def grad_probe(vg):
        def op(eps, raw, yy):
            v, g = vg(raw, yy + eps.astype(yy.dtype))
            leaves = jax.tree_util.tree_leaves(g)
            return v + sum(jnp.sum(le) for le in leaves) * 1e-30

        return op

    def guarded(key, fn):
        try:
            out[key] = round(fn(), 6)
        except Exception as e:  # noqa: BLE001 — degrade honestly
            out[f"{key}_failed"] = f"{type(e).__name__}: {e}"[:160]

    # 1. SVI step at the sparse100k shape (G=50, M=128, bs=2048): one
    # minibatch ELBO value+grad — the unit of work the preset repeats.
    def svi_step():
        G, M, BS, N_TOTAL = 50, 128, 2048, 100_000
        model = svlfm.SparseSIMM(num_genes=G, num_inducing=M, jitter=1e-6)
        params = svlfm.init_params(
            G, num_inducing=M, t_max=12.0, dtype=dtype
        )
        raw0 = svlfm.unconstrain(params)
        tb = rng.uniform(0, 12.0, BS)
        gb = rng.integers(0, G, BS)
        xb = jnp.asarray(np.stack([tb, gb, np.ones(BS)], 1), dtype)
        yb = jnp.asarray(rng.standard_normal(BS) * 0.5 + 1.0, dtype)
        vb = jnp.full((BS,), 0.1, dtype)
        vg = jax.value_and_grad(
            lambda r, yy: -model.elbo(
                svlfm.constrain(r), xb, yy, vb, n_total=N_TOTAL
            )
        )
        # Sub-ms op: a short chain's slope drowns in tunnel jitter
        # (measured 0.31 / 0.12 / 0.0 ms across r5 runs at iters=4);
        # 32 chained executions put the signal well above it.
        return time_op(grad_probe(vg), raw0, yb, iters=32)

    guarded("svi_step_s", svi_step)

    # 2. Union-grid smoothed predict at the dense10k-like shape
    # (G=64 train T=128, 256 test points) through the jitted
    # ``unique_dts`` bucketing — the serving read path.
    def union_predict():
        G, T, T_TEST = 64, 128, 256
        t = jnp.asarray(np.linspace(0, 12.0, T), dtype)
        # Test grid INSIDE the model's domain: the generative model
        # defines genes only from t=0 (deterministic B/D start), and a
        # negative first dt would send an expansive transition through
        # discretize (the hazard streaming_update rejects loudly).
        t_test = jnp.asarray(np.linspace(0.0, 12.0, T_TEST), dtype)
        y = jnp.asarray(rng.standard_normal(G * T) * 0.5 + 1.0, dtype)
        params = simm.init_params(G, dtype=dtype)
        u = int(
            np.unique(
                np.diff(
                    np.sort(np.concatenate([np.asarray(t), np.asarray(t_test)])),
                    prepend=0.0,
                )
            ).size
        )
        out["union_predict_unique_dts"] = u

        def op(eps, yy):
            f_mean, f_var, x_mean, x_var = ss_ops.lfm_predict_ss(
                params, t, yy + eps.astype(yy.dtype), t_test,
                noise_var=0.1, unique_dts=u,
            )
            return f_mean + f_var + jnp.sum(x_mean + x_var, axis=1)

        return time_op(op, y, iters=3)

    guarded("union_predict_s", union_predict)

    # 3-5. Family state-space MLL steps (value+grad), dense-scale shapes.
    def ss2_step():
        G, T = 32, 128  # state m = 10 + 2G = 74, same class as ss_step
        t = jnp.asarray(np.linspace(0, 12.0, T), dtype)
        y = jnp.asarray(rng.standard_normal(G * T) * 0.5 + 1.0, dtype)
        raw0 = simm2.unconstrain(simm2.init_params(G, dtype=dtype))
        vg = jax.value_and_grad(
            lambda r, yy: -ss_ops.lfm2_mll_ss(
                simm2.constrain(r), t, yy, jitter=1e-4
            )
        )
        return time_op(grad_probe(vg), raw0, y, iters=3)

    guarded("ss2_step_s", ss2_step)

    def ss_multi_step():
        G, R, T = 64, 2, 128  # state m = R*10 + G = 84
        t = jnp.asarray(np.linspace(0, 12.0, T), dtype)
        y = jnp.asarray(rng.standard_normal(G * T) * 0.5 + 1.0, dtype)
        raw0 = multisimm.unconstrain(
            multisimm.init_params(G, R, dtype=dtype)
        )
        vg = jax.value_and_grad(
            lambda r, yy: -ss_ops.multisimm_mll_ss(
                multisimm.constrain(r), t, yy, jitter=1e-4
            )
        )
        return time_op(grad_probe(vg), raw0, y, iters=3)

    guarded("ss_multi_step_s", ss_multi_step)

    def ss_delay_step():
        G, T = 16, 128  # T*G = 2048 warped filter events, state m = 26
        t = jnp.asarray(np.linspace(0, 12.0, T), dtype)
        y = jnp.asarray(rng.standard_normal(G * T) * 0.5 + 1.0, dtype)
        raw0 = delaysimm.unconstrain(
            delaysimm.init_params(G, dtype=dtype)
        )
        vg = jax.value_and_grad(
            lambda r, yy: -ss_ops.delaysimm_mll_ss(
                delaysimm.constrain(r), t, yy, jitter=1e-4
            )
        )
        return time_op(grad_probe(vg), raw0, y, iters=3)

    guarded("ss_delay_step_s", ss_delay_step)

    # 5b. Long-chain MLL, exact vs steady-state tail (r5,
    # ``stationary_after``): the scaling engine's headline pair — the
    # frozen-gain tail drops the covariance leg from every post-warmup
    # step (measured 5.6-10x at T=5e4 on CPU; this probe tracks the
    # on-device ratio per round at a tunnel-safe T).
    def ss_long(stationary):
        G, T = 10, 16384
        t = jnp.asarray(np.linspace(0, 100.0, T), dtype)
        y = jnp.asarray(rng.standard_normal(G * T) * 0.5 + 1.0, dtype)
        params = simm.init_params(G, dtype=dtype)

        def op(eps, yy):
            return ss_ops.lfm_mll_ss(
                params, t, yy + eps.astype(yy.dtype), jitter=1e-4,
                stationary_after=1024 if stationary else None,
            )

        return time_op(op, y, iters=2)

    guarded("ss_long_mll_s", lambda: ss_long(False))
    guarded("ss_long_mll_stat_s", lambda: ss_long(True))

    # 6. Extended-Kalman marginal step (nonlinear family, exp response).
    def ekf_step():
        G, T = 16, 128
        t = jnp.asarray(np.linspace(0, 12.0, T), dtype)
        y = jnp.asarray(np.abs(rng.standard_normal(G * T)) + 0.5, dtype)
        raw0 = simm.unconstrain(simm.init_params(G, dtype=dtype))
        vg = jax.value_and_grad(
            lambda r, yy: -ss_ops.nlfm_mll_ekf(
                simm.constrain(r), t, yy, response="exp", jitter=1e-4
            )
        )
        return time_op(grad_probe(vg), raw0, y, iters=3)

    guarded("ekf_step_s", ekf_step)

    # 7. One 8-step HMC leapfrog trajectory over the dense-scale
    # state-space log-density (the sampler's inner unit of work —
    # ``training.hmc._leapfrog`` on the flattened position).
    def hmc_leapfrog():
        G, T = 16, 512
        t = jnp.asarray(np.linspace(0, 12.0, T), dtype)
        y = jnp.asarray(rng.standard_normal(G * T) * 0.5 + 1.0, dtype)
        raw0 = simm.unconstrain(simm.init_params(G, dtype=dtype))
        flat0, unravel = jax.flatten_util.ravel_pytree(raw0)
        vg = jax.value_and_grad(
            lambda q: ss_ops.lfm_mll_ss(
                simm.constrain(unravel(q)), t, y, jitter=1e-4
            )
        )

        def op(eps, q0):
            q = q0 + eps.astype(q0.dtype)
            v0, g0 = vg(q)
            p0 = jnp.ones_like(q) * 0.1
            q1, p1, v1, g1 = hmc._leapfrog(
                vg, q, p0, v0, g0, 1e-3, jnp.ones_like(q), 8
            )
            return v1 + jnp.sum(q1 + p1 + g1) * 1e-30

        return time_op(op, flat0, iters=2)

    guarded("hmc_leapfrog8_s", hmc_leapfrog)

    # 8. 64 joint FFBS trajectory draws sharing one backward pass
    # (VERDICT r4 #7): should price ~one filter+backward, not 64.
    def ffbs_draws():
        G, T, T_TEST, S = 8, 512, 512, 64
        t = jnp.asarray(np.linspace(0, 12.0, T), dtype)
        t_test = jnp.asarray(np.linspace(0.02, 11.98, T_TEST), dtype)
        y = jnp.asarray(rng.standard_normal(G * T) * 0.5 + 1.0, dtype)
        params = simm.init_params(G, dtype=dtype)
        u = int(
            np.unique(
                np.diff(
                    np.sort(np.concatenate([np.asarray(t), np.asarray(t_test)])),
                    prepend=0.0,
                )
            ).size
        )
        key = jax.random.PRNGKey(0)

        def op(eps, yy):
            draws = ss_ops.posterior_sample_ss(
                params, t, yy + eps.astype(yy.dtype), t_test, key,
                noise_var=0.1, num_samples=S, unique_dts=u,
            )
            return jnp.sum(draws, axis=1)

        return time_op(op, y, iters=2)

    guarded("ffbs_draws64_s", ffbs_draws)

    return out


# Iterations per headline training program: enough to converge the
# canonical run (measured flat at ~-23.7 from ~iteration 450 on) with
# headroom; the headline divides out the tail via steps_to_target.
BENCH_ITERS = 600


def _steps_to_target(hist, target):
    """First step index whose loss is <= target (int, 1-based count)."""
    import numpy as np

    h = np.asarray(hist)
    idx = np.nonzero(h <= target)[0]
    return int(idx[0]) + 1 if idx.size else len(h)


def _finite_prefix_stats(hist):
    """(min, last, nan_from) over the finite prefix of a loss history.

    The f32 trajectory is chaotic and the reference's quirky `2l` kernel
    family is genuinely indefinite in parts of parameter space (measured:
    min eig -1.4e-3 in f64 at a mid-descent parameter point) — a long f32
    run can step into that region, NaN its Cholesky, and poison the Adam
    state for every remaining step. When that happens the headline must
    stay a number (computed over the steps that ran) and the event must be
    VISIBLE (`trajectory_nan_from_step_*`), not silently propagate NaN
    into every derived field.
    """
    import numpy as np

    h = np.asarray(hist)
    bad = np.nonzero(~np.isfinite(h))[0]
    nan_from = int(bad[0]) if bad.size else None
    fin = h[: nan_from] if nan_from is not None else h
    if fin.size == 0:
        return float("inf"), float("inf"), nan_from
    return float(fin.min()), float(fin[-1]), nan_from


def main():
    from dis_project_tpu.utils.watchdog import first_op_watchdog

    note = _setup_platform()

    # The first op is a scalar add — even a cold compile over the tunnel
    # completes in seconds — so past the bound the only plausible cause is
    # a dead tunnel (that slipped past the health probe), and a clean rc=2
    # beats an unbounded hang in the driver's bench step.
    with first_op_watchdog("bench", give_up_s=900):
        # scalar fetch: actually blocks on the tunnel
        float(jnp.ones(()) + 1.0)

    dtype = jnp.float32
    X, y, t = _build_problem(dtype)

    ours_s, ours_hist, ours_guard_count = bench_ours(
        X, y, t, num_iters=BENCH_ITERS
    )
    ref_s, ref_hist = bench_reference_pattern(X, y, num_iters=BENCH_ITERS)
    if note is None:
        probes = bench_gram_chol()
        probes.update(bench_train_step_at_scale())
        probes.update(bench_train_step_at_scale(n=8192, genes=64))
        probes.update(bench_ss_engine(n=8192, genes=64))
        probes.update(bench_route_matrix())
    else:
        # CPU fallback: keep the stress probes small — the point of the
        # fallback line is the headline + the like-for-like ratio, not
        # CPU roofline numbers.
        probes = bench_gram_chol(n=2048, genes=32)
        probes.update(bench_train_step_at_scale(n=2048, genes=32))

    import numpy as np

    ours_h = np.asarray(ours_hist)
    ref_h = np.asarray(ref_hist)
    ours_min, ours_final, ours_nan_from = _finite_prefix_stats(ours_h)
    ref_min, ref_final, ref_nan_from = _finite_prefix_stats(ref_h)
    # Equal-convergence finish line: the WORSE of the two converged minima
    # plus a tolerance both trajectories' post-convergence noise clears.
    # Minima/finals are taken over each history's finite prefix so a
    # trajectory that NaN'd partway (see _finite_prefix_stats) degrades the
    # headline honestly instead of turning every field into NaN.
    target = max(ours_min, ref_min) + 0.01
    ours_steps = _steps_to_target(ours_h, target)
    ref_steps = _steps_to_target(ref_h, target)
    ours_ttt = ours_s * ours_steps / BENCH_ITERS
    ref_ttt = ref_s * ref_steps / BENCH_ITERS

    result = {
        "metric": "p53_train_wall_clock_to_converged_mll",
        "value": round(ours_ttt, 5),
        "unit": "s",
        "vs_baseline": round(ref_ttt / ours_ttt, 3),
        "baseline": "reference compute pattern (scalar-kernel double-vmap + AD-through-Cholesky) on same device, to the same MLL target",
        "baseline_s": round(ref_ttt, 5),
        "mll_target": round(target, 6),
        "steps_to_target_ours": ours_steps,
        "steps_to_target_baseline": ref_steps,
        "wall_s_600iter_ours": round(ours_s, 5),
        "wall_s_600iter_baseline": round(ref_s, 5),
        "final_loss_ours": round(ours_final, 6),
        "final_loss_baseline": round(ref_final, 6),
        # Our loop runs the production finite guard (backtrack-and-retry):
        # the indefinite-Sigma event shows up as a recovery count, not a
        # NaN prefix (VERDICT r3 #2).
        "guard_count_ours": ours_guard_count,
        **(
            {"trajectory_nan_from_step_ours": ours_nan_from}
            if ours_nan_from is not None
            else {}
        ),
        **(
            {"trajectory_nan_from_step_baseline": ref_nan_from}
            if ref_nan_from is not None
            else {}
        ),
        "device": str(jax.devices()[0]),
        **({"note": note} if note else {}),
        **probes,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
