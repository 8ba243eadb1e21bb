"""Canonical benchmark. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Headline: wall-clock for the canonical p53 SIMM LFM training run (150 Adam
iterations to the converged MLL, the reference's ``src/main.py`` pipeline) on
the available accelerator, steady-state (post-compile).

``vs_baseline`` is the speedup over a faithful re-creation of the
*reference's computational pattern* on the same device: a scalar kernel on
(t, gene, flag) 3-vectors evaluating all four flag-switched branches per
pair, lifted with a double vmap (reference ``src/model.py:152-195,392``), and
a marginal log-likelihood differentiated *through* the Cholesky factorisation
(no custom VJP). Same math, same optimiser, same iteration count — isolating
the value of the TPU-first design (vectorised block Gram + factorisation-
reusing custom-VJP MLL).

Extra fields report a Gram+Cholesky throughput probe at N=4096 (f32).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import optax


def _build_problem(dtype=jnp.float32):
    from dis_project_tpu.data.dataset import P53Data, dataset_3d

    data = P53Data(replicate=0, source="synthetic")
    X, y, _ = dataset_3d(data)
    return jnp.asarray(X, dtype), jnp.asarray(y.reshape(-1), dtype)


def _time_fit(fit_fn, *args, repeats=3):
    out = fit_fn(*args)  # compile
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fit_fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def bench_ours(X, y, num_iters=150):
    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import mll as mll_ops

    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    raw0 = simm.unconstrain(simm.init_params(5, dtype=X.dtype))
    optimizer = optax.adam(0.01)

    def loss_fn(raw):
        return -model.mll(simm.constrain(raw), X, y)

    @jax.jit
    def fit(raw):
        opt_state = optimizer.init(raw)

        def step(carry, i):
            raw, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(raw)
            updates, opt_state = optimizer.update(grads, opt_state)
            raw = optax.apply_updates(raw, updates)
            raw = jax.lax.cond(
                i == 0, lambda r: simm.clamp_params(r), lambda r: r, raw
            )
            return (raw, opt_state), loss

        (raw, _), hist = jax.lax.scan(step, (raw, opt_state), jnp.arange(num_iters))
        return hist

    return _time_fit(fit, raw0)


def bench_reference_pattern(X, y, num_iters=150):
    """The reference's compute pattern, re-created in JAX on this device."""
    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import lfm_kernels as lfk

    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    raw0 = simm.unconstrain(simm.init_params(5, dtype=X.dtype))
    optimizer = optax.adam(0.01)
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

    def loss_fn(raw):
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

    @jax.jit
    def fit(raw):
        opt_state = optimizer.init(raw)

        def step(carry, i):
            raw, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(raw)
            updates, opt_state = optimizer.update(grads, opt_state)
            raw = optax.apply_updates(raw, updates)
            raw = jax.lax.cond(
                i == 0, lambda r: simm.clamp_params(r), lambda r: r, raw
            )
            return (raw, opt_state), loss

        (raw, _), hist = jax.lax.scan(step, (raw, opt_state), jnp.arange(num_iters))
        return hist

    return _time_fit(fit, raw0)


def bench_gram_chol(n=4096, genes=64, dtype=jnp.float32):
    """Gram build + Cholesky throughput probe at scale."""
    from dis_project_tpu.ops import gram as gram_ops

    T = n // genes
    t = jnp.linspace(0.0, 12.0, T, dtype=dtype)
    decay = jnp.linspace(0.2, 1.0, genes, dtype=dtype)
    sens = jnp.linspace(0.7, 1.3, genes, dtype=dtype)

    @jax.jit
    def build(decay, sens):
        K = gram_ops.gram_xx_blocked(t, decay, sens, jnp.asarray(2.5, dtype))
        K = K + 10.0 * jnp.eye(n, dtype=dtype)
        return jnp.linalg.cholesky(K)

    L = build(decay, sens)
    jax.block_until_ready(L)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(build(decay, sens))
        best = min(best, time.perf_counter() - t0)
    chol_flops = n**3 / 3
    return best, chol_flops / best / 1e9


def main():
    dtype = jnp.float32
    X, y = _build_problem(dtype)

    ours_s, ours_hist = bench_ours(X, y)
    ref_s, ref_hist = bench_reference_pattern(X, y)
    gram_chol_s, gram_chol_gflops = bench_gram_chol()

    result = {
        "metric": "p53_train_150iter_wall_clock",
        "value": round(ours_s, 5),
        "unit": "s",
        "vs_baseline": round(ref_s / ours_s, 3),
        "baseline": "reference compute pattern (scalar-kernel double-vmap + AD-through-Cholesky) on same device",
        "baseline_s": round(ref_s, 5),
        "final_loss_ours": round(float(ours_hist[-1]), 6),
        "final_loss_baseline": round(float(ref_hist[-1]), 6),
        "gram_chol_n4096_s": round(gram_chol_s, 5),
        "gram_chol_n4096_gflops": round(gram_chol_gflops, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
