"""Accurate device timing over asynchronous / tunneled runtimes.

Two failure modes make naive timing wrong on this stack:

1. ``jax.block_until_ready`` does not actually block through the axon remote
   TPU tunnel — dispatch returns immediately and the wall-clock reads ~0.
   Only a host fetch (``float(...)`` / ``np.asarray``) forces completion.
2. Re-dispatching the *same* executable on the *same* inputs can be served
   from a replay cache, and inside one program XLA CSEs identical pure
   subcomputations — repeated identical ops measure nothing.

:func:`time_op` defeats both: it chains ``iters`` executions of the op
inside ONE jitted program, threading a scalar carry through every iteration
(each call's input depends on the previous call's output, so the chain is
sequential and CSE-proof), fetches a single scalar at the end (one ~30 ms
tunnel round-trip), and runs two chain lengths so the fixed
dispatch+fetch+round-trip overhead cancels in the slope.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def time_op(op, *args, iters: int = 8, repeats: int = 3) -> float:
    """Seconds per execution of ``op``.

    ``op(eps, *args) -> array`` MUST fold the scalar ``eps`` into its inputs
    (e.g. ``lambda eps, x: kernel(x + eps)``) so successive chained calls
    are data-dependent; ``eps`` stays numerically negligible (~1e-30 scale).
    """

    def chain(n):
        @jax.jit
        def run(eps0, *a):
            def body(_, eps):
                out = op(eps, *a)
                # Full reduction: consuming only one element would let XLA
                # dead-code-eliminate most of the op (e.g. shrink a matmul
                # to a single row); the sum forces every element live.
                return eps + jnp.sum(out).astype(eps.dtype) * 1e-30

            return jax.lax.fori_loop(0, n, body, eps0)

        return run

    short, long_ = chain(iters), chain(3 * iters)
    # The tunnel also memoises (executable, inputs) -> result across calls,
    # so every timed call gets a fresh (numerically negligible) seed.
    seeds = iter(jnp.asarray(k * 1e-30, jnp.float32) for k in range(1000))
    float(short(next(seeds), *args))  # compile + warm
    float(long_(next(seeds), *args))

    def best_wall(f):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(f(next(seeds), *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = best_wall(short)
    t_long = best_wall(long_)
    return max((t_long - t_short) / (2 * iters), 1e-9)


def fetch_scalar(x) -> float:
    """Force execution and fetch a device scalar (the only reliable sync
    point over the tunnel)."""
    return float(jnp.ravel(x)[0])
