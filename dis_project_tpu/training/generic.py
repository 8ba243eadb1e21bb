"""Model-agnostic jit-compiled training loop — shared route infrastructure.

``training.trainer`` implements the exact-SIMM trainer with its
reference-parity clamp schedule; the four other model families (simm2,
multisimm, nlfm, delaysimm) each used to carry a bespoke compact
``lax.scan`` fit that hard-rejected ``--metrics-path``,
``--track-parameters``, ``--optimizer lbfgs`` and ``--checkpoint-dir``
(VERDICT r2 #6).  This module is the shared core those families now
delegate to: any ``loss_fn(raw) -> scalar`` over any parameter pytree gets

- one compiled ``lax.scan`` program per (segment of the) fit,
- Adam or L-BFGS (the optax L-BFGS ``update`` needs the value/grad/value_fn
  extras — handled here once, the same shape as ``trainer.fit``),
- per-step loss + gradient-norm histories (the metrics JSONL payload),
- optional per-step constrained-parameter traces (stacked pytree),
- raw-space projection hooks for each family's identifiability clamp,
- segmented orbax checkpointing with exact resume (raw params + optimizer
  state + step), mirroring ``trainer.fit_checkpointed``.

The exact-SIMM trainer keeps its own module (its gridded/replicated loss
selection and epoch-cond clamp schedule are reference-parity surface), but
the loop semantics here are deliberately identical.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class LoopResult:
    """Outcome of :func:`fit_loop` (pytree-generic ``TrainResult``)."""

    raw: Any  # final unconstrained params
    params: Any  # constrain_fn(raw) — constrained final params
    history: jnp.ndarray  # (num_iters,) per-step loss
    grad_norms: jnp.ndarray  # (num_iters,)
    param_trace: Optional[Any] = None  # stacked constrained params
    opt_state: Optional[Any] = None
    guard_flags: Optional[jnp.ndarray] = None  # (num_iters,) bool — guard fired
    # Final (good, streak, count) guard carry — pass back as
    # ``init_guard`` so segmented runs reproduce the unsegmented one
    # exactly (the escalation ladder and backtrack point survive the
    # segment boundary).
    guard_state: Optional[Tuple] = None

    @property
    def guard_count(self) -> int:
        """Number of finite-guard events (non-finite loss/grad recoveries)."""
        if self.guard_flags is None:
            return 0
        return int(jnp.sum(self.guard_flags))


def tree_isfinite(tree) -> jnp.ndarray:
    """Scalar bool: every leaf of ``tree`` is entirely finite."""
    leaves = [jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree.leaves(tree)]
    return functools.reduce(jnp.logical_and, leaves, jnp.asarray(True))


def guarded_transition(value_and_grad, do_update, raw, opt_state, good,
                       streak, count):
    """One finite-guarded optimizer transition (shared by both train loops).

    The measured failure mode this protects against (PARITY.md r3 item 2):
    the reference's quirky ``2l`` kernel family is genuinely indefinite in
    reachable parameter regions, so one Adam step can land on a non-PSD
    Sigma, NaN the Cholesky, and poison the optimizer moments for every
    remaining step.  Skipping the update alone cannot recover — the *current*
    point is the poisoned one — so the guard keeps the last known-good
    ``(raw, opt_state)`` and, on a non-finite loss or gradient, **backtracks**
    to it and retries the same update with a scale from the escalation
    ladder ``1/2, 2, 1/4, 4, 1/8, 8, ...`` (consecutive-failure streak
    ``s`` -> ``0.5^k`` for odd ``s``, ``2^k`` for even, ``k = (s+1)//2``,
    capped at ``k=8``).  Shortened retries land short of a *narrow* non-PSD
    pocket; lengthened ones hop over a *wide* one — either way the optimizer
    state is never contaminated and the trajectory re-converges
    (tests/test_trainer.py::TestFiniteGuard).

    On a clean trajectory the guard applies the identical update rule
    (updates go through unscaled); the only residual differences vs the
    unguarded loop are XLA fusion-reordering roundoff from the added
    ``lax.cond`` (measured ~1e-15 per step, amplified slowly by chaotic
    trajectories — tests pin early-history agreement at 1e-9 rel).

    ``do_update(grads, opt_state, raw, loss_val) -> (updates, new_opt_state)``
    wraps the optimizer (the lbfgs value/grad/value_fn extras live with the
    caller).  Returns ``(raw, opt_state, good, streak, count, loss, grads,
    guard_fired)``; ``loss``/``grads`` are the values at the point the
    applied update was computed from (the good point on a guard step, so the
    recorded history stays finite — the event itself is surfaced via
    ``guard_fired`` / ``guard_count``).
    """
    loss_val, grads = value_and_grad(raw)
    ok = jnp.isfinite(loss_val) & tree_isfinite(grads)

    def good_branch(_):
        updates, opt2 = do_update(grads, opt_state, raw, loss_val)
        new_raw = optax.apply_updates(raw, updates)
        return (new_raw, opt2, (raw, opt_state), jnp.zeros_like(streak),
                count, loss_val, grads)

    def bad_branch(_):
        g_raw, g_opt = good
        loss_g, grads_g = value_and_grad(g_raw)
        # The backtrack point can itself be non-finite in exactly one
        # case: the INITIAL point (``good`` is otherwise only ever set
        # from a point that just evaluated finite). Applying updates
        # computed from NaN gradients would wander the trajectory to
        # all-NaN; freeze at the good point instead (scale -> 0) so the
        # run sits still and the recorded non-finite losses point at the
        # real problem — a non-finite starting point.
        ok_g = jnp.isfinite(loss_g) & tree_isfinite(grads_g)
        updates, opt2 = do_update(grads_g, g_opt, g_raw, loss_g)
        s = streak + 1
        k = jnp.minimum((s + 1) // 2, 8)
        dt = jnp.result_type(loss_g)
        scale = jnp.where(
            s % 2 == 1,
            jnp.power(jnp.asarray(0.5, dt), k),
            jnp.power(jnp.asarray(2.0, dt), k),
        )
        scale = jnp.where(ok_g, scale, jnp.zeros_like(scale))
        scaled = jax.tree.map(lambda u: u * scale.astype(u.dtype), updates)
        new_raw = optax.apply_updates(g_raw, scaled)
        # 0 * NaN is still NaN and the optimizer moments also saw the NaN
        # gradients — on the freeze path keep raw AND opt state verbatim.
        new_raw = jax.tree.map(
            lambda a, b: jnp.where(ok_g, a, b), new_raw, g_raw
        )
        opt2 = jax.tree.map(lambda a, b: jnp.where(ok_g, a, b), opt2, g_opt)
        return new_raw, opt2, (g_raw, g_opt), s, count + 1, loss_g, grads_g

    out = jax.lax.cond(ok, good_branch, bad_branch, None)
    return out + (jnp.logical_not(ok),)


def make_optimizer(name: str, learning_rate: float):
    if name == "adam":
        return optax.adam(learning_rate)
    if name == "lbfgs":
        return optax.lbfgs()
    raise ValueError(f"unknown optimizer {name!r}")


def fit_loop(
    loss_fn: Callable[[Any], jnp.ndarray],
    raw0: Any,
    *,
    num_iters: int,
    learning_rate: float = 0.01,
    optimizer: Any = "adam",
    constrain_fn: Optional[Callable[[Any], Any]] = None,
    clamp_raw: Optional[Callable[[Any], Any]] = None,
    track_parameters: bool = False,
    init_state: Optional[Tuple[Any, Any]] = None,
    finite_guard: bool = True,
    init_guard: Optional[Tuple] = None,
) -> LoopResult:
    """Minimise ``loss_fn`` over the raw pytree; ONE compiled program.

    ``clamp_raw`` (optional) is the family's raw-space identifiability
    projection, applied once before the optimizer is initialised and after
    every update — the semantics of the nlfm/delaysimm compact loops it
    replaces.  ``constrain_fn`` maps raw -> constrained parameters for the
    returned ``params`` and the optional per-step trace.  ``init_state``
    ``(raw, opt_state)`` continues an earlier run exactly (resume path).

    ``finite_guard`` (default on) backtracks to the last good state on
    non-finite loss/grad instead of poisoning the optimizer state — see
    :func:`guarded_transition`; same update rule as the unguarded loop on
    clean trajectories.
    """
    opt_name = optimizer if isinstance(optimizer, str) else None
    if isinstance(optimizer, str):
        optimizer = make_optimizer(optimizer, learning_rate)
    constrain_fn = constrain_fn or (lambda r: r)
    is_lbfgs = opt_name == "lbfgs"

    value_and_grad = jax.value_and_grad(loss_fn)

    def do_update(grads, opt_state, raw, loss_val):
        if is_lbfgs:
            return optimizer.update(
                grads, opt_state, raw,
                value=loss_val, grad=grads, value_fn=loss_fn,
            )
        return optimizer.update(grads, opt_state, raw)

    @jax.jit
    def run(raw0, init_state, init_guard):
        if init_state is not None:
            raw, opt_state = init_state
        else:
            raw = clamp_raw(raw0) if clamp_raw is not None else raw0
            opt_state = optimizer.init(raw)

        def step_fn(carry, _):
            if finite_guard:
                raw, opt_state, good, streak, count = carry
                (raw, opt_state2, good, streak, count, loss_val, grads,
                 fired) = guarded_transition(
                    value_and_grad, do_update, raw, opt_state, good,
                    streak, count,
                )
            else:
                raw, opt_state = carry
                loss_val, grads = value_and_grad(raw)
                updates, opt_state2 = do_update(grads, opt_state, raw, loss_val)
                raw = optax.apply_updates(raw, updates)
            if clamp_raw is not None:
                raw = clamp_raw(raw)
            out = (loss_val, optax.global_norm(grads))
            if finite_guard:
                out = out + (fired,)
            if track_parameters:
                out = out + (constrain_fn(raw),)
            carry = (
                (raw, opt_state2, good, streak, count)
                if finite_guard
                else (raw, opt_state2)
            )
            return carry, out

        if finite_guard:
            good0, streak0, count0 = (
                init_guard
                if init_guard is not None
                else ((raw, opt_state), jnp.asarray(0, jnp.int32),
                      jnp.asarray(0, jnp.int32))
            )
            init_carry = (raw, opt_state, good0, streak0, count0)
        else:
            init_carry = (raw, opt_state)
        final_carry, outs = jax.lax.scan(
            step_fn, init_carry, None, length=num_iters
        )
        guard_final = final_carry[2:] if finite_guard else None
        return final_carry[0], final_carry[1], guard_final, outs

    raw_final, opt_state_final, guard_final, outs = run(
        raw0, init_state, init_guard
    )
    guard_flags = None
    if finite_guard:
        if track_parameters:
            history, grad_norms, guard_flags, trace = outs
        else:
            history, grad_norms, guard_flags = outs
            trace = None
    elif track_parameters:
        history, grad_norms, trace = outs
    else:
        history, grad_norms = outs
        trace = None
    return LoopResult(
        raw=raw_final,
        params=jax.jit(constrain_fn)(raw_final),
        history=history,
        grad_norms=grad_norms,
        param_trace=trace,
        opt_state=opt_state_final,
        guard_flags=guard_flags,
        guard_state=guard_final,
    )


def fit_checkpointed(
    loss_fn: Callable[[Any], jnp.ndarray],
    raw0: Any,
    *,
    num_iters: int,
    directory: str,
    checkpoint_every: int = 50,
    learning_rate: float = 0.01,
    optimizer: Any = "adam",
    constrain_fn: Optional[Callable[[Any], Any]] = None,
    clamp_raw: Optional[Callable[[Any], Any]] = None,
    track_parameters: bool = False,
    resume: bool = True,
) -> LoopResult:
    """Fault-tolerant :func:`fit_loop`: ``checkpoint_every``-step segments
    with (raw, opt_state, step) persisted via orbax between segments; a
    rerun resumes *exactly* (optimizer moments included) from the latest
    checkpoint in ``directory`` — the generic counterpart of
    ``trainer.fit_checkpointed``."""
    import numpy as np

    from dis_project_tpu.training import checkpoint as ckpt

    opt = (
        make_optimizer(optimizer, learning_rate)
        if isinstance(optimizer, str)
        else optimizer
    )
    opt_arg = optimizer  # keep the string so fit_loop knows lbfgs extras
    raw = jax.jit(clamp_raw)(raw0) if clamp_raw is not None else raw0
    opt_state = opt.init(raw)
    step = 0
    guard = None  # (good, streak, count) threaded across segments

    def _guard_ckpt(g):
        good, streak, count = g
        return {"guard_raw": good[0], "guard_opt": good[1],
                "guard_streak": streak, "guard_count": count}

    if resume:
        latest = ckpt.latest_step(directory)
        if latest is not None and latest > 0:
            guard0 = ((raw, opt_state), jnp.asarray(0, jnp.int32),
                      jnp.asarray(0, jnp.int32))
            try:
                restored = ckpt.restore(
                    directory,
                    latest,
                    template={"raw": raw, "opt_state": opt_state,
                              "step": 0, **_guard_ckpt(guard0)},
                )
                guard = (
                    (restored["guard_raw"], restored["guard_opt"]),
                    restored["guard_streak"], restored["guard_count"],
                )
            except Exception:
                # Pre-r4 checkpoint without the guard carry: resume the
                # trajectory; the guard re-anchors at the restored point
                # (exactly the old behavior).
                restored = ckpt.restore(
                    directory,
                    latest,
                    template={"raw": raw, "opt_state": opt_state,
                              "step": 0},
                )
            raw, opt_state = restored["raw"], restored["opt_state"]
            step = int(restored["step"])

    histories, grad_norms, traces = [], [], []
    result = None
    while step < num_iters:
        seg = min(checkpoint_every, num_iters - step)
        result = fit_loop(
            loss_fn,
            raw,
            num_iters=seg,
            learning_rate=learning_rate,
            optimizer=opt_arg if isinstance(opt_arg, str) else opt,
            constrain_fn=constrain_fn,
            clamp_raw=clamp_raw,
            track_parameters=track_parameters,
            init_state=(raw, opt_state),
            init_guard=guard,
        )
        raw, opt_state = result.raw, result.opt_state
        guard = result.guard_state
        step += seg
        histories.append(np.asarray(result.history))
        grad_norms.append(np.asarray(result.grad_norms))
        if track_parameters and result.param_trace is not None:
            traces.append(result.param_trace)
        # Persist the guard carry too: a resumed run then continues the
        # escalation ladder AND keeps a known-good backtrack point even
        # if the segment's final update landed in a non-finite region
        # (the poisoned-save scenario).
        ckpt.save(
            directory,
            {"raw": raw, "opt_state": opt_state, "step": step,
             **_guard_ckpt(guard)},
            step=step,
        )

    constrain_fn = constrain_fn or (lambda r: r)
    if result is None:  # already complete on entry
        return LoopResult(
            raw=raw,
            params=jax.jit(constrain_fn)(raw),
            history=jnp.zeros((0,)),
            grad_norms=jnp.zeros((0,)),
            opt_state=opt_state,
        )
    trace = None
    if traces:
        trace = jax.tree.map(lambda *xs: jnp.concatenate(xs), *traces)
    return dataclasses.replace(
        result,
        history=jnp.asarray(np.concatenate(histories)),
        grad_norms=jnp.asarray(np.concatenate(grad_norms)),
        param_trace=trace,
    )
