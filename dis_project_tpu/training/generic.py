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
) -> LoopResult:
    """Minimise ``loss_fn`` over the raw pytree; ONE compiled program.

    ``clamp_raw`` (optional) is the family's raw-space identifiability
    projection, applied once before the optimizer is initialised and after
    every update — the semantics of the nlfm/delaysimm compact loops it
    replaces.  ``constrain_fn`` maps raw -> constrained parameters for the
    returned ``params`` and the optional per-step trace.  ``init_state``
    ``(raw, opt_state)`` continues an earlier run exactly (resume path).
    """
    opt_name = optimizer if isinstance(optimizer, str) else None
    if isinstance(optimizer, str):
        optimizer = make_optimizer(optimizer, learning_rate)
    constrain_fn = constrain_fn or (lambda r: r)
    is_lbfgs = opt_name == "lbfgs"

    value_and_grad = jax.value_and_grad(loss_fn)

    @jax.jit
    def run(raw0, init_state):
        if init_state is not None:
            raw, opt_state = init_state
        else:
            raw = clamp_raw(raw0) if clamp_raw is not None else raw0
            opt_state = optimizer.init(raw)

        def step_fn(carry, _):
            raw, opt_state = carry
            loss_val, grads = value_and_grad(raw)
            if is_lbfgs:
                updates, opt_state2 = optimizer.update(
                    grads, opt_state, raw,
                    value=loss_val, grad=grads, value_fn=loss_fn,
                )
            else:
                updates, opt_state2 = optimizer.update(grads, opt_state, raw)
            raw = optax.apply_updates(raw, updates)
            if clamp_raw is not None:
                raw = clamp_raw(raw)
            out = (loss_val, optax.global_norm(grads))
            if track_parameters:
                out = out + (constrain_fn(raw),)
            return (raw, opt_state2), out

        (raw_final, opt_state_final), outs = jax.lax.scan(
            step_fn, (raw, opt_state), None, length=num_iters
        )
        return raw_final, opt_state_final, outs

    raw_final, opt_state_final, outs = run(raw0, init_state)
    if track_parameters:
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

    if resume:
        latest = ckpt.latest_step(directory)
        if latest is not None and latest > 0:
            restored = ckpt.restore(
                directory,
                latest,
                template={"raw": raw, "opt_state": opt_state, "step": 0},
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
        )
        raw, opt_state = result.raw, result.opt_state
        step += seg
        histories.append(np.asarray(result.history))
        grad_norms.append(np.asarray(result.grad_norms))
        if track_parameters and result.param_trace is not None:
            traces.append(result.param_trace)
        ckpt.save(
            directory,
            {"raw": raw, "opt_state": opt_state, "step": step},
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
