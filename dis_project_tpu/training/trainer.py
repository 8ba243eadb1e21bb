"""Jit-compiled training loop for the exact SIMM LFM.

Reproduces the reference ``JaxTrainer`` semantics (``src/trainer.py:36-228``)
as one compiled ``lax.scan`` program:

- parameters live in *unconstrained* space during optimisation; the loss
  constrains them on the fly (reference ``src/trainer.py:75,102-103``),
- every ``num_steps_per_epoch`` steps a ``lax.cond`` re-fixes the p21
  sensitivity/decay — applied to the RAW values mid-training, exactly like
  the reference (``src/trainer.py:151-158,205-210``; with the default 1000
  steps/epoch and 150 iters the cond only fires at step 0),
- after the scan, parameters are constrained and (if ``fix_params``) clamped
  once more in *constrained* space (reference ``src/trainer.py:218-222``).

Beyond the reference it adds first-class metrics (per-step loss + optional
parameter traces as stacked pytrees — the reference plumbs ``track_parameters``
but never populates it on the JAX path, SURVEY.md §5), orbax checkpointing
with resume, and gradient-norm telemetry.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dis_project_tpu.models import simm
from dis_project_tpu.models.simm import ExactSIMM, SIMMParams
from dis_project_tpu.training import generic


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Canonical values mirror reference ``src/main.py:41-59``."""

    num_iters: int = 150
    learning_rate: float = 0.01
    fix_params: bool = True
    num_steps_per_epoch: int = 1000
    clamp_gene: int = 3  # p21 in the canonical DDB2,BIK,DR5,p21,SESN1 order
    clamp_sensitivity: float = 1.0
    clamp_decay: float = 0.8
    track_parameters: bool = False
    optimizer: str = "adam"  # or "lbfgs"
    # Backtrack-and-retry on non-finite loss/grad (the measured indefinite-
    # Sigma event, PARITY.md r3 item 2) instead of poisoning the Adam state;
    # identical update rule on clean trajectories — see
    # generic.guarded_transition.
    finite_guard: bool = True


@dataclasses.dataclass
class TrainResult:
    params: SIMMParams
    history: jnp.ndarray  # (num_iters,) per-step loss
    grad_norms: jnp.ndarray  # (num_iters,)
    param_trace: Optional[SIMMParams] = None  # stacked constrained params
    raw_params: Optional[SIMMParams] = None  # final unconstrained params
    opt_state: Optional[object] = None  # final optimizer state (resume)
    guard_flags: Optional[jnp.ndarray] = None  # (num_iters,) bool
    # Final (good, streak, count) guard carry — pass back as fit()'s
    # init_guard so segmented runs match the unsegmented one exactly.
    guard_state: Optional[tuple] = None

    @property
    def guard_count(self) -> int:
        """Number of finite-guard recovery events during the fit."""
        if self.guard_flags is None:
            return 0
        return int(jnp.sum(self.guard_flags))


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    if config.optimizer == "adam":
        return optax.adam(config.learning_rate)
    if config.optimizer == "lbfgs":
        return optax.lbfgs()
    raise ValueError(f"unknown optimizer {config.optimizer!r}")


def fit(
    model: ExactSIMM,
    params: SIMMParams,
    x: jnp.ndarray,
    y: jnp.ndarray,
    config: TrainConfig = TrainConfig(),
    optimizer: Optional[optax.GradientTransformation] = None,
    init_state: Optional[Tuple] = None,
    step_offset: int = 0,
    gridded: Optional[Tuple] = None,
    init_guard: Optional[Tuple] = None,
) -> TrainResult:
    """Train to the (negative) exact MLL. The full loop is one XLA program.

    ``init_state``: optional ``(raw_params, opt_state)`` to continue an
    earlier run exactly (optimizer moments included); ``step_offset``
    shifts the global step counter so the epoch-clamp schedule is
    preserved across segments — the resume path of
    :func:`fit_checkpointed`.

    ``gridded``: optional ``(timepoints, replicates)`` promise that the
    rows are canonical gene-major grid blocks (what ``dataset_3d``
    produces) — routes the loss through ``model.mll_replicated``: the
    table-based Gram build plus the Kronecker replicate diagonalisation
    (exact to 1e-12 vs the row path, R^3-fold cheaper factorisation).
    """
    optimizer = optimizer or make_optimizer(config)
    y = y.reshape(-1)

    if gridded is not None:
        timepoints, replicates = gridded
        # The table-based Gram assumes a UNIFORM grid (its delta table is
        # indexed by a - b); a shared-but-irregular grid would silently
        # produce a wrong covariance. Fall back to the always-correct row
        # path when the spacing is irregular — OR when it cannot be
        # verified at all (traced timepoints: the op's guard must pass
        # tracers to stay traceable, but a fallback CHOOSER must fail
        # closed, r2 review finding). Same predicate as the op's hard
        # guard on concrete grids, so the two never diverge.
        from dis_project_tpu.ops.gram import is_uniform_grid

        if isinstance(timepoints, jax.core.Tracer) or not is_uniform_grid(
            timepoints
        ):
            gridded = None

    if gridded is not None:

        def loss_fn(raw):
            return -model.mll_replicated(
                simm.constrain(raw), timepoints, y, replicates
            )

    else:

        def loss_fn(raw):
            return -model.mll(simm.constrain(raw), x, y)

    def clamp_raw(raw):
        return simm.clamp_params(
            raw,
            gene_index=config.clamp_gene,
            sensitivity=config.clamp_sensitivity,
            decay=config.clamp_decay,
        )

    if init_state is not None:
        raw0, opt_state0 = init_state
    else:
        raw0 = simm.unconstrain(params)
        opt_state0 = optimizer.init(raw0)

    value_and_grad = jax.value_and_grad(loss_fn)

    def do_update(grads, opt_state, raw, loss_val):
        if config.optimizer == "lbfgs":
            return optimizer.update(
                grads, opt_state, raw, value=loss_val, grad=grads,
                value_fn=loss_fn,
            )
        return optimizer.update(grads, opt_state, raw)

    def step_fn(carry, step):
        if config.finite_guard:
            raw, opt_state, good, streak, count = carry
            (raw, opt_state, good, streak, count, loss_val, grads,
             fired) = generic.guarded_transition(
                value_and_grad, do_update, raw, opt_state, good, streak, count
            )
        else:
            raw, opt_state = carry
            loss_val, grads = value_and_grad(raw)
            updates, opt_state = do_update(grads, opt_state, raw, loss_val)
            raw = optax.apply_updates(raw, updates)
        # fix_params is STATIC: skip the cond entirely when disabled (a
        # traced-False cond would still trace clamp_raw's both branches —
        # and clamp_params now raises loudly on out-of-bounds indices,
        # e.g. shared-kinetics (1,)-shaped params with the default gene 3).
        if config.fix_params:
            raw = jax.lax.cond(
                step % config.num_steps_per_epoch == 0,
                clamp_raw,
                lambda p: p,
                raw,
            )
        grad_norm = optax.global_norm(grads)
        out = (loss_val, grad_norm)
        if config.finite_guard:
            out = out + (fired,)
        if config.track_parameters:
            out = out + (simm.constrain(raw),)
        carry = (
            (raw, opt_state, good, streak, count)
            if config.finite_guard
            else (raw, opt_state)
        )
        return carry, out

    if config.finite_guard:
        good0, streak0, count0 = (
            init_guard
            if init_guard is not None
            else ((raw0, opt_state0), jnp.asarray(0, jnp.int32),
                  jnp.asarray(0, jnp.int32))
        )
        init_carry = (raw0, opt_state0, good0, streak0, count0)
    else:
        init_carry = (raw0, opt_state0)
    final_carry, outs = jax.lax.scan(
        step_fn,
        init_carry,
        jnp.arange(step_offset, step_offset + config.num_iters),
    )
    raw_final, opt_state_final = final_carry[0], final_carry[1]
    guard_state_final = final_carry[2:] if config.finite_guard else None

    trained = simm.constrain(raw_final)
    if config.fix_params:
        trained = simm.clamp_params(
            trained,
            gene_index=config.clamp_gene,
            sensitivity=config.clamp_sensitivity,
            decay=config.clamp_decay,
        )

    guard_flags = None
    if config.finite_guard:
        if config.track_parameters:
            history, grad_norms, guard_flags, trace = outs
        else:
            history, grad_norms, guard_flags = outs
            trace = None
    elif config.track_parameters:
        history, grad_norms, trace = outs
    else:
        history, grad_norms = outs
        trace = None
    return TrainResult(
        params=trained,
        history=history,
        grad_norms=grad_norms,
        param_trace=trace,
        raw_params=raw_final,
        opt_state=opt_state_final,
        guard_flags=guard_flags,
        guard_state=guard_state_final,
    )


def fit_checkpointed(
    model: ExactSIMM,
    params: SIMMParams,
    x: jnp.ndarray,
    y: jnp.ndarray,
    config: TrainConfig,
    directory: str,
    checkpoint_every: int = 50,
) -> TrainResult:
    """Fault-tolerant training: run in ``checkpoint_every``-step segments,
    persisting (raw params, optimizer state, step) between segments with
    orbax, and resume *exactly* (Adam moments included) from the latest
    checkpoint in ``directory`` if one exists — kill the process at any
    point and rerunning continues where it left off (SURVEY.md §5:
    failure detection / elastic recovery, absent in the reference)."""
    import numpy as np

    from dis_project_tpu.training import checkpoint as ckpt

    optimizer = make_optimizer(config)
    raw = simm.unconstrain(params)
    opt_state = optimizer.init(raw)
    step = 0

    guard = None  # (good, streak, count) threaded across segments

    def _guard_ckpt(g):
        good, streak, count = g
        return {"guard_raw": good[0], "guard_opt": good[1],
                "guard_streak": streak, "guard_count": count}

    latest = ckpt.latest_step(directory)
    if latest is not None and latest > 0:
        guard0 = ((raw, opt_state), jnp.asarray(0, jnp.int32),
                  jnp.asarray(0, jnp.int32))
        try:
            restored = ckpt.restore(
                directory,
                latest,
                template={"raw": raw, "opt_state": opt_state, "step": 0,
                          **_guard_ckpt(guard0)},
            )
            guard = (
                (restored["guard_raw"], restored["guard_opt"]),
                restored["guard_streak"], restored["guard_count"],
            )
        except Exception:
            # Pre-r4 checkpoint without the guard carry: the guard
            # re-anchors at the restored point (the old behavior).
            restored = ckpt.restore(
                directory,
                latest,
                template={"raw": raw, "opt_state": opt_state, "step": 0},
            )
        raw, opt_state = restored["raw"], restored["opt_state"]
        step = int(restored["step"])

    histories, grad_norms, guard_flags = [], [], []
    result = None
    while step < config.num_iters:
        seg = min(checkpoint_every, config.num_iters - step)
        seg_cfg = dataclasses.replace(config, num_iters=seg)
        result = fit(
            model, params, x, y, seg_cfg, optimizer=optimizer,
            init_state=(raw, opt_state), step_offset=step,
            init_guard=guard,
        )
        raw, opt_state = result.raw_params, result.opt_state
        guard = result.guard_state
        step += seg
        histories.append(np.asarray(result.history))
        grad_norms.append(np.asarray(result.grad_norms))
        if result.guard_flags is not None:
            guard_flags.append(np.asarray(result.guard_flags))
        # Persist the guard carry too: a resumed run continues the
        # escalation ladder and keeps a known-good backtrack point even
        # if the segment's final update landed non-finite.
        save_payload = {"raw": raw, "opt_state": opt_state, "step": step}
        if guard is not None:
            save_payload.update(_guard_ckpt(guard))
        ckpt.save(directory, save_payload, step=step)

    if result is None:  # already complete on entry
        trained = simm.constrain(raw)
        if config.fix_params:
            # Same clamp values as fit()'s final clamp — a resumed no-op
            # rerun must return the same parameters the original run did.
            trained = simm.clamp_params(
                trained,
                gene_index=config.clamp_gene,
                sensitivity=config.clamp_sensitivity,
                decay=config.clamp_decay,
            )
        return TrainResult(
            params=trained,
            history=jnp.zeros((0,)),
            grad_norms=jnp.zeros((0,)),
            raw_params=raw,
            opt_state=opt_state,
        )
    return dataclasses.replace(
        result,
        history=jnp.asarray(np.concatenate(histories)),
        grad_norms=jnp.asarray(np.concatenate(grad_norms)),
        guard_flags=(
            jnp.asarray(np.concatenate(guard_flags)) if guard_flags else None
        ),
    )
