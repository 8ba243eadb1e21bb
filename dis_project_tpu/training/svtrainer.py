"""Minibatch SVI training loop for the sparse variational SIMM.

No reference counterpart (the reference trains an exact GP full-batch,
``src/trainer.py``); this is the trainer for the N ~ 1e5 configs. The whole
run — epoch loop, per-epoch permutation, minibatch scan — compiles to one
XLA program: static shapes throughout (batches are gathered by index from a
padded permutation so the last partial batch re-samples from the start).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from dis_project_tpu.models import svlfm
from dis_project_tpu.models.svlfm import SparseSIMM, SVLFMParams


@dataclasses.dataclass(frozen=True)
class SVTrainConfig:
    num_epochs: int = 50
    batch_size: int = 1024
    learning_rate: float = 0.01
    seed: int = 0
    # Freeze inducing locations (often preferable when z is a dense grid).
    train_z: bool = True


@dataclasses.dataclass
class SVTrainResult:
    params: SVLFMParams
    history: jnp.ndarray  # (num_epochs, batches_per_epoch) negative ELBO


def fit(
    model: SparseSIMM,
    params: SVLFMParams,
    x: jnp.ndarray,
    y: jnp.ndarray,
    variances: jnp.ndarray,
    config: SVTrainConfig = SVTrainConfig(),
    optimizer: Optional[optax.GradientTransformation] = None,
) -> SVTrainResult:
    """Stochastic ELBO maximisation over row minibatches."""
    n = x.shape[0]
    bs = min(config.batch_size, n)
    batches = -(-n // bs)
    optimizer = optimizer or optax.adam(config.learning_rate)
    y = y.reshape(-1)
    variances = variances.reshape(-1)

    def loss_fn(raw, xb, yb, vb):
        return -model.elbo(svlfm.constrain(raw), xb, yb, vb, n_total=n)

    raw0 = svlfm.unconstrain(params)
    if not config.train_z:
        optimizer = optax.multi_transform(
            {
                "opt": optimizer,
                "frozen": optax.set_to_zero(),
            },
            svlfm.SVLFMParams(
                kinetics=jax.tree.map(lambda _: "opt", params.kinetics),
                z="frozen",
                q_mu="opt",
                q_sqrt="opt",
            ),
        )
    opt_state0 = optimizer.init(raw0)

    @jax.jit
    def run(raw, opt_state):
        def epoch_fn(carry, key):
            raw, opt_state = carry
            # Padded permutation: every batch has exactly bs rows; the tail
            # batch wraps around, slightly oversampling early rows.
            perm = jax.random.permutation(key, n)
            perm = jnp.concatenate([perm, perm[: batches * bs - n]])
            idx = perm.reshape(batches, bs)

            def batch_fn(carry, bidx):
                raw, opt_state = carry
                xb, yb, vb = x[bidx], y[bidx], variances[bidx]
                loss, grads = jax.value_and_grad(loss_fn)(raw, xb, yb, vb)
                updates, opt_state = optimizer.update(grads, opt_state, raw)
                raw = optax.apply_updates(raw, updates)
                return (raw, opt_state), loss

            (raw, opt_state), losses = jax.lax.scan(batch_fn, (raw, opt_state), idx)
            return (raw, opt_state), losses

        keys = jax.random.split(jax.random.PRNGKey(config.seed), config.num_epochs)
        (raw, opt_state), history = jax.lax.scan(epoch_fn, (raw, opt_state), keys)
        return raw, history

    raw_final, history = run(raw0, opt_state0)
    return SVTrainResult(params=svlfm.constrain(raw_final), history=history)
