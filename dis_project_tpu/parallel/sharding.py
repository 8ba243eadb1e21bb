"""Mesh-sharded training: ensemble data-parallelism x Gram model-parallelism.

The unit of scale-out for exact-GP LFMs is different from neural nets: there
is no token/batch dimension, so the parallel axes are

- **ensemble (dp)** — independent model instances (gene-subset ablations,
  per-replicate fits, random restarts: the reference's entire
  ``src/plots/ablation`` matrix re-expressed as one SPMD program) sharded
  over the ``"data"`` mesh axis,
- **Gram rows (tp/sp)** — each member's (N, N) covariance row-block-sharded
  over the ``"model"`` axis, so the erf/exp Gram algebra executes where the
  rows live; XLA inserts the all-gathers the per-member Cholesky needs over
  ICI.

Everything is expressed with `NamedSharding` annotations +
``with_sharding_constraint`` inside one jitted step — no hand-written
collectives; the sharded Cholesky upgrade slots in behind ``ops.mll``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dis_project_tpu.models import simm
from dis_project_tpu.models.simm import ExactSIMM, SIMMParams
from dis_project_tpu.ops import mll as mll_ops


def replicate_params(params: SIMMParams, ensemble: int) -> SIMMParams:
    """Stack one param pytree into an ensemble batch (leading dim E)."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (ensemble,) + x.shape), params
    )


def ensemble_shardings(mesh: Mesh):
    """(param_batch, data, scalar) shardings for the ensemble step."""
    batched = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    return batched, replicated


def _make_ensemble_step_core(
    model: ExactSIMM,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    fix_params: bool = True,
    clamp_gene: int = 3,
) -> Callable:
    """The un-jitted SPMD step body — shared by the one-off jitted step
    (:func:`make_ensemble_train_step`) and the scanned whole-fit program
    (:func:`fit_ensemble`)."""
    gram_spec = NamedSharding(mesh, P("data", "model", None))

    def sigma_fn(raw, X):
        params = simm.constrain(raw)
        K = model.gram(params, X)
        return mll_ops.add_diagonal(K, model.jitter + params.obs_stddev**2)

    def mean_fn(raw, X):
        return model.mean_function(simm.constrain(raw), X)

    def batched_loss(raw_batch, X, y_batch):
        sigmas = jax.vmap(lambda r: sigma_fn(r, X))(raw_batch)  # (E, N, N)
        sigmas = jax.lax.with_sharding_constraint(sigmas, gram_spec)
        means = jax.vmap(lambda r: mean_fn(r, X))(raw_batch)  # (E, N)
        logps = jax.vmap(mll_ops.mvn_logpdf)(y_batch, means, sigmas)
        return -jnp.sum(logps), -logps

    def clamp(raw_batch):
        return jax.vmap(
            lambda r: simm.clamp_params(r, gene_index=clamp_gene)
        )(raw_batch)

    def train_step(raw_batch, opt_state, X, y_batch, step):
        (_, losses), grads = jax.value_and_grad(batched_loss, has_aux=True)(
            raw_batch, X, y_batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, raw_batch)
        raw_batch = optax.apply_updates(raw_batch, updates)
        if fix_params:
            raw_batch = jax.lax.cond(step == 0, clamp, lambda p: p, raw_batch)
        return raw_batch, opt_state, losses

    return train_step


def make_ensemble_train_step(
    model: ExactSIMM,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    fix_params: bool = True,
    clamp_gene: int = 3,
) -> Callable:
    """Build the jitted SPMD training step.

    Signature of the returned step:
        (raw_batch, opt_state, X, y_batch, step) ->
            (raw_batch, opt_state, losses)

    ``raw_batch``: unconstrained SIMMParams with leading ensemble dim E
    (sharded over "data"); ``X``: (N, 3) rows, replicated; ``y_batch``:
    (E, N) per-member targets (sharded over "data"); ``losses``: (E,).

    For a full training run prefer :func:`fit_ensemble`, which compiles the
    whole loop into ONE ``lax.scan`` program (one dispatch per fit instead
    of one per step — the per-dispatch round-trip over a tunneled device is
    ~30 ms, so 150 eager steps would spend more time in flight than in
    compute).
    """
    core = _make_ensemble_step_core(
        model, mesh, optimizer, fix_params=fix_params, clamp_gene=clamp_gene
    )
    return partial(jax.jit, donate_argnums=(0, 1))(core)


def fit_ensemble(
    model: ExactSIMM,
    params: SIMMParams,
    mesh: Mesh,
    X: jnp.ndarray,
    y_batch: jnp.ndarray,
    num_iters: int = 150,
    learning_rate: float = 0.01,
    fix_params: bool = True,
    clamp_gene: int = 3,
) -> Tuple[SIMMParams, jnp.ndarray]:
    """Train an ensemble of E models (one per row of ``y_batch``) as a
    single SPMD program over ``mesh``. Returns (constrained param batch,
    (num_iters, E) loss history).

    The entire ``num_iters`` loop is ONE compiled ``lax.scan`` program
    (same shape as the single-model ``training.trainer.fit``): one device
    dispatch per fit, with the per-step losses as the scan output.

    If E is not divisible by the "data" axis size the batch is padded by
    repeating the final member and the padding is sliced off the results.
    """
    E = y_batch.shape[0]
    data_size = mesh.shape["data"]
    pad = (-E) % data_size
    if pad:
        y_batch = jnp.concatenate(
            [y_batch, jnp.broadcast_to(y_batch[-1:], (pad,) + y_batch.shape[1:])]
        )
    optimizer = optax.adam(learning_rate)
    core = _make_ensemble_step_core(
        model, mesh, optimizer, fix_params=fix_params, clamp_gene=clamp_gene
    )

    batched_sh, replicated_sh = ensemble_shardings(mesh)
    raw = jax.device_put(
        jax.vmap(simm.unconstrain)(replicate_params(params, E + pad)), batched_sh
    )
    X = jax.device_put(X, replicated_sh)
    y_batch = jax.device_put(y_batch, batched_sh)

    @partial(jax.jit, donate_argnums=(0,))
    def fit(raw, X, y_batch):
        opt_state = optimizer.init(raw)

        def body(carry, step):
            raw, opt_state = carry
            raw, opt_state, losses = core(raw, opt_state, X, y_batch, step)
            return (raw, opt_state), losses

        (raw, _), hist = jax.lax.scan(
            body, (raw, opt_state), jnp.arange(num_iters)
        )
        trained = jax.vmap(simm.constrain)(raw)
        if fix_params:
            trained = jax.vmap(
                lambda p: simm.clamp_params(p, gene_index=clamp_gene)
            )(trained)
        return trained, hist

    trained, hist = fit(raw, X, y_batch)
    if pad:
        trained = jax.tree.map(lambda x: x[:E], trained)
        hist = hist[:, :E]
    return trained, hist
