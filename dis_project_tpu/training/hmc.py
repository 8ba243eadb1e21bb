r"""Hamiltonian Monte Carlo over LFM hyperparameters — full-Bayes kinetics.

The reference (and its trainer) produces only point estimates of the
kinetic parameters B/S/D; the Lawrence et al. (2006) analysis it follows
reports parameter *uncertainty*. This module provides that capability:
posterior samples over the hyperparameters with the exact conjugate MLL
(the custom-VJP ``ops.mll`` path — each HMC gradient reuses the forward
Cholesky factor) as the likelihood and a flat prior in CONSTRAINED space,
moved to the unconstrained sampling space by the bijector Jacobian
(``ops.bijectors.constrain_log_det``).

Pure JAX (no TFP/blackjax in this environment): standard HMC with

- a fixed-length leapfrog integrator,
- dual-averaging step-size adaptation (Hoffman & Gelman 2014, Alg. 5)
  targeting ``target_accept`` during warmup,
- a diagonal mass matrix estimated by Welford over the second half of
  warmup,

with warmup and sampling each ONE ``lax.scan`` program (TPU-compilable
end-to-end; the per-step work is the same Gram + blocked-Cholesky MLL the
trainer runs).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.flatten_util
import jax.numpy as jnp


class HMCResult(NamedTuple):
    """``samples``: stacked pytree of posterior draws (leading axis =
    ``num_samples``); ``accept_rate``: mean Metropolis acceptance over the
    sampling phase; ``step_size``: adapted leapfrog step size;
    ``log_probs``: (num_samples,) log-density trace."""

    samples: object
    accept_rate: jnp.ndarray
    step_size: jnp.ndarray
    log_probs: jnp.ndarray


def _leapfrog(grad_fn, q, p, eps, inv_mass, num_steps):
    """Fixed-length leapfrog; returns (q', p', grad(q'))."""

    def body(carry, _):
        q, p, g = carry
        p = p + 0.5 * eps * g
        q = q + eps * inv_mass * p
        g = grad_fn(q)
        p = p + 0.5 * eps * g
        return (q, p, g), None

    (q, p, g), _ = jax.lax.scan(body, (q, p, grad_fn(q)), None,
                                length=num_steps)
    return q, p, g


def sample(
    logdensity_fn: Callable,
    init_position,
    key,
    num_warmup: int = 400,
    num_samples: int = 400,
    num_leapfrog: int = 24,
    target_accept: float = 0.8,
    initial_step_size: float = 0.05,
) -> HMCResult:
    """HMC posterior samples for an arbitrary pytree position.

    ``logdensity_fn`` maps the position pytree to a scalar log-density
    (up to a constant). NaN/inf proposals are rejected by the Metropolis
    step (their acceptance probability is 0), so occasional divergent
    trajectories degrade acceptance instead of corrupting the chain.
    """
    flat0, unravel = jax.flatten_util.ravel_pytree(init_position)
    dim = flat0.shape[0]
    dtype = flat0.dtype

    def logp_flat(q):
        return logdensity_fn(unravel(q))

    grad_fn = jax.grad(logp_flat)
    value_fn = logp_flat

    def hmc_step(q, key, eps, inv_mass):
        k_mom, k_acc = jax.random.split(key)
        # momentum ~ N(0, M) with M = 1 / inv_mass (diagonal).
        p = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
        q_new, p_new, _ = _leapfrog(grad_fn, q, p, eps, inv_mass,
                                    num_leapfrog)
        h_old = -value_fn(q) + 0.5 * jnp.sum(inv_mass * p * p)
        h_new = -value_fn(q_new) + 0.5 * jnp.sum(inv_mass * p_new * p_new)
        log_accept = jnp.where(
            jnp.isfinite(h_new), jnp.minimum(0.0, h_old - h_new), -jnp.inf
        )
        accept = jnp.log(jax.random.uniform(k_acc, (), dtype)) < log_accept
        q = jnp.where(accept, q_new, q)
        return q, jnp.exp(log_accept)

    # -- warmup: dual averaging + Welford mass (second half) ---------------
    mu = jnp.log(10.0 * jnp.asarray(initial_step_size, dtype))
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def warmup_step(carry, inp):
        q, log_eps, log_eps_bar, h_bar, w_mean, w_m2, w_n, inv_mass = carry
        i, key = inp
        q, alpha = hmc_step(q, key, jnp.exp(log_eps), inv_mass)
        # dual averaging on the acceptance statistic
        m = i + 1.0
        h_bar = (1.0 - 1.0 / (m + t0)) * h_bar + (
            target_accept - alpha
        ) / (m + t0)
        log_eps = mu - jnp.sqrt(m) / gamma * h_bar
        w = m ** (-kappa)
        log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
        # Welford variance accumulation over the second half of warmup.
        in_window = i >= num_warmup // 2
        w_n2 = w_n + jnp.where(in_window, 1.0, 0.0)
        delta = q - w_mean
        w_mean = w_mean + jnp.where(in_window, delta / jnp.maximum(w_n2, 1.0),
                                    0.0)
        w_m2 = w_m2 + jnp.where(in_window, delta * (q - w_mean), 0.0)
        return (q, log_eps, log_eps_bar, h_bar, w_mean, w_m2, w_n2,
                inv_mass), alpha

    keys_w = jax.random.split(key, num_warmup + 1)
    init = (
        flat0,
        jnp.log(jnp.asarray(initial_step_size, dtype)),
        jnp.log(jnp.asarray(initial_step_size, dtype)),
        jnp.zeros((), dtype),
        jnp.zeros((dim,), dtype),
        jnp.zeros((dim,), dtype),
        jnp.zeros((), dtype),
        jnp.ones((dim,), dtype),
    )
    (q, _, log_eps_bar, _, w_mean, w_m2, w_n, _), _ = jax.lax.scan(
        warmup_step,
        init,
        (jnp.arange(num_warmup, dtype=dtype), keys_w[:num_warmup]),
    )
    eps = jnp.exp(log_eps_bar)
    var = w_m2 / jnp.maximum(w_n - 1.0, 1.0)
    # inverse mass = posterior variance estimate (regularised; identity
    # fallback when the window was degenerate).
    inv_mass = jnp.where(var > 1e-10, var, 1.0)

    # -- sampling -----------------------------------------------------------
    def sample_step(carry, key):
        q = carry
        q, alpha = hmc_step(q, key, eps, inv_mass)
        return q, (q, alpha, value_fn(q))

    keys_s = jax.random.split(keys_w[-1], num_samples)
    _, (qs, alphas, logps) = jax.lax.scan(sample_step, q, keys_s)
    samples = jax.vmap(unravel)(qs)
    return HMCResult(
        samples=samples,
        accept_rate=jnp.mean(alphas),
        step_size=eps,
        log_probs=logps,
    )


def kinetics_posterior(
    model,
    params,
    x,
    y,
    key,
    num_warmup: int = 400,
    num_samples: int = 400,
    num_leapfrog: int = 24,
) -> HMCResult:
    """Posterior over the exact SIMM hyperparameters given expression data.

    Log-density: the exact conjugate MLL (same Sigma convention as
    training, ``ExactSIMM.mll``) + the bijector Jacobian — i.e. a flat
    (improper) prior on the CONSTRAINED parameters. ``params`` seeds the
    chain (use the trained MAP/MLE point); returned samples are in
    CONSTRAINED space.
    """
    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import bijectors as bij

    y = y.reshape(-1)

    def logdensity(raw):
        p = simm.constrain(raw)
        return model.mll(p, x, y) + bij.constrain_log_det(
            raw, simm.SIMM_BIJECTORS
        )

    res = sample(
        logdensity,
        simm.unconstrain(params),
        key,
        num_warmup=num_warmup,
        num_samples=num_samples,
        num_leapfrog=num_leapfrog,
    )
    return res._replace(samples=jax.vmap(simm.constrain)(res.samples))
