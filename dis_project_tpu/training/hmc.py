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
  targeting ``target_accept``, run in TWO warmup windows Stan-style: a
  long window under the identity mass (which also collects the Welford
  variance estimate over its second half), then a short window that
  RE-TUNES the step size under the estimated mass — the leapfrog drift is
  ``eps * inv_mass * p``, so a step size tuned under the identity mass is
  wrong by up to the largest posterior variance once the mass switches,
- a diagonal mass matrix from the Welford estimate,

with each warmup window and the sampling phase ONE ``lax.scan`` program
(TPU-compilable end-to-end; the per-step work is the same Gram +
blocked-Cholesky MLL the trainer runs). The scans carry
``(q, logp(q), grad(q))`` so every leapfrog inner step costs exactly one
``value_and_grad`` MLL evaluation (the custom-VJP MLL shares the Cholesky
factor between value and gradient) — no re-evaluation of the current
state's density or gradient anywhere.
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


def _leapfrog(vg_fn, q, p, logp, g, eps, inv_mass, num_steps):
    """Fixed-length leapfrog from a state whose (logp, grad) are already
    known; returns (q', p', logp', grad'). One ``value_and_grad``
    evaluation per inner step — the only density work in the sampler."""

    def body(carry, _):
        q, p, _, g = carry
        p = p + 0.5 * eps * g
        q = q + eps * inv_mass * p
        v, g = vg_fn(q)
        p = p + 0.5 * eps * g
        return (q, p, v, g), None

    (q, p, v, g), _ = jax.lax.scan(body, (q, p, logp, g), None,
                                   length=num_steps)
    return q, p, v, g


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

    vg_fn = jax.value_and_grad(logp_flat)

    def hmc_step(q, logp, g, key, eps, inv_mass):
        k_mom, k_jit, k_acc = jax.random.split(key, 3)
        # Jitter the step size +-33% per trajectory: FIXED-length leapfrog
        # on a near-harmonic posterior can resonate — when eps*L lands
        # near the oscillation period the trajectory loops back to its
        # start, giving high acceptance with no movement (measured on a
        # unit Gaussian: dual averaging adapted to eps*L ~ 2*pi, 95%
        # accept, ESS 14 of 1600).  Randomising the trajectory length is
        # the standard fix (Neal 2011 §3.2).
        eps = eps * jax.random.uniform(
            k_jit, (), dtype, minval=0.67, maxval=1.33
        )
        # momentum ~ N(0, M) with M = 1 / inv_mass (diagonal).
        p = jax.random.normal(k_mom, (dim,), dtype) / jnp.sqrt(inv_mass)
        q_new, p_new, logp_new, g_new = _leapfrog(
            vg_fn, q, p, logp, g, eps, inv_mass, num_leapfrog
        )
        h_old = -logp + 0.5 * jnp.sum(inv_mass * p * p)
        h_new = -logp_new + 0.5 * jnp.sum(inv_mass * p_new * p_new)
        log_accept = jnp.where(
            jnp.isfinite(h_new), jnp.minimum(0.0, h_old - h_new), -jnp.inf
        )
        accept = jnp.log(jax.random.uniform(k_acc, (), dtype)) < log_accept
        q = jnp.where(accept, q_new, q)
        logp = jnp.where(accept, logp_new, logp)
        g = jnp.where(accept, g_new, g)
        return q, logp, g, jnp.exp(log_accept)

    gamma, t0, kappa = 0.05, 10.0, 0.75

    def dual_avg_window(state, keys, inv_mass, eps0, welford_from):
        """One dual-averaging warmup window under a FIXED mass matrix.

        ``state`` is the carried ``(q, logp, grad)``; Welford variance
        accumulation starts at step index ``welford_from`` (pass
        ``len(keys)`` to disable). Returns the advanced state, the
        averaged step size, and the Welford (mean, m2, n) triple.
        """
        n_steps = keys.shape[0]
        mu = jnp.log(10.0 * eps0)

        def step(carry, inp):
            q, logp, g, log_eps, log_eps_bar, h_bar, w_mean, w_m2, w_n = carry
            i, k = inp
            q, logp, g, alpha = hmc_step(
                q, logp, g, k, jnp.exp(log_eps), inv_mass
            )
            # dual averaging on the acceptance statistic
            m = i + 1.0
            h_bar = (1.0 - 1.0 / (m + t0)) * h_bar + (
                target_accept - alpha
            ) / (m + t0)
            log_eps = mu - jnp.sqrt(m) / gamma * h_bar
            w = m ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            # Welford variance accumulation over [welford_from, n_steps).
            in_window = i >= welford_from
            w_n2 = w_n + jnp.where(in_window, 1.0, 0.0)
            delta = q - w_mean
            w_mean = w_mean + jnp.where(
                in_window, delta / jnp.maximum(w_n2, 1.0), 0.0
            )
            w_m2 = w_m2 + jnp.where(in_window, delta * (q - w_mean), 0.0)
            return (q, logp, g, log_eps, log_eps_bar, h_bar,
                    w_mean, w_m2, w_n2), alpha

        q, logp, g = state
        init = (
            q, logp, g,
            jnp.log(eps0),
            jnp.log(eps0),
            jnp.zeros((), dtype),
            jnp.zeros((dim,), dtype),
            jnp.zeros((dim,), dtype),
            jnp.zeros((), dtype),
        )
        (q, logp, g, _, log_eps_bar, _, w_mean, w_m2, w_n), _ = jax.lax.scan(
            step, init, (jnp.arange(n_steps, dtype=dtype), keys)
        )
        return (q, logp, g), jnp.exp(log_eps_bar), (w_mean, w_m2, w_n)

    # -- warmup --------------------------------------------------------------
    # Window A (identity mass, ~75% of warmup): tune eps, collect Welford
    # variance over its second half. Window B (estimated mass, remainder):
    # RE-TUNE eps — the drift term eps*inv_mass*p rescales with the mass,
    # so the window-A step size is miscalibrated once the mass switches.
    n_a = (3 * num_warmup) // 4 if num_warmup >= 8 else num_warmup
    n_b = num_warmup - n_a
    keys_w = jax.random.split(key, num_warmup + 1)
    logp0, g0 = vg_fn(flat0)
    state = (flat0, logp0, g0)
    eps0 = jnp.asarray(initial_step_size, dtype)
    ones = jnp.ones((dim,), dtype)
    state, eps, (_, w_m2, w_n) = dual_avg_window(
        state, keys_w[:n_a], ones, eps0, welford_from=n_a // 2
    )
    var = w_m2 / jnp.maximum(w_n - 1.0, 1.0)
    # inverse mass = posterior variance estimate (regularised; identity
    # fallback when the window was degenerate).
    inv_mass = jnp.where(var > 1e-10, var, 1.0)
    if n_b > 0:
        state, eps, _ = dual_avg_window(
            state, keys_w[n_a:num_warmup], inv_mass, eps,
            welford_from=n_b,  # disabled
        )

    # -- sampling -----------------------------------------------------------
    def sample_step(carry, k):
        q, logp, g = carry
        q, logp, g, alpha = hmc_step(q, logp, g, k, eps, inv_mass)
        return (q, logp, g), (q, alpha, logp)

    keys_s = jax.random.split(keys_w[-1], num_samples)
    _, (qs, alphas, logps) = jax.lax.scan(sample_step, state, keys_s)
    samples = jax.vmap(unravel)(qs)
    return HMCResult(
        samples=samples,
        accept_rate=jnp.mean(alphas),
        step_size=eps,
        log_probs=logps,
    )


class MultiChainResult(NamedTuple):
    """``samples``: stacked pytree of draws, leading axes ``(num_chains,
    num_samples)``; ``accept_rate``/``step_size``: per-chain ``(C,)``;
    ``log_probs``: ``(C, S)``."""

    samples: object
    accept_rate: jnp.ndarray
    step_size: jnp.ndarray
    log_probs: jnp.ndarray


def sample_chains(
    logdensity_fn: Callable,
    init_position,
    key,
    num_chains: int = 4,
    init_jitter: float = 0.1,
    mesh=None,
    axis: str = "data",
    **kwargs,
) -> MultiChainResult:
    """``num_chains`` independent HMC chains as ONE vmapped program.

    Each chain runs the full :func:`sample` recipe (two-window warmup,
    per-chain step size and mass) from a position jittered around
    ``init_position`` in the UNCONSTRAINED space (``init_jitter`` standard
    normal scale; chain 0 starts exactly at the seed point, so the
    single-chain behavior is embedded). Chains are embarrassingly parallel
    — pass ``mesh`` to shard the chain axis over its ``axis`` dimension
    (the SPMD-ensemble pattern of ``parallel.sharding``); no collectives
    are ever inserted.

    Diagnose convergence with :func:`split_rhat` / :func:`effective_
    sample_size` on the stacked result.
    """
    flat0, unravel = jax.flatten_util.ravel_pytree(init_position)
    keys = jax.random.split(key, num_chains + 1)
    noise = jax.random.normal(
        keys[-1], (num_chains, flat0.shape[0]), flat0.dtype
    )
    noise = noise.at[0].set(0.0)
    inits = flat0[None, :] + init_jitter * noise

    def one_chain(q0, k):
        return sample(logdensity_fn, unravel(q0), k, **kwargs)

    # Always jit the vmapped program (one compiled dispatch for all
    # chains); with a mesh the chain axis is additionally sharded. Chains
    # exchange nothing, so no collectives are inserted — but partitioning
    # changes XLA's fusion choices, and a one-ulp difference in a
    # Hamiltonian can flip a Metropolis accept, so individual DRAWS are
    # not bitwise reproducible across sharding layouts (measured); the
    # stationary distribution is unchanged.
    run = jax.jit(jax.vmap(one_chain))
    chain_keys = keys[:num_chains]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(mesh, PartitionSpec(axis))
        inits = jax.device_put(inits, sh)
        chain_keys = jax.device_put(chain_keys, sh)
    res = run(inits, chain_keys)
    return MultiChainResult(
        samples=res.samples,
        accept_rate=res.accept_rate,
        step_size=res.step_size,
        log_probs=res.log_probs,
    )


def split_rhat(chains):
    """Split potential-scale-reduction R-hat (Gelman et al. / Stan) per
    coordinate.

    ``chains``: array-like ``(C, S, ...)`` — C chains of S draws. Each
    chain is split in half (2C sequences of S//2) before the classic
    between/within variance ratio, so a single wandering chain is caught
    too. Returns an array of the trailing shape; values near 1 indicate
    convergence (Stan's guidance: worry above ~1.01-1.05). Host-side
    numpy — diagnostics are post-hoc, not part of the compiled sampler.
    """
    import numpy as np

    x = np.asarray(chains)
    C, S = x.shape[:2]
    half = S // 2
    if half < 2:
        return np.full(x.shape[2:], np.nan)
    x = np.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)
    mean_c = x.mean(axis=1)  # (2C, ...)
    var_c = x.var(axis=1, ddof=1)
    W = var_c.mean(axis=0)
    B = half * mean_c.var(axis=0, ddof=1)
    var_plus = (half - 1.0) / half * W + B / half
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.where(W > 0, np.sqrt(var_plus / W), 1.0)


def effective_sample_size(chains):
    """Effective sample size per coordinate (Stan's multi-chain
    autocorrelation estimator, Geyer initial-monotone truncation).

    ``chains``: ``(C, S, ...)``. Returns the trailing shape. Plain
    (non-rank-normalised) ESS of the mean — the quantity the credible-
    interval standard errors depend on. Host-side numpy.
    """
    import numpy as np

    x = np.asarray(chains, np.float64)
    C, S = x.shape[:2]
    flat_trail = int(np.prod(x.shape[2:], dtype=int)) if x.ndim > 2 else 1
    xs = x.reshape(C, S, flat_trail)
    out = np.empty(flat_trail)
    for j in range(flat_trail):
        z = xs[:, :, j]
        mean_c = z.mean(axis=1, keepdims=True)
        zc = z - mean_c
        # per-chain autocovariance via FFT
        n_fft = 1 << (2 * S - 1).bit_length()
        f = np.fft.rfft(zc, n=n_fft, axis=1)
        acov = np.fft.irfft(f * np.conj(f), n=n_fft, axis=1)[:, :S].real
        acov /= S  # biased (Stan's convention)
        W = (z.var(axis=1, ddof=1)).mean()
        var_c = acov[:, 0] * S / (S - 1.0)
        B_over_S = z.mean(axis=1).var(ddof=1) if C > 1 else 0.0
        var_plus = var_c.mean() * (S - 1.0) / S + B_over_S
        if var_plus <= 0 or not np.isfinite(var_plus):
            out[j] = np.nan
            continue
        rho = 1.0 - (W - acov.mean(axis=0)) / var_plus  # (S,)
        # Geyer initial monotone sequence on (even, odd) lag pairs
        # P_m = rho[2m] + rho[2m+1] (Stan): tau = -1 + 2 sum_m P_m,
        # truncated at the first negative pair, enforced non-increasing.
        tau = -1.0
        prev = np.inf
        m = 0
        while 2 * m + 1 < S:
            pair = rho[2 * m] + rho[2 * m + 1]
            if pair < 0:
                break
            pair = min(pair, prev)
            tau += 2.0 * pair
            prev = pair
            m += 1
        out[j] = C * S / max(tau, 1e-12)
    return out.reshape(x.shape[2:]) if x.ndim > 2 else out[0]


def pytree_diagnostics(samples):
    """(max split-R-hat, min ESS) over every scalar coordinate of a
    stacked-samples pytree with leading axes ``(num_chains, num_samples)``
    — the two numbers a convergence gate needs. Host-side numpy."""
    import numpy as np

    rhat_max, ess_min = -np.inf, np.inf
    for leaf in jax.tree_util.tree_leaves(samples):
        a = np.asarray(leaf)
        r = split_rhat(a)
        e = effective_sample_size(a)
        rhat_max = max(rhat_max, float(np.nanmax(r)))
        ess_min = min(ess_min, float(np.nanmin(e)))
    return rhat_max, ess_min


def mixture_predict(predict_fn, samples, max_components: int = 64):
    """Moment-matched Gaussian of the posterior-predictive mixture (BMA).

    Bayesian model averaging over hyperparameter draws: given ``samples``
    (a pytree of CONSTRAINED draws with a leading sample axis, e.g. the
    pooled output of :func:`kinetics_posterior`) and ``predict_fn(params)
    -> Gaussian`` (e.g. ``ExactSIMM.latent_predict`` closed over the
    training data), evaluates the per-draw Gaussian predictives as ONE
    vmapped+jitted program and moment-matches the equal-weight mixture
    exactly (law of total expectation / covariance):

        mean = E_s[mu_s]
        cov  = E_s[Sigma_s] + E_s[mu_s mu_s^T] - mean mean^T

    This is the hyperparameter-marginalised predictive that the
    reference's plug-in point estimate ignores (reference
    ``src/main.py:66-71`` predicts at the single trained point only).

    ``max_components`` thins the draws evenly before the sweep — HMC
    draws are serially correlated, so a few dozen components saturate the
    band estimate while keeping the batched Gram/Cholesky sweep one small
    compiled program.

    Components whose predictive is non-finite are DROPPED before moment
    matching. This is not defensive paranoia: the reference's k_xx family
    is not positive definite for every (D, l) — at large ``D*l`` the
    closed-form Gram has O(1e-2)-scale negative eigenvalues in exact math
    (verified to 2e-15 against the independent torch implementation; the
    same convention quirk documented for the joint (x, f) covariance in
    ``models/multisimm.py``), so an unclamped posterior draw can land
    where the predictive Cholesky legitimately fails. Such draws carry no
    usable predictive mass; the caller sees the drop via the returned
    component count.

    Returns ``(Gaussian, component_means)`` with ``component_means`` of
    shape (S_used, N) for spaghetti plots; ``S_used == 0`` (all
    components dropped) yields a NaN Gaussian the caller must check.
    """
    import numpy as np  # host-side thinning + moment matching

    n = jax.tree_util.tree_leaves(samples)[0].shape[0]
    take = min(int(max_components), n)
    idx = jnp.asarray(np.round(np.linspace(0, n - 1, take)).astype(int))
    thinned = jax.tree_util.tree_map(lambda a: a[idx], samples)
    dists = jax.jit(jax.vmap(predict_fn))(thinned)
    # The per-draw sweep is the compiled hot path; the O(S N^2) moment
    # matching below is host-side numpy so the finite-component filter
    # can change the component count.
    mu = np.asarray(dists.mean)  # (S, N)
    cov = np.asarray(dists.cov)  # (S, N, N)
    finite = (
        np.isfinite(mu).all(axis=1)
        & np.isfinite(cov.reshape(cov.shape[0], -1)).all(axis=1)
        # A draw can survive its Cholesky yet land with a slightly
        # negative posterior variance (roundoff near the indefinite
        # region); it would NaN the mixture's stddev downstream —
        # drop it with the non-finite ones (ADVICE r2).
        & (np.diagonal(cov, axis1=1, axis2=2).min(axis=1) >= 0)
    )
    mu, cov = mu[finite], cov[finite]
    used = int(finite.sum())
    if used == 0:
        N = mu.shape[1]
        nan = jnp.full((N,), jnp.nan)
        return type(dists)(mean=nan, cov=jnp.full((N, N), jnp.nan)), mu
    mbar = mu.mean(axis=0)
    dev = mu - mbar
    mixed_cov = cov.mean(axis=0) + (dev.T @ dev) / used
    return (
        type(dists)(mean=jnp.asarray(mbar), cov=jnp.asarray(mixed_cov)),
        mu,
    )


def sample_constrained(logdensity, raw0, key, num_chains, mesh, constrain_fn, kw):
    """Dispatch single-chain vs multi-chain sampling and constrain the
    returned samples (one vmap level per leading axis)."""
    if num_chains > 1:
        res = sample_chains(
            logdensity, raw0, key, num_chains=num_chains, mesh=mesh, **kw
        )
        return res._replace(
            samples=jax.vmap(jax.vmap(constrain_fn))(res.samples)
        )
    res = sample(logdensity, raw0, key, **kw)
    return res._replace(samples=jax.vmap(constrain_fn)(res.samples))


def kinetics_posterior(
    model,
    params,
    x,
    y,
    key,
    num_warmup: int = 400,
    num_samples: int = 400,
    num_leapfrog: int = 24,
    num_chains: int = 1,
    mesh=None,
):
    """Posterior over the exact SIMM hyperparameters given expression data.

    Log-density: the exact conjugate MLL (same Sigma convention as
    training, ``ExactSIMM.mll``) + the bijector Jacobian — i.e. a flat
    (improper) prior on the CONSTRAINED parameters. ``params`` seeds the
    chain (use the trained MAP/MLE point); returned samples are in
    CONSTRAINED space.

    ``num_chains > 1`` runs that many jitter-initialised chains as one
    vmapped program (optionally sharded over ``mesh``) and returns a
    :class:`MultiChainResult` with ``(C, S)``-leading samples — feed them
    to :func:`split_rhat` / :func:`effective_sample_size` /
    :func:`pytree_diagnostics` for convergence checks.
    """
    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import bijectors as bij

    y = y.reshape(-1)

    def logdensity(raw):
        p = simm.constrain(raw)
        return model.mll(p, x, y) + bij.constrain_log_det(
            raw, simm.SIMM_BIJECTORS
        )

    return sample_constrained(
        logdensity, simm.unconstrain(params), key, num_chains, mesh,
        simm.constrain,
        dict(num_warmup=num_warmup, num_samples=num_samples,
             num_leapfrog=num_leapfrog),
    )


def kinetics_posterior_ss(
    params,
    timepoints,
    y,
    key,
    *,
    jitter: float,
    num_warmup: int = 400,
    num_samples: int = 400,
    num_leapfrog: int = 10,
    num_chains: int = 1,
    mesh=None,
    order: int = 10,
    force_kernel: str = "rbf",
    stationary_after: int | None = None,
):
    """Posterior over the SIMM hyperparameters with the O(T) state-space
    likelihood (:func:`dis_project_tpu.ops.statespace.lfm_mll_ss`).

    Full-Bayes kinetics at dense scale: every leapfrog step needs one MLL
    gradient, and at N = G x T >= 1e4 the exact route's O(N^3)
    factorisation per gradient makes HMC impractical (~30 ms/grad at
    N=1e4, growing cubically), while the Kalman-filter likelihood is
    O(T (p+G)^3) — constant in the replicate/timepoint product that blows
    the dense path up. Same flat-prior-in-constrained-space convention as
    :func:`kinetics_posterior`; the likelihood is the order-``p`` SDE
    approximation of the force prior (~1e-4 nats at these scales), so the
    posterior inherits that approximation.

    ``num_leapfrog`` defaults lower than the exact route (10 vs 24): the
    dense-scale gradient is ~14 ms on a v5e, and a warmup window is ONE
    device dispatch of ``steps x leapfrog`` gradients — the remote-TPU
    transport kills multi-minute dispatches, so the trajectory length is
    the knob that bounds them.
    """
    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import bijectors as bij
    from dis_project_tpu.ops import statespace as ss_ops

    y = y.reshape(-1)
    t = jnp.asarray(timepoints)

    def logdensity(raw):
        p = simm.constrain(raw)
        # stationary_after: the r5 frozen-gain tail — every leapfrog
        # GRADIENT drops its covariance leg past the warmup (measured
        # 5.6-10x per gradient at T=5e4), at the knob's documented
        # geometric-in-K likelihood error. The posterior then targets
        # the steady-state likelihood; pick K generously (the cost is
        # linear in K, the error geometric).
        return ss_ops.lfm_mll_ss(
            p, t, y, jitter=jitter, order=order, force_kernel=force_kernel,
            stationary_after=stationary_after,
        ) + bij.constrain_log_det(raw, simm.SIMM_BIJECTORS)

    return sample_constrained(
        logdensity, simm.unconstrain(params), key, num_chains, mesh,
        simm.constrain,
        dict(num_warmup=num_warmup, num_samples=num_samples,
             num_leapfrog=num_leapfrog),
    )


def delay_posterior_ss(
    params,
    timepoints,
    y,
    key,
    *,
    jitter: float,
    num_warmup: int = 400,
    num_samples: int = 400,
    num_leapfrog: int = 10,
    num_chains: int = 1,
    mesh=None,
    order: int = 10,
    force_kernel: str = "rbf",
):
    """Posterior over (kinetics, per-gene delays) with the O(T G)
    warped-event state-space likelihood
    (:func:`dis_project_tpu.ops.statespace.delaysimm_mll_ss`) — the
    dense-scale full-Bayes route for the delay family, where the exact
    route's O(N^3)-per-gradient is impractical. Same conventions as
    :func:`kinetics_posterior_ss` (flat prior in constrained space) and
    the same UNCLAMPED-model caveat as the exact delay posterior
    (``models.delaysimm.kinetics_posterior``): the gene-0 delay anchor is
    a point constraint the posterior does not impose, so delays show the
    weak common-shift mode the anchor exists to resolve.
    """
    from dis_project_tpu.models import delaysimm
    from dis_project_tpu.ops import bijectors as bij
    from dis_project_tpu.ops import statespace as ss_ops

    y = y.reshape(-1)
    t = jnp.asarray(timepoints)

    def logdensity(raw):
        p = delaysimm.constrain(raw)
        return ss_ops.delaysimm_mll_ss(
            p, t, y, jitter=jitter, order=order, force_kernel=force_kernel
        ) + bij.constrain_log_det(raw, delaysimm.DELAY_BIJECTORS)

    return sample_constrained(
        logdensity, delaysimm.unconstrain(params), key, num_chains, mesh,
        delaysimm.constrain,
        dict(num_warmup=num_warmup, num_samples=num_samples,
             num_leapfrog=num_leapfrog),
    )
