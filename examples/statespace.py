# %% [markdown]
# # The state-space engine: O(T) latent force models
#
# The exact SIMM marginal likelihood costs O(N^3) through a dense Gram
# factorisation (reference `src/objectives.py:70-78`). But the LFM is
# secretly a *Markov* model: the gene ODE `dx/dt = B + S f - D x` is
# linear state evolution, and the RBF force prior is approximated to
# ~1e-4 by an order-10 linear SDE (Hartikainen & Sarkka 2010). Stack the
# two and the exact MLL of the joint model is a **Kalman filter** —
# O(T (p+G)^3), linear in the number of timepoints.
#
# This walkthrough shows (1) the engine agreeing with the dense MLL to
# the SDE approximation error, (2) training on a grid the dense path
# could never touch (N = 200,000 observations), and (3) the log-depth
# associative-scan filter that makes the recursion TPU-shaped.
#
# Run with `python examples/statespace.py` (CPU, ~2 min).

# %%
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax

from dis_project_tpu.data import synthetic
from dis_project_tpu.data.dataset import train_arrays
from dis_project_tpu.models import simm
from dis_project_tpu.ops import statespace as ss

# %% [markdown]
# ## 1. The approximation, measured
#
# The only approximation in the engine is the order-p SDE of the force
# prior. Everything downstream (the filter) is the exact MLL of the
# approximated model, so the MLL error IS the kernel error: ~6e-4 at
# p=8, ~1.3e-4 at p=10, ~3e-5 at p=12.

# %%
scfg = synthetic.SyntheticConfig(
    num_genes=5, num_timepoints=7, num_replicates=1, noise_std=0.1
)
data = synthetic.sample_prior(jax.random.PRNGKey(0), scfg)
X, y, var = train_arrays(data)
y = y.reshape(-1)
t = jnp.asarray(data.timepoints)
params = simm.init_params(5)
model = simm.ExactSIMM(num_genes=5, jitter=1e-4)

dense = float(model.mll_gridded(params, t, y))
print(f"dense MLL (Cholesky, exact):      {dense:.6f}")
for order in (8, 10, 12):
    val = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=order))
    print(f"state-space MLL (order {order:2d}):      {val:.6f}"
          f"   |err| = {abs(val - dense):.2e}")

# %% [markdown]
# ## 2. Sequential vs parallel: one algorithm, two schedules
#
# `lax.scan` runs the filter as T small sequential steps — right for CPU
# and tiny T. `jax.lax.associative_scan` runs the SAME recursion as a
# parallel prefix over the filtering semigroup (Sarkka &
# Garcia-Fernandez 2021): depth log2(T), every level a batched (T, m, m)
# matmul on the MXU. The two agree to machine precision — value AND
# gradient — because they compute the same thing.

# %%
v_seq = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4, parallel=False))
v_par = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4, parallel=True))
print(f"sequential scan:       {v_seq:.12f}")
print(f"associative scan:      {v_par:.12f}")
print(f"difference:            {abs(v_seq - v_par):.2e}")

# %% [markdown]
# ## 3. Training beyond the dense wall: N = 200,000
#
# G=10 genes observed at T=20,000 timepoints is N=2e5 observations. The
# dense Gram would be 2e5 x 2e5 (320 GB in f64) — not storable, let
# alone factorisable. The Kalman engine's state is 20-dimensional and its
# per-step cost never sees N; the whole MLL is ~20k tiny matrix ops.

# %%
G, T = 10, 20_000
key = jax.random.PRNGKey(1)
true_params = simm.init_params(G)
true_params = true_params._replace(
    decay=jnp.asarray(np.random.default_rng(0).uniform(0.3, 1.4, G)),
    sensitivity=jnp.asarray(np.random.default_rng(1).uniform(0.5, 1.5, G)),
    lengthscale=jnp.asarray(1.8),
)
t_big = jnp.linspace(0.0, 120.0, T)

# Simulate FROM the state-space model itself (a single forward pass):
# exact draws from the order-10 prior at any T.
f_aug, p_inf, p0, h_force = ss.build_lfm_ssm(
    true_params.decay, true_params.sensitivity, true_params.lengthscale
)
a_step, q_step = ss.discretize(f_aug, p_inf, t_big[1] - t_big[0])
# Cholesky of Q for sampling (PSD up to roundoff; tiny ridge).
lq = jnp.linalg.cholesky(q_step + 1e-12 * jnp.eye(q_step.shape[0]))


def sim_step(z, eps):
    z = a_step @ z + lq @ eps
    return z, z


z0 = jnp.zeros((p0.shape[0],))
eps = jax.random.normal(key, (T - 1, p0.shape[0]))
_, zs = jax.lax.scan(sim_step, z0, eps)
zs = jnp.concatenate([z0[None], zs], axis=0)
x_states = zs[:, 10:] + (true_params.basal / true_params.decay)[None, :]
noise = 0.05 * jax.random.normal(jax.random.PRNGKey(2), x_states.shape)
y_big = (x_states + noise).T.reshape(-1)  # gene-major flat, like dataset_3d
print(f"simulated N = {G * T:,} observations "
      f"({G} genes x {T:,} timepoints)")

# %%
raw0 = simm.unconstrain(simm.init_params(G))
opt = optax.adam(0.02)


@jax.jit
def fit(raw, steps=60):
    state = opt.init(raw)

    def step(carry, _):
        raw, state = carry
        loss, g = jax.value_and_grad(
            lambda r: -ss.lfm_mll_ss(
                simm.constrain(r), t_big, y_big, jitter=1e-5, parallel=False
            )
        )(raw)
        upd, state = opt.update(g, state)
        return (optax.apply_updates(raw, upd), state), loss

    (raw, _), hist = jax.lax.scan(step, (raw, state), None, length=steps)
    return raw, hist


t0 = time.perf_counter()
raw_f, hist = fit(raw0)
hist = jax.block_until_ready(hist)
wall = time.perf_counter() - t0
fitted = simm.constrain(raw_f)
corr_d = np.corrcoef(np.asarray(fitted.decay), np.asarray(true_params.decay))[0, 1]
corr_s = np.corrcoef(
    np.asarray(fitted.sensitivity), np.asarray(true_params.sensitivity)
)[0, 1]
print(f"60 Adam steps over N=200,000 in {wall:.1f}s "
      f"(loss {float(hist[0]):.1f} -> {float(hist[-1]):.1f})")
print(f"kinetics recovery: corr(decay)={corr_d:.3f} "
      f"corr(sensitivity)={corr_s:.3f} "
      f"lengthscale {float(fitted.lengthscale):.2f} (true 1.80)")
assert corr_d > 0.95 and corr_s > 0.95

# %% [markdown]
# ## 4. The latent force, smoothed
#
# Prediction is an RTS smoother pass on the union grid — the same O(T)
# machinery gives the force posterior everywhere.

# %%
t_test = jnp.linspace(0.0, 13.0, 80)
nv = var.reshape(5, 7).T + 1e-4
f_mean, f_var, x_mean, x_var = ss.lfm_predict_ss(
    params, t, y, t_test, noise_var=nv
)
print(f"force posterior on {t_test.shape[0]} test points: "
      f"mean in [{float(f_mean.min()):.2f}, {float(f_mean.max()):.2f}], "
      f"all variances positive: {bool((f_var > 0).all())}")

# %% [markdown]
# ## 5. Every family, one smoother
#
# The same union-grid smoother drives the multi-force and second-order
# families (`multisimm_predict_ss`, `lfm2_predict_ss`). Those families'
# closed forms use the self-consistent force prior, so the smoothed
# posterior matches the dense path in mean AND variance — and the
# second-order route stays finite past the complex-erf forms'
# `omega*l ~ 12` overflow wall, where a dense posterior cannot even be
# evaluated.

# %%
from dis_project_tpu.models import simm2

p_hot = simm2.init_params(3)._replace(
    alpha=jnp.asarray([0.4, 0.7, 1.0]),
    omega=jnp.asarray([10.0, 12.0, 9.0]),   # omega*l up to 36
    lengthscale=jnp.asarray(3.0),
)
t9 = jnp.linspace(0.0, 12.0, 9)
y9 = jnp.asarray(np.random.default_rng(5).normal(size=(3 * 9,)))
f2_mean, f2_var, x2_mean, x2_var = ss.lfm2_predict_ss(
    p_hot, t9, y9, jnp.linspace(0.0, 13.0, 50), noise_var=1e-2
)
print(f"second-order force posterior past the overflow wall: finite="
      f"{bool(jnp.isfinite(f2_mean).all() & jnp.isfinite(f2_var).all())}")

# %% [markdown]
# ## 6. Full Bayes where O(N^3) can't go
#
# HMC needs a likelihood gradient per leapfrog step — thousands of them.
# With the dense MLL that is thousands of O(N^3) factorisations; with the
# Kalman engine it is thousands of O(T) filter passes, so hyperparameter
# posteriors are feasible at dense-stress scale. CLI:
# `--preset dense10k --mll-engine ss --posterior-samples N`.

# %%
from dis_project_tpu.training import hmc

G7, T7 = 8, 40
scfg7 = synthetic.SyntheticConfig(num_genes=G7, num_timepoints=T7,
                                  num_replicates=1, noise_std=0.1)
data7 = synthetic.sample_prior(jax.random.PRNGKey(3), scfg7)
_, y7, _ = train_arrays(data7)
t7 = jnp.asarray(data7.timepoints)

t0 = time.perf_counter()
post = hmc.kinetics_posterior_ss(
    simm.init_params(G7), t7, y7, jax.random.PRNGKey(11),
    jitter=1e-4, num_warmup=60, num_samples=60,
)
post = jax.block_until_ready(post)
print(f"60 HMC draws over {3 * G7 + 2} hyperparameters at N={G7 * T7} "
      f"in {time.perf_counter() - t0:.1f}s "
      f"(accept rate {float(post.accept_rate):.2f})")
d_mean = np.asarray(post.samples.decay).mean(axis=0)
corr = np.corrcoef(d_mean, np.asarray(data7.params_true["decay"]))[0, 1]
print(f"posterior-mean decay vs generating truth: corr {corr:.3f}")

# %% [markdown]
# ## 8. The nonlinear family rides the same chassis: extended Kalman (r4)
#
# The nonlinear-response model `dx = (B + S g(f) - D x) dt` has no
# closed-form Gram at all — the MAP route carries the force as a Q-point
# parameter. The EKF engine linearizes the gene drift around the filtered
# mean and returns an approximate MARGINAL p(y | kinetics): with
# `response='identity'` it reproduces the linear engine exactly (to RK4
# integration error), and on exp-response data it recovers kinetics
# without ever representing the force explicitly.

# %%
scfg8 = synthetic.SyntheticConfig(num_genes=5, num_timepoints=30,
                                  num_replicates=1, noise_std=0.05)
data8 = synthetic.generate_ode_nonlinear(jax.random.PRNGKey(2), scfg8,
                                         response="exp")
_, y8, _ = train_arrays(data8)
t8 = jnp.asarray(data8.timepoints)
v_lin = float(ss.lfm_mll_ss(simm.init_params(5), t8, y8, jitter=1e-4,
                            parallel=False))
v_ekf = float(ss.nlfm_mll_ekf(simm.init_params(5), t8, y8,
                              response="identity", jitter=1e-4,
                              substeps=8))
print(f"identity-response EKF vs linear engine: |err| = "
      f"{abs(v_lin - v_ekf):.2e}")

obj8 = lambda r: -ss.nlfm_mll_ekf(simm.constrain(r), t8, y8,
                                  response="exp", jitter=1e-4, substeps=4)
opt8 = optax.adam(0.02)


@jax.jit
def fit8(raw):
    st = opt8.init(raw)

    def step(c, _):
        raw, st = c
        _, g = jax.value_and_grad(obj8)(raw)
        u, st = opt8.update(g, st)
        return (optax.apply_updates(raw, u), st), None

    (raw, _), _ = jax.lax.scan(step, (raw, st), None, length=300)
    return raw


p8 = simm.constrain(fit8(simm.unconstrain(simm.init_params(5))))
cd = np.corrcoef(np.asarray(p8.decay),
                 np.asarray(data8.params_true["decay"]))[0, 1]
cs = np.corrcoef(np.asarray(p8.sensitivity),
                 np.asarray(data8.params_true["sensitivity"]))[0, 1]
print(f"exp-response kinetics through the EKF marginal: "
      f"corr(decay)={cd:.3f} corr(sensitivity)={cs:.3f}")

# %% [markdown]
# ## 9. Exact Matern priors and joint trajectory draws (r4)
#
# The RBF force prior needs an order-10 SDE approximation; the Matern
# family is EXACTLY Markovian at state dims 1-3 — and has no closed-form
# dense Gram at all, so only this engine can express it. And because the
# posterior is Markovian too, FFBS draws JOINT force trajectories in
# O(T) per sample: functionals of the whole path (peak time, area under
# the force) Monte-Carlo correctly, which marginal bands cannot do.

# %%
v32 = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4, parallel=False,
                          force_kernel="matern32"))
print(f"matern32 MLL (exact, no SDE-order error): {v32:.6f}")

draws = ss.posterior_sample_ss(
    params, t, y, jnp.linspace(0.0, 13.0, 60), jax.random.PRNGKey(4),
    noise_var=1e-3, num_samples=256,
)
peak_times = jnp.linspace(0.0, 13.0, 60)[jnp.argmax(draws, axis=1)]
print(f"256 joint FFBS force draws: peak-time posterior "
      f"{float(peak_times.mean()):.2f} +/- {float(peak_times.std()):.2f} "
      f"(a whole-trajectory functional marginal bands cannot give)")

# %% [markdown]
# ## 10. The steady-state filter (r5)
#
# On a uniform grid the covariance recursion is data-independent and
# converges geometrically to the DARE fixed point: `stationary_after=K`
# runs K exact warmup steps, then freezes the gain — every later step
# drops its covariance leg entirely (measured 5.6-10x at T=5e4; error
# geometric in K). Pick K as a few multiples of lengthscale/dt.

# %%
import numpy as _np
T_long = 2048
t_long = jnp.linspace(0.0, 60.0, T_long)
f_l, x_l = ss.sample_trajectory_ss(
    params, t_long, jax.random.PRNGKey(9), num_samples=1
)
y_long = (x_l[0] + 0.05 * jax.random.normal(
    jax.random.PRNGKey(10), x_l[0].shape)).T.reshape(-1)
v_ex = float(ss.lfm_mll_ss(params, t_long, y_long, jitter=1e-4))
for K in (32, 128, 512):
    v_st = float(ss.lfm_mll_ss(params, t_long, y_long, jitter=1e-4,
                               stationary_after=K))
    print(f"steady-state K={K:4d}: |err| {abs(v_st - v_ex):.2e} nats "
          f"of {v_ex:.1f}")
print("done.")
