# %% [markdown]
# # Nonlinear-response LFM: MAP + Laplace over dx/dt = B + S·g(f) − D·x
#
# The linear SIMM family integrates its ODE analytically into closed-form
# covariances; a nonlinear response g(f) inside the convolution has no
# closed form. `models.nlfm` handles that regime the TPU way: the force is
# a whitened GP on a quadrature grid, gene curves come from an O(log Q)
# parallel-prefix integrator (`ops.odeint`), and inference is MAP with
# Laplace credible bands (full-Bayes HMC shares the same log-joint).
# Lawrence, Sanguinetti & Rattray (2006) §5 analyse exactly this model
# with g = exp (their positivity-constrained MAP estimate).
#
# This walkthrough (1) simulates data from the exp-response ODE, (2) fits
# MAP and recovers the force, and (3) demonstrates the identity-response
# parity oracle: with g = identity the MAP force IS the exact GP's
# closed-form posterior mean.
#
# Run with `python examples/nonlinear.py` (CPU, ~1 min).

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dis_project_tpu.data.synthetic import SyntheticConfig, generate_ode_nonlinear
from dis_project_tpu.models import nlfm
from dis_project_tpu.models.nlfm import NonlinearLFM

# %% [markdown]
# ## 1. Simulate from the exp-response ODE
#
# `generate_ode_nonlinear` integrates dx/dt = B + S·exp(f) − D·x on a fine
# host-f64 grid against a GP-drawn force — an oracle fully independent of
# the model's own quadrature.

# %%
cfg = SyntheticConfig(
    num_genes=5, num_timepoints=12, num_replicates=2, t_max=12.0,
    noise_std=0.05,
)
data = generate_ode_nonlinear(jax.random.PRNGKey(7), cfg, response="exp")
t_obs = jnp.asarray(data.timepoints)
Y = jnp.asarray(data.gene_expressions)
V = jnp.asarray(data.gene_variances)
print(f"simulated {cfg.num_genes} genes x {cfg.num_timepoints} timepoints "
      f"x {cfg.num_replicates} replicates, response g=exp")

# %% [markdown]
# ## 2. MAP fit over (kinetics, whitened force)
#
# One compiled Adam scan. For g = exp the model has an exact shift
# degeneracy g(f + c) = e^c g(f): the force is identified up to an
# additive constant, so correlation (shift-invariant) is the right
# recovery metric.

# %%
model = NonlinearLFM(num_genes=cfg.num_genes, response="exp",
                     t_max=cfg.t_max, num_quad=97)
params, hist = nlfm.fit(
    model, nlfm.init_params(cfg.num_genes, model.num_quad),
    t_obs, Y, V, num_iters=1500, learning_rate=0.02,
)
print(f"negative log-joint {float(hist[0]):.2f} -> {float(hist[-1]):.2f}")

f_grid = model.force(params)
f_at_obs = jnp.interp(t_obs, model.quad_grid(), f_grid)
corr = float(np.corrcoef(np.asarray(f_at_obs), np.asarray(data.f_true))[0, 1])
print(f"force recovery corr (shift-invariant): {corr:+.3f}")

# %% [markdown]
# ## 3. Laplace credible bands
#
# The Gaussian posterior over the force at the MAP point: curvature of the
# log-joint in the whitened coordinates, pushed through f = L_ff w.

# %%
lap = model.laplace_force_posterior(params, t_obs, Y, V)
sd = np.sqrt(np.clip(np.asarray(jnp.diagonal(lap.cov)), 0.0, None))
print(f"Laplace band width at obs times: mean 2sd = "
      f"{float(np.mean(2 * sd)):.3f}")

# %% [markdown]
# ## 4. The parity oracle: g = identity IS the linear SIMM
#
# With the identity response the log-joint is exactly quadratic in w, so
# one Newton step from w = 0 lands on the optimum — and that optimum must
# equal the exact GP family's closed-form latent posterior mean (same
# prior, same likelihood, quadrature instead of closed-form integrals).

# %%
from dis_project_tpu.data.dataset import P53Data, train_arrays
from dis_project_tpu.models import simm

p53 = P53Data(replicate=0, source="synthetic")
X, y, var = train_arrays(p53)
lin = NonlinearLFM(num_genes=p53.num_genes, response="identity",
                   t_max=12.0, num_quad=193)
lp = nlfm.init_params(p53.num_genes, lin.num_quad)
# Match latent_predict's variance convention (no learned obs noise).
lp = lp._replace(kinetics=lp.kinetics._replace(
    obs_stddev=jnp.asarray(1e-8, lp.w.dtype)))
tY = jnp.asarray(p53.gene_expressions)
tV = jnp.asarray(p53.gene_variances)


def obj(w):
    return lin.log_joint(lp._replace(w=w), jnp.asarray(p53.timepoints), tY, tV)


w_map = jnp.linalg.solve(-jax.hessian(obj)(lp.w), jax.grad(obj)(lp.w))
f_map = lin.force(lp._replace(w=w_map))

grid = lin.quad_grid()
rows = jnp.stack([grid, -jnp.ones_like(grid), jnp.zeros_like(grid)], -1)
exact = simm.ExactSIMM(num_genes=p53.num_genes, jitter=1e-6)
post = exact.latent_predict(lp.kinetics, rows, X, y, var)
pc = float(np.corrcoef(np.asarray(f_map), np.asarray(post.mean))[0, 1])
print(f"identity-response MAP vs exact GP posterior mean: corr {pc:.6f}")
assert pc > 0.9999

# %%
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

grid_np = np.asarray(model.quad_grid())
mean = np.asarray(lap.mean)
fig, ax = plt.subplots(figsize=(7, 4))
ax.plot(data.timepoints, data.f_true, "k--x", label="true force (oracle)")
ax.plot(grid_np, mean, label="MAP force")
ax.fill_between(grid_np, mean - 2 * sd, mean + 2 * sd, alpha=0.25,
                label="Laplace 95% band")
ax.set_xlabel("time")
ax.set_title(f"exp-response force recovery (corr {corr:.3f}; "
             "identified up to a shift)")
ax.legend()
out_dir = os.environ.get("OUT_DIR", "plots")
os.makedirs(out_dir, exist_ok=True)
path = os.path.join(out_dir, "nonlinear_recovery.png")
fig.savefig(path, dpi=120, bbox_inches="tight")
print("saved", path)
