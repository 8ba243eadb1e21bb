# %% [markdown]
# # Multi-force LFM: two latent transcription factors, one exact GP
#
# The reference models ONE latent force (p53). Real regulatory networks
# have several regulators per target; `models.multisimm` generalises the
# exact SIMM family to R independent latent forces with per-gene-per-force
# sensitivities (the model family the reference's ALFI ancestor is built
# around). This walkthrough simulates a 6-gene network driven by TWO
# forces with different timescales, fits the exact multi-force GP, and
# recovers both force profiles from expression data alone.
#
# Run with `python examples/multi_force.py` (CPU, ~1 min).

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dis_project_tpu.models import multisimm
from dis_project_tpu.models.multisimm import (
    ExactMultiSIMM,
    MultiSIMMParams,
    force_rows,
)

# %% [markdown]
# ## 1. Simulate: joint draw from the 2-force prior
#
# Sampling (expression, f_1, f_2) JOINTLY from the model's own prior gives
# exact ground-truth force profiles — no ODE integration error. Force 0 is
# fast (l=1.0), force 1 slow (l=3.0); each gene mixes them with its own
# sensitivities.

# %%
rng = np.random.default_rng(0)
G, T, M = 6, 24, 80
t = jnp.asarray(np.linspace(0.0, 12.0, T))
grid = jnp.asarray(np.linspace(0.0, 12.0, M))

true = MultiSIMMParams(
    basal=jnp.asarray(rng.uniform(0.01, 0.08, G)),
    sensitivity=jnp.asarray(rng.uniform(0.3, 1.4, (G, 2))),
    decay=jnp.asarray(rng.uniform(0.3, 0.9, G)),
    lengthscale=jnp.asarray([1.0, 3.0]),
    obs_stddev=jnp.asarray(0.05),
)
model = ExactMultiSIMM(num_genes=G, num_forces=2, jitter=1e-8)

times = jnp.tile(t, G)
genes = jnp.repeat(jnp.arange(G, dtype=t.dtype), T)
X = jnp.stack([times, genes, jnp.ones_like(times)], axis=-1)
rows = jnp.concatenate([X, force_rows(grid, 0), force_rows(grid, 1)])

joint = model.gram(true, rows) + 1e-8 * jnp.eye(G * T + 2 * M)
sample = np.asarray(model.mean_function(true, rows)) + np.linalg.cholesky(
    np.asarray(joint)
) @ rng.standard_normal(G * T + 2 * M)

n = G * T
y = jnp.asarray(sample[:n] + 0.05 * rng.standard_normal(n))
f_true = [sample[n : n + M], sample[n + M :]]
var = jnp.full((n,), 0.05**2)
print(f"simulated {G} genes x {T} timepoints driven by 2 forces")

# %% [markdown]
# ## 2. Fit the exact multi-force GP
#
# One compiled scan program; identifiability between forces comes from the
# distinct lengthscale inits, not a clamp.

# %%
fit_model = ExactMultiSIMM(num_genes=G, num_forces=2, jitter=1e-6)
params, hist = multisimm.fit(
    fit_model, multisimm.init_params(G, 2), X, y, num_iters=400
)
print(f"loss {float(hist[0]):.2f} -> {float(hist[-1]):.2f}")
print("learned lengthscales:", np.round(np.asarray(params.lengthscale), 3),
      "(true: [1.0, 3.0])")

# %% [markdown]
# ## 3. Recover both forces
#
# The learned lengthscales decide which posterior force corresponds to
# which truth; match by correlation and report both.

# %%
post = [
    fit_model.latent_predict(params, force_rows(grid, r), X, y, var)
    for r in range(2)
]
# match learned force index to true force index by |corr|
corr = np.zeros((2, 2))
for i in range(2):
    for j in range(2):
        corr[i, j] = np.corrcoef(np.asarray(post[i].mean), f_true[j])[0, 1]
perm = [int(np.argmax(np.abs(corr[i]))) for i in range(2)]
if perm[0] == perm[1]:  # degenerate match — fall back to identity
    perm = [0, 1]
for i in range(2):
    print(f"posterior force {i} <-> true force {perm[i]}: "
          f"corr {corr[i, perm[i]]:+.3f}")

# %% [markdown]
# ## 4. The same model at N = 10^5: sparse variational multi-force
#
# `SparseSIMM(num_forces=R)` stacks the inducing variables over R forces
# (block-diagonal Kuu, per-force inter-domain projections) — the
# constant-memory route when the exact O(N^3) path stops paying. Here we
# just show the collapsed-optimal posterior at the true hyperparameters
# recovering both forces from the same data.

# %%
from dis_project_tpu.models import svlfm

M_ind = 24
sp = svlfm.SparseSIMM(num_genes=G, num_inducing=M_ind, num_forces=2)
sp_params = svlfm.SVLFMParams(
    kinetics=true,
    z=jnp.asarray(np.linspace(0.0, 12.0, M_ind)),
    q_mu=jnp.zeros(2 * M_ind),
    q_sqrt=jnp.eye(2 * M_ind),
)
sp_params = sp.optimal_q(sp_params, X, y, var)
for r in range(2):
    sparse_post = sp.latent_predict(sp_params, grid, force=r)
    c = np.corrcoef(np.asarray(sparse_post.mean), f_true[r])[0, 1]
    print(f"sparse posterior force {r}: corr {c:+.3f} "
          f"({M_ind} inducing points)")

# %%
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

fig, axes = plt.subplots(1, 2, figsize=(11, 4), sharex=True)
for i, ax in enumerate(axes):
    j = perm[i]
    sign = np.sign(corr[i, j]) or 1.0
    mean = sign * np.asarray(post[i].mean)
    sd = np.sqrt(np.clip(np.asarray(jnp.diagonal(post[i].cov)), 0, None))
    ax.plot(grid, f_true[j], "k--", label=f"true force {j}")
    ax.plot(grid, mean, label=f"posterior force {i}")
    ax.fill_between(grid, mean - 2 * sd, mean + 2 * sd, alpha=0.25)
    ax.set_title(f"force {i} (corr {abs(corr[i, j]):.3f})")
    ax.set_xlabel("time")
    ax.legend()
out_dir = os.environ.get("OUT_DIR", "plots")
os.makedirs(out_dir, exist_ok=True)
path = os.path.join(out_dir, "multi_force_recovery.png")
fig.savefig(path, dpi=120, bbox_inches="tight")
print("saved", path)
