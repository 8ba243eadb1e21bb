# %% [markdown]
# # dis_project_tpu tutorial
#
# Executable walkthrough of the framework (the counterpart of the
# reference's tutorial notebooks, reference ``src/notebook.py`` /
# ``src/gpytorch_alfi/notebook.py``): the canonical p53 fit, the ablation
# API, replicate handling, the sparse variational path, and the
# second-order model family. Run top-to-bottom with
# ``python examples/tutorial.py`` (CPU, ~2 min) or cell-by-cell in any
# Jupytext-aware editor.

# %%
import os
import sys

# Make the repo importable when running the file directly from a checkout
# (equivalent to `pip install -e .`).
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # parity precision for the demo
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

# %% [markdown]
# ## 1. Data: the Barenco p53 dataset
#
# `P53Data` mirrors the reference's loader semantics: replicate selection
# (`None` = all three), gene-subset ablations with validation, the
# published latent-force profile and measured kinetics as ground truth.
# `source="synthetic"` generates a p53-shaped dataset when the CSVs are
# not on disk (`data/README.md` in the reference explains the download).

# %%
from dis_project_tpu.data.dataset import P53Data, train_arrays

data = P53Data(replicate=0, source="synthetic")
X, y, var = train_arrays(data)
print("genes:", data.gene_names)
print("rows:", X.shape, "targets:", y.shape)

# %% [markdown]
# ## 2. The exact first-order SIMM model
#
# `ExactSIMM` is static configuration; parameters are a pytree
# (`SIMMParams`) moved between constrained and unconstrained space by
# bijectors. The canonical training run is the reference's: Adam(0.01),
# 150 jit-compiled iterations, with the p21 identifiability clamp.

# %%
from dis_project_tpu.models import simm
from dis_project_tpu.training import trainer as tr

model = simm.ExactSIMM(num_genes=data.num_genes, jitter=1e-4)
result = tr.fit(
    model, simm.init_params(data.num_genes), X, y,
    tr.TrainConfig(num_iters=150),
)
print("final negative MLL:", float(result.history[-1]))
print("learned decays:", np.round(np.asarray(result.params.decay), 3))

# %% [markdown]
# ## 3. Posteriors
#
# `latent_predict` gives the exact posterior over the latent p53 activity
# f(t); `multi_gene_predict` the per-gene expression posterior.

# %%
t_grid = jnp.stack(
    [jnp.linspace(0.0, 13.0, 100), -jnp.ones(100), jnp.zeros(100)], axis=-1
)
force = model.latent_predict(result.params, t_grid, X, y, var)
print("force posterior mean range:",
      float(force.mean.min()), "..", float(force.mean.max()))

# %% [markdown]
# ## 4. Ablations — the reference notebook's API
#
# Gene subsets select by membership (dataset order is kept), replicate
# `None` trains on all three replicates jointly (105-point Gram), and
# `fix_params=False` releases the p21 clamp.

# %%
ablation = P53Data(replicate=None, selected_genes=["p21", "DDB2"],
                   source="synthetic")
Xa, ya, vara = train_arrays(ablation)
model_a = simm.ExactSIMM(num_genes=ablation.num_genes, jitter=1e-4)
res_a = tr.fit(
    model_a, simm.init_params(ablation.num_genes), Xa, ya,
    tr.TrainConfig(num_iters=100, fix_params=False),
)
print("ablation genes:", ablation.gene_names,
      "final loss:", float(res_a.history[-1]))

# %% [markdown]
# ## 5. Sparse variational path (scales to N ~ 1e5)
#
# Inducing points live in the latent-force domain; the collapsed Titsias
# bound gives the optimal variational posterior in closed form for fixed
# hyperparameters, and the whitened minibatch ELBO scales beyond memory.

# %%
from dis_project_tpu.models import svlfm

sv = svlfm.SparseSIMM(num_genes=data.num_genes, num_inducing=32)
sv_params = svlfm.init_params(data.num_genes, 32)
sv_params = sv_params._replace(
    kinetics=result.params  # reuse the exact fit's hyperparameters
)
bound = float(sv.collapsed_elbo(sv_params, X, y, var))
print("collapsed ELBO:", bound)
sv_opt = sv.optimal_q(sv_params, X, y, var)
sparse_force = sv.latent_predict(sv_opt, jnp.linspace(0.0, 13.0, 100))
corr = np.corrcoef(np.asarray(sparse_force.mean),
                   np.asarray(force.mean))[0, 1]
print("sparse-vs-exact latent posterior correlation:", round(corr, 4))

# %% [markdown]
# ## 6. Second-order (spring-damper) model family
#
# `SecondOrderSIMM` models damped-oscillator dynamics; its covariances are
# the first-order closed forms at complex decay rates (see
# `ops/lfm_kernels2`).

# %%
import optax

from dis_project_tpu.models import simm2

so = simm2.SecondOrderSIMM(num_genes=data.num_genes)
raw2 = simm2.unconstrain(simm2.init_params(data.num_genes))
loss2 = lambda r: -so.mll(simm2.constrain(r), X, y)
opt = optax.adam(0.02)
state = opt.init(raw2)
step = jax.jit(lambda r, s: (lambda l, g: (
    optax.apply_updates(r, opt.update(g, s)[0]), opt.update(g, s)[1], l
))(*jax.value_and_grad(loss2)(r)))
for _ in range(50):
    raw2, state, l2 = step(raw2, state)
print("second-order final loss:", float(l2))
p2 = simm2.constrain(raw2)
print("damping:", np.round(np.asarray(simm2.damping(p2)), 3))

# %% [markdown]
# ## 7. Mesh-parallel ensembles
#
# Train many models (ablation configs, replicates, restarts) as one SPMD
# program over a device mesh. On CPU this demo uses whatever devices are
# available; on a TPU slice the same code shards over real chips.

# %%
from dis_project_tpu.parallel import fit_ensemble, make_mesh

n_dev = len(jax.devices())
mesh = make_mesh((n_dev, 1))
y_batch = jnp.stack([y, y * 1.05, y * 0.95, y + 0.1][: max(2, n_dev)])
params_batch, hist = fit_ensemble(
    model, simm.init_params(data.num_genes), mesh, X, y_batch, num_iters=20
)
print("ensemble losses:", np.round(np.asarray(hist[-1]), 3))

print("\nTutorial complete.")
