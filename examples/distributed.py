# %% [markdown]
# # Distributed walkthrough: meshes, SPMD ensembles, sharded linear algebra
#
# Executable tour of the `parallel/` layer — the framework's entire
# scale-out story (SURVEY.md §2d mesh row, §5 distributed-comms row) — on
# an **8-device virtual CPU mesh**, so it runs anywhere: the identical
# code drives a real TPU slice (the mesh axes and sharding annotations
# are the program; XLA inserts the collectives).
#
# Run with `python examples/distributed.py` (CPU, ~2 min).

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Provision 8 virtual CPU devices BEFORE any backend initialises. This is
# the same in-process route `__graft_entry__.dryrun_multichip` uses (env
# flags cannot override a pre-registered accelerator plugin).
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())

# %% [markdown]
# ## 1. Meshes
#
# `make_mesh` builds a named 2-D mesh ("data", "model"):
# - the **data** axis carries independent work (ensemble members,
#   replicates, ablation cells) — no per-step communication;
# - the **model** axis shards the Gram matrix's rows — the factorisation's
#   panel all-gathers ride this axis every step.

# %%
from dis_project_tpu.parallel import make_mesh
from dis_project_tpu.parallel.mesh import make_hybrid_mesh

mesh = make_mesh((4, 2))
print("mesh:", dict(mesh.shape))

# On a multi-slice deployment the two axes must map to the two networks:
# "model" inside a slice (fast ICI), "data" across slices (slow DCN).
# `make_hybrid_mesh` encodes that placement; virtual devices carry no
# slice topology, so we inject one (2 fake slices of 4 devices) to show
# the grouping — on real hardware the `slice_index` attribute drives it.
hybrid = make_hybrid_mesh(
    model_axis=4, slice_id=lambda d: d.id // 4
)
print("hybrid mesh:", dict(hybrid.shape),
      "- model axis never crosses a slice boundary")

# %% [markdown]
# ## 2. SPMD ensembles: many models, ONE compiled program
#
# `fit_ensemble` trains E independent models (here: one per replicate of
# the p53 dataset — BASELINE config 2) as a single `lax.scan` program,
# data-parallel over the mesh. One device dispatch per *fit*, not per
# step. The CLI spelling is
# `python -m dis_project_tpu.main --preset p53-replicates --ensemble`.

# %%
from dis_project_tpu.data.dataset import P53Data
from dis_project_tpu.models import simm
from dis_project_tpu.parallel import fit_ensemble

data = P53Data(replicate=None, source="synthetic")
T, G = int(data.timepoints.shape[0]), data.num_genes
X = jnp.stack(
    [
        jnp.tile(data.timepoints, G),
        jnp.repeat(jnp.arange(G, dtype=data.timepoints.dtype), T),
        jnp.ones(G * T, data.timepoints.dtype),
    ],
    axis=-1,
)
y_batch = jnp.asarray(data.gene_expressions.reshape(data.num_replicates, -1))

model = simm.ExactSIMM(num_genes=G, jitter=1e-4)
params_batch, hist = fit_ensemble(
    model,
    simm.init_params(G),
    mesh,
    X,
    y_batch,
    num_iters=60,
    clamp_gene=data.gene_names.index("p21"),
)
print("per-replicate final losses:",
      [round(float(l), 3) for l in hist[-1]])
print("per-replicate decay[p21] (clamped to 0.8):",
      [round(float(d), 3) for d in params_batch.decay[:, 3]])

# %% [markdown]
# ## 3. Row-sharded exact MLL: the beyond-HBM dense path
#
# XLA's native `cholesky` replicates its operand onto every device, so at
# N = 1e5 (40 GB f32) it cannot run at all. `parallel.dist_cholesky`
# expresses the blocked factorisation over a row-sharded Gram — every
# step is `with_sharding_constraint` annotations, no hand-written
# collectives — with a custom VJP reusing Sigma^{-1}, mirroring
# `ops.mll`. Per-device peak memory is ~N^2/D + N*B.
#
# The CLI spelling is
# `python -m dis_project_tpu.main --preset dense10k --mll-engine dist`.

# %%
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dis_project_tpu.ops import gram as gram_ops
from dis_project_tpu.ops import mll as mll_ops
from dis_project_tpu.parallel import dist_cholesky as dc

mesh1d = Mesh(np.asarray(jax.devices()), ("model",))
spec = NamedSharding(mesh1d, P("model", None))

n = G * T  # tiny here; the same program runs at N=1e4-1e5 on a slice
y = jnp.asarray(y_batch[0])
raw0 = simm.unconstrain(simm.init_params(G))


def loss(raw):
    p = simm.constrain(raw)
    K = gram_ops.gram(X, p.decay, p.sensitivity, p.lengthscale)
    K = jax.lax.with_sharding_constraint(K, spec)
    sigma = mll_ops.add_diagonal(K, 1e-4 + p.obs_stddev**2)
    return -dc.sharded_mvn_logpdf(
        y, model.mean_function(p, X), sigma, mesh1d, "model", block=8
    )


val, grads = jax.jit(jax.value_and_grad(loss))(raw0)
print("sharded -MLL:", round(float(val), 4))
single = -model.mll(simm.init_params(G), X, y)
print("single-device -MLL:", round(float(single), 4), "(must match)")
assert abs(float(val) - float(single)) < 1e-6 * max(1.0, abs(float(single)))

# %% [markdown]
# ## 4. Sharded multi-chain HMC — Bayesian inference as an ensemble
#
# Independent MCMC chains are the third ensemble axis (after replicates
# and ablation configs): `training.hmc.sample_chains` vmaps C chains into
# one program and shards the chain axis over the mesh — no collectives,
# every device carries its chains end-to-end. Convergence diagnostics
# (split-R-hat / ESS) come from the stacked draws.

# %%
from dis_project_tpu.training import hmc

chain_mesh = Mesh(np.asarray(jax.devices()), ("data",))
res = hmc.sample_chains(
    lambda q: -0.5 * jnp.sum((q - 1.0) ** 2),
    jnp.zeros(4),
    jax.random.PRNGKey(0),
    num_chains=8,
    mesh=chain_mesh,
    axis="data",
    num_warmup=150,
    num_samples=200,
    num_leapfrog=8,
)
rhat_max, ess_min = hmc.pytree_diagnostics(res.samples)
print(f"8 sharded chains: max split-R-hat {rhat_max:.4f}, "
      f"min ESS {ess_min:.0f} of 1600")
assert rhat_max < 1.1

# %% [markdown]
# ## 5. Sequence parallelism — the Kalman filter's time axis on the mesh
#
# The state-space engine's filtering recursion is a semigroup, so chunks
# of the TIME axis can run their associative scans on different devices:
# each device reduces its local steps to one composite element, ONE
# all-gather exchanges the D composites (D x (3m^2 + 2m) floats — the
# only collective in the program), and each device prefixes its chunk
# with the product of its predecessors. Exact — a scheduling change, not
# an approximation. CLI: every `--mll-engine ss` route takes `--ss-shard`.

# %%
from dis_project_tpu.data import synthetic
from dis_project_tpu.data.dataset import train_arrays
from dis_project_tpu.models import simm
from dis_project_tpu.ops import statespace as ss

scfg = synthetic.SyntheticConfig(num_genes=4, num_timepoints=33,
                                 num_replicates=1, noise_std=0.1)
sdata = synthetic.sample_prior(jax.random.PRNGKey(7), scfg)
_, y_ss, _ = train_arrays(sdata)
t_ss = jnp.asarray(sdata.timepoints)
raw_ss = simm.unconstrain(simm.init_params(4))
t_mesh = Mesh(np.asarray(jax.devices()), ("t",))


def mll_sharded(raw):
    return ss.lfm_mll_ss(simm.constrain(raw), t_ss, y_ss, jitter=1e-4,
                         shard=(t_mesh, "t"))


def mll_single(raw):
    return ss.lfm_mll_ss(simm.constrain(raw), t_ss, y_ss, jitter=1e-4,
                         parallel=False)


v_sh, g_sh = jax.value_and_grad(mll_sharded)(raw_ss)
v_1d, g_1d = jax.value_and_grad(mll_single)(raw_ss)
g_delta = max(
    float(jnp.abs(a - b).max())
    for a, b in zip(jax.tree_util.tree_leaves(g_sh),
                    jax.tree_util.tree_leaves(g_1d))
)
print(f"time axis over {t_mesh.shape['t']} devices: "
      f"|value delta| {abs(float(v_sh) - float(v_1d)):.2e}, "
      f"max |grad delta| {g_delta:.2e}")
# f32 walkthrough: the sharded program's reduction order differs, so
# agreement is f32-roundoff-level, not bitwise (the f64 suite pins the
# exact-semigroup claim at 1e-10 — tests/test_statespace.py
# TestShardedFilter); a delta above 1e-4 relative would be a real bug.
assert abs(float(v_sh) - float(v_1d)) < 1e-4 * max(1.0, abs(float(v_1d)))

# %% [markdown]
# ## 6. What runs where — the communication story
#
# - **Ensemble step** (section 2): zero cross-member communication; the
#   "data" axis is embarrassingly parallel, so it may span DCN.
# - **Sharded factorisation** (section 3): each block column's panel is
#   all-gathered over the "model" axis for the trailing SYRK — the
#   bandwidth-critical collective, which `make_hybrid_mesh` pins to ICI.
# - **Sharded filter** (section 5): one all-gather of D tiny chunk
#   composites — sequence parallelism with O(T/D) work per device.
# - **Gradients**: the custom VJP emits row-sharded matmuls; XLA inserts
#   reduce-scatters/all-gathers as the shardings require. No NCCL/MPI
#   analogue exists anywhere in the framework — collectives are derived
#   from sharding annotations, never written by hand.

# %%
print("done")
