# %% [markdown]
# # Torch validation stack tutorial
#
# Executable walkthrough of the cross-framework validation stack — the
# counterpart of the reference's torch notebook
# (``src/gpytorch_alfi/notebook.py:27-89``): build the torch SIMM on the p53
# data, train it eagerly, inspect posteriors, and reproduce the notebook's
# **jitter-tuning demonstration on ``predict_f``** (the reference bumps the
# posterior jitter to 1e-2 at ``notebook.py:68`` to stabilise the
# latent-force conditional). Run with ``python examples/torch_tutorial.py``
# (CPU, ~1 min).

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# CPU demo like the other examples: the shared data/utility imports touch
# jax, and initialising the default TPU platform here would (a) waste the
# accelerator and (b) hang outright if the remote tunnel is down.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

from dis_project_tpu.data.dataset import P53Data, train_arrays
from dis_project_tpu.validation.torch_lfm import TorchP53Dataset, TorchSIMM
from dis_project_tpu.validation import torch_report

# %% [markdown]
# ## 1. Data
#
# Both stacks share one loader; `TorchP53Dataset` is the torch `Dataset`
# view (the reference's `PyTorchDataset` role) with the 1-D blocked
# encoding the torch model consumes.

# %%
data = P53Data(replicate=0, source="synthetic")
_, y, var = train_arrays(data)
tds = TorchP53Dataset.from_p53(data)
train_t, train_y, variances = tds.blocked()
print(f"blocked encoding: train_t {tuple(train_t.shape)}, "
      f"train_y {tuple(train_y.shape)}")

# The reference torch trainer's train/valid/test DataLoader scaffolding
# (trainer_alfi.py:68-99) — both splits default to 0 on this problem.
train_loader, valid_loader, test_loader = torch_report.make_loaders(tds)
print(f"loaders: train={len(train_loader)} items, "
      f"valid={valid_loader}, test={test_loader}")

# %% [markdown]
# ## 2. Train (eager Adam + per-epoch p21 clamp)

# %%
model = TorchSIMM(
    num_genes=data.num_genes,
    timepoints=torch.tensor(np.asarray(data.timepoints)),
    variances=torch.tensor(np.asarray(var)),
    jitter=1e-4,
    num_replicates=data.num_replicates,
)
y_t = torch.tensor(np.asarray(y))
model.set_train_targets(y_t)
history = model.fit(y_t, epochs=100, track_parameters=True)
print(f"final -MLL: {history[-1]:.4f}")
print(f"learned decay: {model.decay.detach().numpy().round(3)}")

# %% [markdown]
# ## 3. Jitter tuning on the latent-force posterior
#
# The training Gram carries per-point measurement variances, but the
# latent-force conditional at a dense test grid can still be badly
# conditioned: too little jitter gives a ragged variance estimate (or
# Cholesky failures at f32), too much washes the band out. The reference
# notebook demonstrates exactly this knob (1e-2 at ``notebook.py:68``).

# %%
t_test = np.linspace(0.0, 13.0, 80)
for jitter in (1e-4, 1e-2):
    model.jitter = jitter
    mean, v = model.predict_f(torch.tensor(t_test))
    print(f"jitter={jitter:g}: latent var range "
          f"[{float(v.min()):.4f}, {float(v.max()):.4f}]")
    torch_report.plot_lf_torch(
        t_test, mean.numpy(), v.numpy(), data,
        save_name=f"torch_jitter{jitter:g}",
    )
model.jitter = 1e-4

# %% [markdown]
# ## 4. Full torch-side artifact set (reference plotter_alfi.py surface)

# %%
m_means, m_vars = model.predict_m(torch.tensor(t_test))
torch_report.plot_gxpred_torch(t_test, m_means.numpy(), m_vars.numpy(), data)
torch_report.plot_comparison_torch(model.param_trace, data)
torch_report.plot_param_trace_torch(model.param_trace, data)
print("saved: plots/lf_torch_jitter*.png, gxpr_torch.png, "
      "comparison_torch.png, param_trace_torch.png")
