# %% [markdown]
# # Optimizer comparison: Adam vs L-BFGS on the canonical p53 fit
#
# The reference trains with Adam(0.01) for 150 iterations
# (``src/main.py:45,54``). The framework also ships an L-BFGS path
# (``TrainConfig(optimizer='lbfgs')`` / CLI ``--optimizer lbfgs``); this
# executable doc runs both to convergence on the same problem and prints
# the iteration counts — the end-to-end consumer the flag lacked in r1.
#
# Measured result (synthetic p53, seed 0, f64 CPU): L-BFGS reaches Adam's
# 150-iteration loss (4.8107) at iteration 7 and converges far lower
# (-22.84 by iteration 60), at a higher per-iteration cost (line-search
# re-evaluations). The reference's 150-iteration Adam schedule is an
# early-stopping regulariser as much as an optimiser choice.

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from dis_project_tpu.data.dataset import P53Data, dataset_3d
from dis_project_tpu.models import simm
from dis_project_tpu.training import trainer as tr

data = P53Data(replicate=0, source="synthetic")
X, y, _ = dataset_3d(data)
model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
params0 = simm.init_params(5)

# %%
results = {}
for name, iters in (("adam", 150), ("lbfgs", 60)):
    cfg = tr.TrainConfig(num_iters=iters, optimizer=name)
    res = tr.fit(model, params0, X, y, cfg,
                 gridded=(data.timepoints, data.num_replicates))
    results[name] = np.asarray(res.history)
    print(f"{name:6s}: {iters} iters, final loss {results[name][-1]:.6f}")

# %%
adam_final = results["adam"][-1]
lbfgs = results["lbfgs"]
reached = int(np.argmax(lbfgs <= adam_final)) if (lbfgs <= adam_final).any() else -1
if reached >= 0:
    print(f"L-BFGS reaches Adam's 150-iter loss ({adam_final:.6f}) at "
          f"iteration {reached + 1}")
else:
    print("L-BFGS did not reach Adam's 150-iter loss within its budget")
print(f"L-BFGS final loss after {len(lbfgs)} iters: {lbfgs[-1]:.6f}")
assert np.isfinite(lbfgs).all()
