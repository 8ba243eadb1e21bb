# %% [markdown]
# # Streaming (online) inference — the serving path
#
# The batch engines condition on a full dataset; a serving deployment
# sees observations ARRIVE. The streaming API absorbs each new
# observation vector in one O((p+G)^3) update at constant memory — no
# history reprocessing — and forecasts force/gene levels at arbitrary
# horizons from the current carry. The streamed trajectory is BITWISE
# the batch filter's (tests/test_statespace.py::TestStreaming).
#
# Run with `python examples/streaming.py` (CPU, ~30 s).

# %%
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dis_project_tpu.data import synthetic
from dis_project_tpu.data.dataset import train_arrays
from dis_project_tpu.models import simm
from dis_project_tpu.ops import statespace as ss

# %% [markdown]
# ## 1. A "live" data source
#
# Simulate a dataset once, then replay it observation-by-observation as
# a production system would receive it.

# %%
G, T = 5, 30
scfg = synthetic.SyntheticConfig(
    num_genes=G, num_timepoints=T, num_replicates=1, noise_std=0.05
)
data = synthetic.generate_ode(jax.random.PRNGKey(0), scfg, oversample=4)
_, y, _ = train_arrays(data)
t = np.asarray(data.timepoints)
ys = np.asarray(y).reshape(G, T).T  # (T, G) arrival order

params = simm.init_params(G)
carry, aux = ss.streaming_init(params)
rv = 1e-4 + params.obs_stddev**2

# One jitted update closed over the static model pieces: the per-arrival
# serving cost.
update = jax.jit(lambda c, ti, yi: ss.streaming_update(c, aux, ti, yi, rv))

# %% [markdown]
# ## 2. Absorb the stream; forecast as we go
#
# After each arrival, forecast the latent force one time-unit ahead —
# the read path a dashboard would poll.

# %%
for i in range(T):
    carry = update(carry, float(t[i]), jnp.asarray(ys[i]))
    if i in (4, 14, T - 1):
        fm, fv, xm, xv = ss.streaming_predict(
            carry, aux, params, float(t[i]) + 1.0
        )
        print(f"after {i + 1:2d} obs (t={t[i]:5.2f}): ll {float(carry.ll):9.3f}   "
              f"force forecast @+1.0: {float(fm):+.3f} +/- "
              f"{float(jnp.sqrt(fv)):.3f}")

# %% [markdown]
# ## 3. The stream equals the batch — exactly

# %%
v_batch = float(ss.lfm_mll_ss(
    params, jnp.asarray(t), y.reshape(-1), jitter=1e-4,
    parallel=False, uniform=False,
))
print(f"batch MLL {v_batch:.9f}  streamed ll {float(carry.ll):.9f}  "
      f"|delta| {abs(v_batch - float(carry.ll)):.2e}")
assert abs(v_batch - float(carry.ll)) < 1e-9 * max(1.0, abs(v_batch))

# %% [markdown]
# ## 4. Real streams are messy: gaps and dropouts
#
# Per-entry masks delete missing genes from the update exactly (the
# values may be NaN); out-of-order arrivals are rejected loudly (the ll
# goes NaN at the offending call, the state stays valid).

# %%
c2, _ = ss.streaming_init(params)
c2 = ss.streaming_update(
    ss.streaming_init(params)[0], aux, 1.0,
    jnp.asarray([1.0, np.nan, 0.7, np.nan, 0.2]),
    rv, obs_mask=jnp.asarray([1.0, 0.0, 1.0, 0.0, 1.0]),
)
print(f"masked update (2 genes dropped, NaN values): ll {float(c2.ll):.3f}")
bad = ss.streaming_update(c2, aux, 0.5, jnp.ones(G), rv)
print(f"out-of-order arrival: ll -> {float(bad.ll)} (state unchanged: "
      f"{bool(jnp.all(bad.mean == c2.mean))})")

# %% [markdown]
# ## 5. Fixed-cadence serving: freeze the gain (r5)
#
# When arrivals come at a fixed cadence, warm up with exact updates,
# then `streaming_freeze` pins the gain at its fixed point and every
# later arrival costs one m^2 matvec + a triangular solve — the O(m^3)
# covariance leg is gone. Bitwise-consistent with the batch
# `stationary_after` route on the same grid (pinned in tests).

# %%
rng = np.random.default_rng(42)
dt = 0.25
c3, aux3 = ss.streaming_init(params)
for i in range(32):
    c3 = ss.streaming_update(
        c3, aux3, (i + 1) * dt,
        jnp.asarray(rng.normal(size=G) + 1.0), rv,
    )
pack = ss.streaming_freeze(c3, aux3, dt, rv)
for i in range(200):
    c3 = ss.streaming_update_frozen(
        c3, pack, jnp.asarray(rng.normal(size=G) + 1.0)
    )
print(f"232 arrivals (32 exact + 200 frozen): ll {float(c3.ll):.1f}, "
      f"t_last {float(c3.t_last):.2f}")
print("done.")
