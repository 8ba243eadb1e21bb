r"""Synthetic first-order ODE LFM data generators for the large-N configs.

The reference ships only the 5-gene x 7-timepoint Barenco dataset (N <= 105);
the framework's stress configs (BASELINE.json: 50 outputs x 200 timepoints,
N ~ 1e4 dense; N = 1e5 sparse-variational) need generated data. Two
generators, deliberately independent of each other:

- :func:`sample_prior` — an **exact joint draw** from the SIMM GP prior using
  the framework's own closed-form kernels. Self-consistent with the model:
  fitting it and recovering ``params_true`` is the scale-up convergence test.
  Replicates share one latent-force realisation (the reference treats the
  Gram as replicate-tiled, i.e. fully correlated across replicates —
  ``src/model.py:392-414`` rebuilds identical blocks per replicate pair);
  only the observation noise differs per replicate.

- :func:`generate_ode` — a **quadrature oracle** that never touches the
  kernel algebra: samples f from its RBF prior on a fine grid, integrates
  the ODE ``dx/dt = B + S f(t) - D x`` by exact exponential-kernel
  trapezoid quadrature, subsamples, adds noise. Used to validate the
  closed-form kernels against independent math.

Both return a :class:`SyntheticLFMData` that quacks like ``P53Data`` (same
attribute surface), so ``dataset_3d`` / the trainer / the CLI work unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dis_project_tpu.ops import lfm_kernels as lfk
from dis_project_tpu.ops.precision import default_float


@dataclasses.dataclass
class SyntheticConfig:
    """Shape and ground-truth distribution of a synthetic LFM dataset.

    The defaults give the N ~ 1e4 dense stress config (50 x 200 x 1).
    """

    num_genes: int = 50
    num_timepoints: int = 200
    num_replicates: int = 1
    t_max: float = 12.0
    lengthscale: float = 2.5
    noise_std: float = 0.1
    basal_range: tuple = (0.01, 0.1)
    sensitivity_range: tuple = (0.5, 1.5)
    decay_range: tuple = (0.2, 1.0)
    jitter: float = 1e-6

    @property
    def n_points(self) -> int:
        return self.num_genes * self.num_timepoints * self.num_replicates


class SyntheticLFMData:
    """P53Data-compatible container for generated data (duck-typed: exposes
    ``timepoints``, ``gene_expressions`` (R, G, T), ``gene_variances``,
    ``num_genes``, ``num_replicates``, ``gene_names``, plus the generating
    ground truth ``params_true`` / ``f_true``)."""

    def __init__(self, timepoints, expressions, variances, params_true, f_true):
        self.timepoints = timepoints
        self.gene_expressions = expressions
        self.gene_variances = variances
        self.num_replicates = int(expressions.shape[0])
        self.num_genes = int(expressions.shape[1])
        self.gene_names = [f"g{i:03d}" for i in range(self.num_genes)]
        self.params_true = params_true
        self.f_true = f_true
        self.f_observed = f_true.reshape(1, 1, -1)
        self.replicate = None
        self.selected_indices = list(range(self.num_genes))

    def __len__(self):
        return self.num_replicates * self.num_genes

    def params_ground_truth(self):
        p = self.params_true
        return (
            np.asarray(p["basal"]),
            np.asarray(p["sensitivity"]),
            np.asarray(p["decay"]),
        )


def _sample_kinetics(key, cfg: SyntheticConfig, dtype):
    kb, ks, kd = jax.random.split(key, 3)
    G = cfg.num_genes

    def u(k, lo_hi):
        lo, hi = lo_hi
        return jax.random.uniform(k, (G,), dtype, lo, hi)

    return {
        "basal": u(kb, cfg.basal_range),
        "sensitivity": u(ks, cfg.sensitivity_range),
        "decay": u(kd, cfg.decay_range),
        "lengthscale": jnp.asarray(cfg.lengthscale, dtype),
    }


def sample_prior(
    key, cfg: Optional[SyntheticConfig] = None, dtype=None
) -> SyntheticLFMData:
    """Exact joint draw from the SIMM prior at ``cfg``'s shape.

    One (G*T)-dim Gaussian draw from the closed-form gene-gene covariance
    (plus its conditional latent force on the same timepoints), tiled over
    replicates, with i.i.d. observation noise per replicate.
    """
    cfg = cfg or SyntheticConfig()
    dtype = dtype or default_float()
    t = jnp.linspace(0.0, cfg.t_max, cfg.num_timepoints, dtype=dtype)
    kp, kx, kn, kf = jax.random.split(key, 4)
    params = _sample_kinetics(kp, cfg, dtype)
    d, s, ell = params["decay"], params["sensitivity"], params["lengthscale"]
    G, T, R = cfg.num_genes, cfg.num_timepoints, cfg.num_replicates

    Kxx = lfk.k_xx_block(t, t, d, s, ell)
    n = G * T
    Kxx = Kxx + cfg.jitter * jnp.eye(n, dtype=dtype)
    L = jnp.linalg.cholesky(Kxx)
    mean = jnp.repeat(params["basal"] / d, T)
    x_clean = mean + L @ jax.random.normal(kx, (n,), dtype)

    # Conditional mean of f | x on the same grid — the ground-truth force.
    Kfx = lfk.k_xf_block(t, t, d, s, ell).T  # (T, G*T)
    f_true = Kfx @ jax.scipy.linalg.cho_solve((L, True), x_clean - mean)

    noise = cfg.noise_std * jax.random.normal(kn, (R, n), dtype)
    y = x_clean[None, :] + noise
    expressions = y.reshape(R, G, T)
    variances = jnp.full((R, G, T), cfg.noise_std**2, dtype)
    return SyntheticLFMData(t, expressions, variances, params, f_true)


def generate_ode(
    key,
    cfg: Optional[SyntheticConfig] = None,
    oversample: int = 16,
    dtype=None,
) -> SyntheticLFMData:
    r"""Quadrature oracle: integrate the ODE against a sampled force.

    f is drawn from the Lawrence-consistent RBF prior
    ``k_ff* = exp(-r^2/l^2)`` — the prior the closed-form k_xx/k_xf
    integrate — on a grid ``oversample`` x finer than the output
    timepoints; then

    .. math:: x_j(t) = \frac{B_j}{D_j} + S_j e^{-D_j t}
        \int_0^t e^{D_j u} f(u)\,du

    (initial condition x_j(0) = B_j / D_j) is computed by trapezoid
    quadrature on the fine grid — no closed-form kernel code on this path.
    """
    cfg = cfg or SyntheticConfig()
    dtype = dtype or default_float()
    kp, kf, kn = jax.random.split(key, 3)
    params = _sample_kinetics(kp, cfg, dtype)
    G, T, R = cfg.num_genes, cfg.num_timepoints, cfg.num_replicates

    n_fine = (T - 1) * oversample + 1
    t_fine = jnp.linspace(0.0, cfg.t_max, n_fine, dtype=dtype)
    Kff = lfk.k_ff_consistent_block(t_fine, t_fine, params["lengthscale"])
    Lf = jnp.linalg.cholesky(Kff + 1e-8 * jnp.eye(n_fine, dtype=dtype))
    f_fine = Lf @ jax.random.normal(kf, (n_fine,), dtype)

    dt = t_fine[1] - t_fine[0]
    d, s, b = params["decay"], params["sensitivity"], params["basal"]

    # Cumulative trapezoid of e^{D u} f(u) per gene, vectorised over genes.
    integrand = jnp.exp(d[:, None] * t_fine[None, :]) * f_fine[None, :]  # (G, F)
    steps = 0.5 * dt * (integrand[:, 1:] + integrand[:, :-1])
    cumint = jnp.concatenate(
        [jnp.zeros((G, 1), dtype), jnp.cumsum(steps, axis=1)], axis=1
    )
    x_fine = (b / d)[:, None] + s[:, None] * jnp.exp(
        -d[:, None] * t_fine[None, :]
    ) * cumint  # (G, F)

    x = x_fine[:, ::oversample]  # (G, T)
    f_true = f_fine[::oversample]

    noise = cfg.noise_std * jax.random.normal(kn, (R, G, T), dtype)
    expressions = x[None, :, :] + noise
    variances = jnp.full((R, G, T), cfg.noise_std**2, dtype)
    return SyntheticLFMData(
        jnp.linspace(0.0, cfg.t_max, T, dtype=dtype),
        expressions,
        variances,
        params,
        f_true,
    )
