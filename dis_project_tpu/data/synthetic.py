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
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

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
        """(B, S, D) for first-order data; (B, S, alpha, omega) for
        second-order data (``generate_ode2``)."""
        p = self.params_true
        if "alpha" in p:
            return (
                np.asarray(p["basal"]),
                np.asarray(p["sensitivity"]),
                np.asarray(p["alpha"]),
                np.asarray(p["omega"]),
            )
        return (
            np.asarray(p["basal"]),
            np.asarray(p["sensitivity"]),
            np.asarray(p["decay"]),
        )


def _np_kxx_block(t, decay, sens, ell):
    """Host-f64 gene-gene covariance block — the closed forms of
    ``ops.lfm_kernels`` in pure NumPy so generation precision never depends
    on the JAX x64 policy (scipy.special.erf supplies the f64 erf)."""
    from scipy.special import erf

    t = np.asarray(t, np.float64)
    d = np.asarray(decay, np.float64)
    s = np.asarray(sens, np.float64)
    ell = float(ell)
    G, T = d.shape[0], t.shape[0]

    def h(d_a, d_b, t1, t2):
        g_b = d_b * ell / 2.0
        td = t2 - t1
        mult = np.exp(g_b * g_b) / (d_a + d_b)
        first = np.exp(-d_b * td) * (erf(td / ell - g_b) + erf(t1 / ell + g_b))
        second = np.exp(-(d_b * t2 + d_a * t1)) * (erf(t2 / ell - g_b) + erf(g_b))
        return mult * (first - second)

    # Row-of-blocks loop keeps peak temporaries at (T, G, T) instead of
    # (G, T, G, T) — at G=50, T=200 that is 0.16 GB per temp, not 8 GB.
    K = np.empty((G * T, G * T))
    tt1 = t[:, None, None]
    tt2 = t[None, None, :]
    d_k = d[None, :, None]
    s_k = s[None, :, None]
    for j in range(G):
        mult = s[j] * s_k * ell * (0.5 * np.sqrt(np.pi))
        block = mult * (h(d_k, d[j], tt2, tt1) + h(d[j], d_k, tt1, tt2))
        K[j * T : (j + 1) * T] = block.reshape(T, G * T)
    return K


def _np_kxf_block(t_x, t_f, decay, sens, ell):
    """Host-f64 gene-force cross block (NumPy twin of ``k_xf_block``)."""
    from scipy.special import erf

    t_x = np.asarray(t_x, np.float64)
    t_f = np.asarray(t_f, np.float64)
    d = np.asarray(decay, np.float64)[:, None, None]
    s = np.asarray(sens, np.float64)[:, None, None]
    ell = float(ell)
    g_j = d * ell / 2.0
    td = t_x[None, :, None] - t_f[None, None, :]
    K = (
        0.5 * np.sqrt(np.pi) * ell * s
        * np.exp(g_j * g_j)
        * np.exp(-d * td)
        * (erf(td / ell - g_j) + erf(t_f[None, None, :] / ell + g_j))
    )
    return K.reshape(d.shape[0] * t_x.shape[0], t_f.shape[0])


def _kinetics_draws(key, G, ranges, dtype):
    """The kinetics uniform draws (basal, sensitivity, decay) — the single
    source of truth shared by :func:`_sample_kinetics` (eager, used by the
    ODE generators) and :func:`_prior_rng` (fused program)."""
    kb, ks, kd = jax.random.split(key, 3)

    def u(k, lo_hi):
        lo, hi = lo_hi
        return jax.random.uniform(k, (G,), dtype, lo, hi)

    return u(kb, ranges[0]), u(ks, ranges[1]), u(kd, ranges[2])


def _sample_kinetics(key, cfg: SyntheticConfig, dtype):
    basal, sens, dec = _kinetics_draws(
        key, cfg.num_genes,
        (cfg.basal_range, cfg.sensitivity_range, cfg.decay_range), dtype,
    )
    return {
        "basal": basal,
        "sensitivity": sens,
        "decay": dec,
        "lengthscale": jnp.asarray(cfg.lengthscale, dtype),
    }


@functools.partial(
    jax.jit, static_argnames=("G", "n", "R", "ranges", "dtype")
)
def _prior_rng(key, G, n, R, ranges, dtype):
    """Every random draw of :func:`sample_prior` fused into ONE program.

    Same split structure and draw order as the original inline code, so the
    streams are bit-identical — this exists purely because the remote-TPU
    tunnel charges ~0.37 s of executable-load round trip per program, and a
    dozen tiny threefry/uniform/normal programs dominated the sampling wall.
    """
    kp, kx, kn, kf = jax.random.split(key, 4)
    basal, sens, dec = _kinetics_draws(kp, G, ranges, dtype)
    eps = jax.random.normal(kx, (n,), jnp.float32)
    noise = jax.random.normal(kn, (R, n), jnp.float32)
    return basal, sens, dec, eps, noise


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
    G, T, R = cfg.num_genes, cfg.num_timepoints, cfg.num_replicates
    n = G * T
    ranges = (cfg.basal_range, cfg.sensitivity_range, cfg.decay_range)
    basal, sens, dec, eps_draw, noise_draw = _prior_rng(
        key, G, n, R, ranges, dtype
    )
    params = {
        "basal": basal,
        "sensitivity": sens,
        "decay": dec,
        "lengthscale": jnp.asarray(np.asarray(cfg.lengthscale, dtype)),
    }
    d, s, ell = params["decay"], params["sensitivity"], params["lengthscale"]

    # The prior Gram is near-low-rank (a handful of effective force degrees
    # of freedom), so the build AND factorisation run in HOST float64
    # regardless of the JAX precision policy — an f32 Cholesky here fails
    # outright, and even an f32 kernel *build* perturbs the tiny
    # eigenvalues past any reasonable jitter.
    Kxx = _np_kxx_block(t, d, s, ell)
    jitter = max(cfg.jitter, 1e-9 * float(np.abs(np.diagonal(Kxx)).max()))
    L = np.linalg.cholesky(Kxx + jitter * np.eye(n))
    mean = np.repeat(np.asarray(params["basal"] / d, np.float64), T)
    eps = np.asarray(eps_draw, np.float64)
    x_clean = mean + L @ eps

    # Conditional mean of f | x on the same grid — the ground-truth force.
    Kfx = _np_kxf_block(t, t, d, s, ell).T  # (T, n)
    alpha = np.linalg.solve(L.T, np.linalg.solve(L, x_clean - mean))
    f_true = jnp.asarray(Kfx @ alpha, dtype)

    noise = cfg.noise_std * np.asarray(noise_draw, np.float64)
    y = x_clean[None, :] + noise
    expressions = jnp.asarray(y.reshape(R, G, T).astype(np.asarray(0, dtype).dtype))
    variances = jnp.asarray(np.full((R, G, T), cfg.noise_std**2, np.asarray(0, dtype).dtype))
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
    return _generate_ode_response(
        key, cfg, lambda f: f, oversample=oversample, dtype=dtype
    )


def generate_ode_nonlinear(
    key,
    cfg: Optional[SyntheticConfig] = None,
    response: str = "exp",
    oversample: int = 16,
    dtype=None,
) -> SyntheticLFMData:
    r"""Nonlinear-response quadrature oracle for ``models.nlfm``:

    .. math:: \dot x_j = B_j + S_j\,g(f(t)) - D_j x_j

    with ``g`` one of ``ops.odeint.RESPONSE_NAMES`` (``exp`` is the
    positivity-constrained response of Lawrence et al. 2006 §5). Identical
    draw structure to :func:`generate_ode` — ``response='identity'``
    reproduces it bit-for-bit on the same key — and ``f_true`` is the
    FORCE f (pre-response), which is what the models recover.
    """
    from dis_project_tpu.ops.odeint import response_fn

    return _generate_ode_response(
        key, cfg, response_fn(response, xp=np), oversample=oversample,
        dtype=dtype,
    )


def _generate_ode_response(key, cfg, g, oversample, dtype):
    cfg = cfg or SyntheticConfig()
    dtype = dtype or default_float()
    kp, kf, kn = jax.random.split(key, 3)
    params = _sample_kinetics(kp, cfg, dtype)
    G, T, R = cfg.num_genes, cfg.num_timepoints, cfg.num_replicates

    n_fine = (T - 1) * oversample + 1
    # Force sampling + quadrature in HOST float64 (see sample_prior: the
    # fine-grid RBF Gram is ill-conditioned and the e^{D u} integrand mixes
    # huge/small magnitudes that f32 cannot carry).
    t_fine = np.linspace(0.0, cfg.t_max, n_fine)
    Kff = np.exp(
        -((t_fine[:, None] - t_fine[None, :]) ** 2)
        / float(params["lengthscale"]) ** 2
    )
    Lf = np.linalg.cholesky(Kff + 1e-8 * np.eye(n_fine))
    eps = np.asarray(jax.random.normal(kf, (n_fine,), jnp.float32), np.float64)
    f_fine = Lf @ eps
    g_fine = np.asarray(g(f_fine), np.float64)

    dt = t_fine[1] - t_fine[0]
    d = np.asarray(params["decay"], np.float64)
    s = np.asarray(params["sensitivity"], np.float64)
    b = np.asarray(params["basal"], np.float64)

    # Cumulative trapezoid of e^{D u} g(f(u)) per gene, vectorised over
    # genes.
    integrand = np.exp(d[:, None] * t_fine[None, :]) * g_fine[None, :]  # (G, F)
    steps = 0.5 * dt * (integrand[:, 1:] + integrand[:, :-1])
    cumint = np.concatenate(
        [np.zeros((G, 1)), np.cumsum(steps, axis=1)], axis=1
    )
    x_fine = (b / d)[:, None] + s[:, None] * np.exp(
        -d[:, None] * t_fine[None, :]
    ) * cumint  # (G, F)

    x = x_fine[:, ::oversample]  # (G, T)
    f_true = jnp.asarray(f_fine[::oversample], dtype)

    noise = cfg.noise_std * np.asarray(
        jax.random.normal(kn, (R, G, T), jnp.float32), np.float64
    )
    expressions = jnp.asarray(x[None, :, :] + noise, dtype)
    variances = jnp.full((R, G, T), cfg.noise_std**2, dtype)
    return SyntheticLFMData(
        jnp.linspace(0.0, cfg.t_max, T, dtype=dtype),
        expressions,
        variances,
        params,
        f_true,
    )


def generate_ode_delay(
    key,
    cfg: Optional[SyntheticConfig] = None,
    delays=None,
    delay_range: tuple = (0.0, 2.0),
    oversample: int = 16,
    dtype=None,
) -> SyntheticLFMData:
    r"""Delayed-response quadrature oracle for ``models.delaysimm``:

    .. math:: \dot x_j = B_j + S_j f(t - \delta_j) - D_j x_j

    with the switch-on convention ``f(u) = 0`` for ``u < 0`` (the same
    convention as the closed forms' ``erf(t/l + gamma)`` boundary terms).
    Identical draw structure to :func:`generate_ode` — zero delays
    reproduce it bit-for-bit on the same key. ``delays``: explicit (G,)
    ground-truth delays; default draws uniform from ``delay_range`` with
    gene 0 PINNED to 0 — the same anchor ``delaysimm.fit`` applies, so
    recovered delays are comparable without resolving the weak
    common-shift mode. Ground truth lands in ``params_true['delay']``.
    """
    cfg = cfg or SyntheticConfig()
    dtype = dtype or default_float()
    kp, kf, kn = jax.random.split(key, 3)
    kdel = jax.random.fold_in(key, 17)  # off-stream: kp/kf/kn untouched
    params = _sample_kinetics(kp, cfg, dtype)
    G, T, R = cfg.num_genes, cfg.num_timepoints, cfg.num_replicates
    if delays is None:
        delays = np.asarray(
            jax.random.uniform(
                kdel, (G,), jnp.float32, *delay_range
            ),
            np.float64,
        )
        delays[0] = 0.0
    else:
        delays = np.asarray(delays, np.float64)
    params["delay"] = jnp.asarray(delays, dtype)

    n_fine = (T - 1) * oversample + 1
    t_fine = np.linspace(0.0, cfg.t_max, n_fine)
    Kff = np.exp(
        -((t_fine[:, None] - t_fine[None, :]) ** 2)
        / float(params["lengthscale"]) ** 2
    )
    Lf = np.linalg.cholesky(Kff + 1e-8 * np.eye(n_fine))
    eps = np.asarray(jax.random.normal(kf, (n_fine,), jnp.float32), np.float64)
    f_fine = Lf @ eps

    dt = t_fine[1] - t_fine[0]
    d = np.asarray(params["decay"], np.float64)
    s = np.asarray(params["sensitivity"], np.float64)
    b = np.asarray(params["basal"], np.float64)

    # Per-gene delayed forcing on the fine grid: f(u - delta_j), linearly
    # interpolated, 0 before switch-on.
    f_del = np.stack(
        [np.interp(t_fine - delays[j], t_fine, f_fine, left=0.0)
         for j in range(G)]
    )  # (G, F)

    integrand = np.exp(d[:, None] * t_fine[None, :]) * f_del
    steps = 0.5 * dt * (integrand[:, 1:] + integrand[:, :-1])
    cumint = np.concatenate(
        [np.zeros((G, 1)), np.cumsum(steps, axis=1)], axis=1
    )
    x_fine = (b / d)[:, None] + s[:, None] * np.exp(
        -d[:, None] * t_fine[None, :]
    ) * cumint

    x = x_fine[:, ::oversample]
    f_true = jnp.asarray(f_fine[::oversample], dtype)
    noise = cfg.noise_std * np.asarray(
        jax.random.normal(kn, (R, G, T), jnp.float32), np.float64
    )
    expressions = jnp.asarray(x[None, :, :] + noise, dtype)
    variances = jnp.full((R, G, T), cfg.noise_std**2, dtype)
    return SyntheticLFMData(
        jnp.linspace(0.0, cfg.t_max, T, dtype=dtype),
        expressions,
        variances,
        params,
        f_true,
    )


def generate_ode_multi(
    key,
    cfg: Optional[SyntheticConfig] = None,
    num_forces: int = 2,
    oversample: int = 16,
    lengthscales=None,
    dtype=None,
) -> SyntheticLFMData:
    r"""Multi-force quadrature oracle: R independent RBF forces, each gene
    mixing them through its own (G, R) sensitivities:

    .. math:: x_j(t) = \frac{B_j}{D_j} + e^{-D_j t}
        \int_0^t e^{D_j u} \sum_r S_{jr} f_r(u)\,du

    The per-gene *mixed* force ``g_j = S_j \cdot f`` enters the same
    trapezoid quadrature as :func:`generate_ode` (forces enter linearly).
    ``lengthscales`` defaults to ``linspace(1.0, 3.0, R)`` — distinct
    timescales so the forces are identifiable from expression alone.
    ``f_true`` is returned with shape (R, T).
    """
    cfg = cfg or SyntheticConfig()
    dtype = dtype or default_float()
    R = num_forces
    if lengthscales is None:
        lengthscales = np.linspace(1.0, 3.0, R) if R > 1 else [cfg.lengthscale]
    lengthscales = np.asarray(lengthscales, np.float64)
    kp, ks2, kf, kn = jax.random.split(key, 4)
    params = _sample_kinetics(kp, cfg, dtype)
    G, T, Rep = cfg.num_genes, cfg.num_timepoints, cfg.num_replicates
    lo, hi = cfg.sensitivity_range
    sens = jax.random.uniform(ks2, (G, R), dtype, lo, hi)
    params = dict(params)
    params["sensitivity"] = sens
    params["lengthscale"] = jnp.asarray(lengthscales, dtype)

    n_fine = (T - 1) * oversample + 1
    t_fine = np.linspace(0.0, cfg.t_max, n_fine)
    # R independent force draws (host f64 — see generate_ode).
    eps = np.asarray(
        jax.random.normal(kf, (R, n_fine), jnp.float32), np.float64
    )
    f_fine = np.zeros((R, n_fine))
    dist2 = (t_fine[:, None] - t_fine[None, :]) ** 2
    for r in range(R):
        Kff = np.exp(-dist2 / lengthscales[r] ** 2)
        f_fine[r] = np.linalg.cholesky(Kff + 1e-8 * np.eye(n_fine)) @ eps[r]

    dt = t_fine[1] - t_fine[0]
    d = np.asarray(params["decay"], np.float64)
    s = np.asarray(sens, np.float64)
    b = np.asarray(params["basal"], np.float64)

    mixed = s @ f_fine  # (G, F): per-gene mixed force
    integrand = np.exp(d[:, None] * t_fine[None, :]) * mixed
    steps = 0.5 * dt * (integrand[:, 1:] + integrand[:, :-1])
    cumint = np.concatenate(
        [np.zeros((G, 1)), np.cumsum(steps, axis=1)], axis=1
    )
    x_fine = (b / d)[:, None] + np.exp(-d[:, None] * t_fine[None, :]) * cumint

    x = x_fine[:, ::oversample]  # (G, T)
    f_true = jnp.asarray(f_fine[:, ::oversample], dtype)  # (R, T)

    noise = cfg.noise_std * np.asarray(
        jax.random.normal(kn, (Rep, G, T), jnp.float32), np.float64
    )
    expressions = jnp.asarray(x[None, :, :] + noise, dtype)
    variances = jnp.full((Rep, G, T), cfg.noise_std**2, dtype)
    return SyntheticLFMData(
        jnp.linspace(0.0, cfg.t_max, T, dtype=dtype),
        expressions,
        variances,
        params,
        f_true,
    )


def generate_ode2(
    key,
    cfg: Optional[SyntheticConfig] = None,
    oversample: int = 16,
    alpha_range: tuple = (0.2, 0.8),
    omega_range: tuple = (0.6, 1.6),
    dtype=None,
) -> SyntheticLFMData:
    r"""Second-order (spring-damper) quadrature oracle.

    Integrates :math:`\ddot x + 2\alpha \dot x + (\alpha^2+\omega^2) x =
    B + S f(t)` with resting initial conditions (x(0) = B/k, x'(0) = 0)
    against a force drawn from the consistent RBF prior, by trapezoid
    convolution with the damped-oscillator Green's function — independent
    of the complex-erf closed forms in ``ops.lfm_kernels2``. Ground-truth
    kinetics live in ``params_true`` (keys ``alpha``/``omega`` replacing
    ``decay``).
    """
    cfg = cfg or SyntheticConfig()
    dtype = dtype or default_float()
    kp, kf, kn, ka, kw = jax.random.split(key, 5)
    base = _sample_kinetics(kp, cfg, dtype)
    G, T, R = cfg.num_genes, cfg.num_timepoints, cfg.num_replicates

    def u(k, lo_hi):
        lo, hi = lo_hi
        return jax.random.uniform(k, (G,), dtype, lo, hi)

    params = {
        "basal": base["basal"],
        "sensitivity": base["sensitivity"],
        "alpha": u(ka, alpha_range),
        "omega": u(kw, omega_range),
        "lengthscale": base["lengthscale"],
    }

    n_fine = (T - 1) * oversample + 1
    t_fine = np.linspace(0.0, cfg.t_max, n_fine)
    Kff = np.exp(
        -((t_fine[:, None] - t_fine[None, :]) ** 2)
        / float(params["lengthscale"]) ** 2
    )
    Lf = np.linalg.cholesky(Kff + 1e-8 * np.eye(n_fine))
    eps = np.asarray(jax.random.normal(kf, (n_fine,), jnp.float32), np.float64)
    f_fine = Lf @ eps

    dt = t_fine[1] - t_fine[0]
    a = np.asarray(params["alpha"], np.float64)[:, None]
    w = np.asarray(params["omega"], np.float64)[:, None]
    s = np.asarray(params["sensitivity"], np.float64)[:, None]
    b = np.asarray(params["basal"], np.float64)[:, None]
    spring = a**2 + w**2

    # x(t_i) = B/k + S * trapz_u g(t_i - u) f(u): direct convolution per
    # output time (the Green's function is not separable like e^{-D t},
    # so no single cumulative integral; F = T*oversample sums of length F).
    # tau[_, i, f] = t_out[i] - u[f] (the Green's function argument)
    tau = t_fine[None, ::oversample, None] - t_fine[None, None, :]  # (1,T,F)
    green = np.where(
        tau >= 0,
        np.exp(-a[:, :, None] * tau) * np.sin(w[:, :, None] * tau)
        / w[:, :, None],
        0.0,
    )  # (G, T, F)
    weights = np.full(n_fine, dt)
    weights[0] = weights[-1] = dt / 2.0
    x = b / spring + s * np.einsum("gtf,f,f->gt", green, f_fine, weights)

    f_true = jnp.asarray(f_fine[::oversample], dtype)
    noise = cfg.noise_std * np.asarray(
        jax.random.normal(kn, (R, G, T), jnp.float32), np.float64
    )
    expressions = jnp.asarray(x[None, :, :] + noise, dtype)
    variances = jnp.full((R, G, T), cfg.noise_std**2, dtype)
    data = SyntheticLFMData(
        jnp.linspace(0.0, cfg.t_max, T, dtype=dtype),
        expressions,
        variances,
        params,
        f_true,
    )
    return data
