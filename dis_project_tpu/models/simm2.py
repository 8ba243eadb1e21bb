r"""Exact second-order (spring-damper) LFM — new model family beyond the
reference (SURVEY.md §2d; the reference implements the first-order SIMM
only). Same functional organisation as :class:`models.simm.ExactSIMM`:
parameters are a pytree, the model object is static config, every method is
pure.

Dynamics per output j (mass normalised):

    x_j'' + 2 alpha_j x_j' + (alpha_j^2 + omega_j^2) x_j = B_j + S_j f(t)

parameterised by the decay rate alpha_j > 0 and damped frequency
omega_j > 0 (always underdamped by construction — no spring/damping
inequality constraint to maintain). Steady-state mean is
B_j / (alpha_j^2 + omega_j^2). Covariances come from
``ops.lfm_kernels2`` (complex-exponential closed forms, quadrature-validated).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dis_project_tpu.models.base import Gaussian
from dis_project_tpu.ops import bijectors as bij
from dis_project_tpu.ops import lfm_kernels2 as lfk2
from dis_project_tpu.ops import mll as mll_ops
from dis_project_tpu.ops.precision import default_float


class SIMM2Params(NamedTuple):
    """Constrained-space parameters of the second-order LFM."""

    basal: jnp.ndarray  # (G,)
    sensitivity: jnp.ndarray  # (G,)
    alpha: jnp.ndarray  # (G,) decay rates (= damping / 2)
    omega: jnp.ndarray  # (G,) damped frequencies
    lengthscale: jnp.ndarray  # ()
    obs_stddev: jnp.ndarray  # ()


SIMM2_BIJECTORS = SIMM2Params(
    basal=bij.Softplus(),
    sensitivity=bij.Softplus(),
    alpha=bij.Softplus(),
    omega=bij.Softplus(),
    lengthscale=bij.SigmoidBounded(0.5, 3.5),
    obs_stddev=bij.Softplus(),
)


def init_params(num_genes: int, dtype=None) -> SIMM2Params:
    """Defaults in the quadrature-validated safe region (omega * l < 5)."""
    dtype = dtype or default_float()
    return SIMM2Params(
        basal=jnp.full((num_genes,), 0.05, dtype),
        sensitivity=jnp.full((num_genes,), 1.0, dtype),
        alpha=jnp.full((num_genes,), 0.4, dtype),
        omega=jnp.full((num_genes,), 1.0, dtype),
        lengthscale=jnp.asarray(2.0, dtype),
        obs_stddev=jnp.asarray(1.0, dtype),
    )


def constrain(raw: SIMM2Params) -> SIMM2Params:
    return bij.constrain(raw, SIMM2_BIJECTORS)


def unconstrain(params: SIMM2Params) -> SIMM2Params:
    return bij.unconstrain(params, SIMM2_BIJECTORS)


# Jitted aliases for pipeline-top-level use — one fused program per
# direction instead of ~7 one-op programs, each ~0.37 s of executable-load
# round trip over the remote-TPU tunnel (see models.simm for the numbers).
constrain_jit = jax.jit(constrain)
unconstrain_jit = jax.jit(unconstrain)


def damping(params: SIMM2Params) -> jnp.ndarray:
    """Physical damping coefficient c = 2 alpha."""
    return 2.0 * params.alpha


def spring(params: SIMM2Params) -> jnp.ndarray:
    """Physical spring constant k = alpha^2 + omega^2."""
    return params.alpha**2 + params.omega**2


@dataclasses.dataclass(frozen=True)
class SecondOrderSIMM:
    """Static configuration + pure methods for the exact second-order LFM."""

    num_genes: int = 5
    jitter: float = 1e-6

    def mean_function(self, params: SIMM2Params, x: jnp.ndarray) -> jnp.ndarray:
        """Steady-state mean B_j / (alpha_j^2 + omega_j^2) on output rows."""
        ratio = params.basal / spring(params)
        g = jnp.clip(x[:, 1].astype(jnp.int32), 0, self.num_genes - 1)
        return ratio[g] * x[:, 2]

    # Above this row count the square Gram build is row-chunked and
    # rematerialised: the complex-erf closed forms otherwise hold ~20
    # (N, N) intermediates through the VJP and OOM a 16 GB chip at N=1e4.
    CHUNKED_GRAM_MIN_N = 4096

    def gram(self, params: SIMM2Params, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[0] >= self.CHUNKED_GRAM_MIN_N:
            return lfk2.cross_covariance2_chunked(
                x, x, params.alpha, params.omega, params.sensitivity,
                params.lengthscale,
            )
        return self.cross_covariance(params, x, x)

    def cross_covariance(
        self, params: SIMM2Params, x1: jnp.ndarray, x2: jnp.ndarray
    ) -> jnp.ndarray:
        return lfk2.cross_covariance2(
            x1, x2, params.alpha, params.omega, params.sensitivity,
            params.lengthscale,
        )

    def mll(self, params: SIMM2Params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Exact conjugate MLL with Sigma = K + (jitter + obs^2) I."""
        y = y.reshape(-1)
        mx = self.mean_function(params, x)
        K = self.gram(params, x)
        sigma = mll_ops.add_diagonal(K, self.jitter + params.obs_stddev**2)
        return mll_ops.mvn_logpdf(y, mx, sigma, impl=self._chol_impl(y))

    def mll_gridded(
        self, params: SIMM2Params, timepoints: jnp.ndarray, y: jnp.ndarray
    ) -> jnp.ndarray:
        """Exact MLL for gene-major gridded outputs via the table Gram.

        Same value as :meth:`mll` on the corresponding rows (tested), but
        the Gram build is :func:`~.lfm_kernels2.gram_xx2_blocked_fast` —
        O(T*G) complex-erf evaluations instead of ~24 per entry, the
        difference between ~2.4 s and milliseconds per build at N=1e4.
        """
        y = y.reshape(-1)
        T = timepoints.shape[0]
        ratio = params.basal / spring(params)
        mx = jnp.repeat(ratio, T)
        K = lfk2.gram_xx2_blocked_fast(
            timepoints, params.alpha, params.omega, params.sensitivity,
            params.lengthscale,
        )
        sigma = mll_ops.add_diagonal(K, self.jitter + params.obs_stddev**2)
        return mll_ops.mvn_logpdf(y, mx, sigma, impl=self._chol_impl(y))

    def _chol_impl(self, y: jnp.ndarray) -> str:
        return mll_ops.resolve_chol_impl(y.shape[0], y.dtype)

    def latent_predict(
        self,
        params: SIMM2Params,
        test_rows: jnp.ndarray,
        x: jnp.ndarray,
        y: jnp.ndarray,
        variances: jnp.ndarray,
    ) -> Gaussian:
        """Exact posterior over the latent force at force rows (flag 0)."""
        y = y.reshape(-1)
        variances = variances.reshape(-1)
        mean_x = self.mean_function(params, x)
        mean_t = self.mean_function(params, test_rows)

        Kxx = self.gram(params, x)
        Kxx = mll_ops.add_diagonal(Kxx, variances + self.jitter)
        L = mll_ops.cholesky(Kxx)
        Kxf = self.cross_covariance(params, x, test_rows)
        solved = mll_ops.chol_solve(L, Kxf)
        mean = mean_t + solved.T @ (y - mean_x)

        Kff = self.gram(params, test_rows)
        var = Kff - solved.T @ Kxf
        var = mll_ops.add_diagonal(var, self.jitter)
        return Gaussian(mean=mean, cov=var)

    def output_predict(
        self,
        params: SIMM2Params,
        test_rows: jnp.ndarray,
        x: jnp.ndarray,
        y: jnp.ndarray,
        variances: jnp.ndarray,
    ) -> Gaussian:
        """Exact posterior over outputs at test rows (flag forced to 1)."""
        y = y.reshape(-1)
        variances = variances.reshape(-1)
        t2 = test_rows.at[:, 2].set(1)
        mean_x = self.mean_function(params, x)
        mean_t = self.mean_function(params, t2)

        Kxx = self.gram(params, x)
        sigma = mll_ops.add_diagonal(Kxx, variances + params.obs_stddev**2)
        L = mll_ops.cholesky(sigma)
        Ktt = self.gram(params, t2)
        Kxt = self.cross_covariance(params, x, t2)
        solved = mll_ops.chol_solve(L, Kxt)
        mean = mean_t + solved.T @ (y - mean_x)
        cov = Ktt - Kxt.T @ solved
        cov = mll_ops.add_diagonal(cov, self.jitter)
        return Gaussian(mean=mean, cov=cov)
