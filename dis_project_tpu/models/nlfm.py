r"""Nonlinear-response latent force model — MAP / Laplace / HMC inference.

The exact SIMM families are linear in the force, which is what lets their
covariances integrate in closed form (reference ``src/model.py:197-369``).
Lawrence, Sanguinetti & Rattray (2006) §5 — the paper the reference
implements — also analyses the NONLINEAR response model

.. math:: \dot x_j(t) = B_j + S_j\,g(f(t)) - D_j x_j(t)

(their ``g = exp`` positivity-constrained variant, estimated by MAP), and
the ALFI package the reference's torch stack refactors ships the same
family.  The reference itself has no nonlinear path; this module provides
it, TPU-native:

- the force is represented by its values on a dense uniform quadrature
  grid through a **whitened** parameterisation ``f = L_ff w`` (``L_ff`` =
  Cholesky of the Lawrence-consistent RBF prior ``exp(-r^2/l^2)`` on the
  grid — the same prior the linear families' closed forms integrate, see
  ``models/svlfm.py`` module notes), so the prior on the trainable ``w``
  is N(0, I) and the MAP objective is well-conditioned;
- gene curves come from the integrating-factor quadrature evaluated as an
  :math:`O(\log Q)`-depth ``associative_scan`` (``ops.odeint`` — no
  sequential ODE stepping, no large exponentials);
- inference is MAP over ``(kinetics, w)`` (one jit scan program), with a
  **Laplace** Gaussian posterior over the force at the MAP point for
  credible bands, and the full-Bayes route reuses ``training.hmc`` on the
  exact same log-joint;
- with ``response='identity'`` the model IS the linear SIMM discretised on
  the grid: the MAP force equals the exact model's closed-form posterior
  mean and the Laplace covariance equals the exact Gaussian conditional
  covariance (to quadrature error) — the parity oracle in
  ``tests/test_nlfm.py``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dis_project_tpu.models import simm
from dis_project_tpu.models.base import Gaussian
from dis_project_tpu.models.simm import SIMM_BIJECTORS, SIMMParams
from dis_project_tpu.ops import bijectors as bij
from dis_project_tpu.ops.odeint import gene_curves, response_fn
from dis_project_tpu.ops.precision import default_float

LOG_2PI = 1.8378770664093453


class NLFMParams(NamedTuple):
    """Kinetics (constrained space) + whitened force values.

    ``kinetics``: ``SIMMParams`` (B/S/D/lengthscale/obs_stddev).
    ``w``: (Q,) whitened force at the quadrature grid — unconstrained by
    construction (its prior is N(0, I)).
    """

    kinetics: SIMMParams
    w: jnp.ndarray


def init_params(num_genes: int, num_quad: int = 97, dtype=None) -> NLFMParams:
    """Reference kinetic inits + zero force (the prior mean)."""
    dtype = dtype or default_float()
    return NLFMParams(
        kinetics=simm.init_params(num_genes, dtype),
        w=jnp.zeros((num_quad,), dtype),
    )


def constrain(raw: NLFMParams) -> NLFMParams:
    return NLFMParams(
        kinetics=bij.constrain(raw.kinetics, SIMM_BIJECTORS), w=raw.w
    )


def unconstrain(params: NLFMParams) -> NLFMParams:
    return NLFMParams(
        kinetics=bij.unconstrain(params.kinetics, SIMM_BIJECTORS), w=params.w
    )


@dataclasses.dataclass(frozen=True)
class NonlinearLFM:
    """Static configuration + pure methods for the nonlinear-response LFM.

    ``num_quad`` is the quadrature grid size Q over ``[0, t_max]``; the
    default 97 = (7-1)*16+1 refines the p53 timepoints 16x (trapezoid
    error ~ (dt/l)^2 — far below observation noise at these scales).
    Observation times need NOT lie on the grid: curves are linearly
    interpolated to them (same O(dt^2) error class as the quadrature).
    """

    num_genes: int = 5
    response: str = "exp"
    t_max: float = 12.0
    num_quad: int = 97
    jitter: float = 1e-6

    # -- force representation ------------------------------------------------

    def quad_grid(self, dtype=None) -> jnp.ndarray:
        dtype = dtype or default_float()
        return jnp.linspace(0.0, self.t_max, self.num_quad, dtype=dtype)

    def force_chol(self, lengthscale, dtype=None) -> jnp.ndarray:
        """Cholesky of the Lawrence-consistent RBF prior on the grid."""
        t = self.quad_grid(dtype)
        K = jnp.exp(-((t[:, None] - t[None, :]) ** 2) / lengthscale**2)
        return jnp.linalg.cholesky(
            K + self.jitter * jnp.eye(self.num_quad, dtype=K.dtype)
        )

    def force(self, params: NLFMParams) -> jnp.ndarray:
        """f(t_grid) = L_ff @ w."""
        L = self.force_chol(params.kinetics.lengthscale, params.w.dtype)
        return L @ params.w

    # -- forward map ----------------------------------------------------------

    def curves(self, params: NLFMParams, f_grid=None) -> jnp.ndarray:
        """Gene expression curves x_j on the quadrature grid, (G, Q).

        Initial condition x_j(0) = B_j / D_j (the synthetic oracle's
        convention, ``data.synthetic.generate_ode``).
        """
        k = params.kinetics
        if f_grid is None:
            f_grid = self.force(params)
        g_vals = response_fn(self.response)(f_grid)
        dt = self.t_max / (self.num_quad - 1)
        return gene_curves(g_vals, k.basal, k.sensitivity, k.decay, dt)

    def curves_at(self, params: NLFMParams, t_obs) -> jnp.ndarray:
        """Curves interpolated to observation times, (G, T_obs)."""
        x = self.curves(params)
        grid = self.quad_grid(x.dtype)
        return jax.vmap(lambda row: jnp.interp(t_obs, grid, row))(x)

    # -- objective -------------------------------------------------------------

    def log_joint(self, params: NLFMParams, t_obs, Y, var) -> jnp.ndarray:
        """log p(Y | kinetics, w) + log N(w | 0, I).

        ``Y``/``var``: (..., G, T_obs) observed expression and fixed
        measurement variances (leading replicate axes broadcast against
        the predicted clean curves). Likelihood variance is
        ``obs_stddev^2 + var`` — the heteroscedastic convention of the
        sparse family (``models/svlfm.py``).
        """
        k = params.kinetics
        x = self.curves_at(params, t_obs)  # (G, T)
        v = k.obs_stddev**2 + var
        resid = Y - x
        loglik = -0.5 * jnp.sum(resid**2 / v + jnp.log(v) + LOG_2PI)
        logprior = -0.5 * jnp.sum(params.w**2) - 0.5 * params.w.size * LOG_2PI
        return loglik + logprior

    # -- posterior -------------------------------------------------------------

    def _laplace_w_cov(self, params: NLFMParams, t_obs, Y, var):
        """H^{-1} with H = -d^2/dw^2 log_joint at ``params.w``. Q is small
        (<= a few hundred), so the dense Hessian is cheap."""

        def obj(w):
            return self.log_joint(params._replace(w=w), t_obs, Y, var)

        H = -jax.hessian(obj)(params.w)
        return jnp.linalg.inv(
            H + self.jitter * jnp.eye(H.shape[0], dtype=H.dtype)
        )

    def laplace_force_posterior(
        self, params: NLFMParams, t_obs, Y, var, cov_w=None
    ) -> Gaussian:
        """Gaussian posterior over f(t_grid) by Laplace at the (MAP) point.

        cov_f = L H^{-1} L^T + jitter*I (the jitter floor keeps the
        floating-point diagonal nonnegative for the band plots); in the
        ``identity``-response case the L H^{-1} L^T term is EXACT (the
        joint is Gaussian in w).  Pass a precomputed ``cov_w`` (from
        :meth:`laplace_posteriors`) to skip the Hessian solve.
        """
        L = self.force_chol(params.kinetics.lengthscale, params.w.dtype)
        if cov_w is None:
            cov_w = self._laplace_w_cov(params, t_obs, Y, var)
        cov = L @ cov_w @ L.T
        cov = cov + self.jitter * jnp.eye(cov.shape[0], dtype=cov.dtype)
        return Gaussian(mean=L @ params.w, cov=cov)

    def laplace_curve_bands(
        self, params: NLFMParams, t_obs, Y, var, cov_w=None
    ) -> Gaussian:
        """Delta-method Gaussian over the gene curves on the grid.

        Linearises the forward map w -> x at the (MAP) point and pushes
        the Laplace w-covariance through: cov_x = J H^{-1} J^T + jitter*I
        with J = dx/dw — exact (up to the jitter floor) for the
        ``identity`` response (x is linear in w). Mean is the stacked
        gene-major curves, shape (G*Q,), matching the reporting layer's
        block convention.
        """

        def flat_curves(w):
            return self.curves(params._replace(w=w)).reshape(-1)

        J = jax.jacfwd(flat_curves)(params.w)  # (G*Q, Q)
        if cov_w is None:
            cov_w = self._laplace_w_cov(params, t_obs, Y, var)
        cov = J @ cov_w @ J.T
        cov = cov + self.jitter * jnp.eye(cov.shape[0], dtype=cov.dtype)
        return Gaussian(mean=flat_curves(params.w), cov=cov)

    def laplace_posteriors(self, params: NLFMParams, t_obs, Y, var):
        """Both Laplace Gaussians (force, curves) from ONE Hessian solve —
        the CLI's post-fit path (the Q x Q Hessian of the ODE-integrated
        log-joint dominates post-fit cost and is identical for both)."""
        cov_w = self._laplace_w_cov(params, t_obs, Y, var)
        return (
            self.laplace_force_posterior(params, t_obs, Y, var, cov_w),
            self.laplace_curve_bands(params, t_obs, Y, var, cov_w),
        )


def fit(
    model: NonlinearLFM,
    params: NLFMParams,
    t_obs,
    Y,
    var,
    num_iters: int = 2000,
    learning_rate: float = 0.01,
    fix_params: bool = False,
    clamp_gene: int = 3,
    optimizer=None,
    track_parameters: bool = False,
    full_result: bool = False,
    checkpoint_dir=None,
    checkpoint_every: int = 50,
    resume: bool = True,
):
    """MAP over (kinetics, w): one compiled ``lax.scan`` program via the
    shared :func:`dis_project_tpu.training.generic.fit_loop`.

    ``fix_params=True`` applies the reference's p21 identifiability pin
    (S=1.0, D=0.8 at ``clamp_gene``) in RAW space every step — for the
    exp response the S <-> force-shift degeneracy (g(f + c) = e^c g(f))
    makes the pin MORE relevant than in the linear family. Returns
    ``(constrained params, (num_iters,) negative-log-joint history)``, or
    the full ``LoopResult`` with ``full_result=True``. ``optimizer`` may
    be an optax transform or ``'adam'``/``'lbfgs'``.
    """
    raw0 = unconstrain(params)
    sp = bij.Softplus()
    s_raw = sp.inverse(jnp.asarray(1.0, params.w.dtype))
    d_raw = sp.inverse(jnp.asarray(0.8, params.w.dtype))

    def clamp(raw):
        if not fix_params:
            return raw
        k = raw.kinetics
        return raw._replace(
            kinetics=k._replace(
                sensitivity=k.sensitivity.at[clamp_gene].set(s_raw),
                decay=k.decay.at[clamp_gene].set(d_raw),
            )
        )

    def loss_fn(raw):
        return -model.log_joint(constrain(raw), t_obs, Y, var)

    from dis_project_tpu.training import generic

    if checkpoint_dir:
        result = generic.fit_checkpointed(
            loss_fn,
            raw0,
            num_iters=num_iters,
            directory=checkpoint_dir,
            checkpoint_every=checkpoint_every,
            learning_rate=learning_rate,
            optimizer=optimizer or "adam",
            constrain_fn=constrain,
            clamp_raw=clamp if fix_params else None,
            track_parameters=track_parameters,
            resume=resume,
        )
        return result if full_result else (result.params, result.history)
    result = generic.fit_loop(
        loss_fn,
        raw0,
        num_iters=num_iters,
        learning_rate=learning_rate,
        optimizer=optimizer or "adam",
        constrain_fn=constrain,
        clamp_raw=clamp if fix_params else None,
        track_parameters=track_parameters,
    )
    if full_result:
        return result
    return result.params, result.history


def force_posterior_hmc(
    model: NonlinearLFM,
    params: NLFMParams,
    t_obs,
    Y,
    var,
    key,
    num_warmup: int = 400,
    num_samples: int = 400,
    num_leapfrog: int = 24,
    num_chains: int = 1,
    mesh=None,
):
    """Full-Bayes posterior over (kinetics, w) — ``training.hmc`` on the
    same log-joint the MAP fit optimises, flat prior on the CONSTRAINED
    kinetics via the bijector Jacobian (the convention of
    ``training.hmc.kinetics_posterior``). Seed the chain at the MAP point.
    Returned samples are in constrained space.  ``num_chains > 1`` returns
    ``(C, S)``-leading samples for R-hat/ESS diagnostics, optionally
    sharded over ``mesh``.
    """
    from dis_project_tpu.training import hmc

    def logdensity(raw):
        p = constrain(raw)
        return model.log_joint(p, t_obs, Y, var) + bij.constrain_log_det(
            raw.kinetics, SIMM_BIJECTORS
        )

    return hmc.sample_constrained(
        logdensity, unconstrain(params), key, num_chains, mesh, constrain,
        dict(num_warmup=num_warmup, num_samples=num_samples,
             num_leapfrog=num_leapfrog),
    )
