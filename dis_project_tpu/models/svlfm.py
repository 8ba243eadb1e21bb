r"""Sparse variational SIMM LFM — the N ~ 1e5 scaling path.

The reference is exact-GP only and caps out at N = 105 with O(N^3) cost
(``src/objectives.py:70-78``); this model family has no reference
counterpart (SURVEY.md §2d) and provides the inducing-point route to the
1e5-point BASELINE.json config.

Design: inducing points live in the **latent-force domain** — u = f(z) at M
inducing times z — because every output (gene expression) is a linear
functional of f, so the analytic cross-covariance k_xf (``ops.lfm_kernels``)
gives exact inter-domain projections with no extra approximation:

    Kuu[a,b] = k_ff*(z_a, z_b)       Kuf[a,i] = k_xf(t_i, z_a; D_j, S_j)

All force-domain covariances here use the **Lawrence-consistent** RBF prior
``k_ff* = exp(-r^2/l^2)`` (``ops.lfm_kernels.k_ff_consistent``) — the prior
the closed-form k_xx/k_xf actually integrate. The reference's implemented
k_ff (``2*l`` denominator, ``src/model.py:307-310``) is internally
inconsistent with its own closed forms; on the exact path that is a parity
quirk to reproduce, but here it would make the joint (u, x) covariance
non-PSD (Q_ff can exceed K_xx) and break the variational bound.

Two objectives:

- :func:`elbo` — the uncollapsed, **whitened** Hensman-style bound
  (q(v) = N(m, L_s L_sᵀ), u = Luu v): O(M^3 + B M^2) per minibatch of B
  rows, unbiased in expectation with the N/B scale factor — the true 1e5
  path (constant memory in N).
- :func:`collapsed_elbo` — the Titsias bound with q(u) analytically
  optimal: O(N M^2), tighter, deterministic; the right choice up to
  N ~ 1e4-1e5 when the full dataset fits in HBM. :func:`optimal_q`
  recovers the collapsed optimum as explicit (m, L_s) so the predict
  paths are shared.

Both bounds use the heteroscedastic likelihood variance
``obs_stddev^2 + measurement_variance_i`` (the fixed per-point variances the
reference carries through its predict paths).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dis_project_tpu.models.base import Gaussian
from dis_project_tpu.models.simm import SIMM_BIJECTORS, SIMMParams
from dis_project_tpu.ops import bijectors as bij
from dis_project_tpu.ops import lfm_kernels as lfk
from dis_project_tpu.ops.precision import default_float

LOG_2PI = 1.8378770664093453


class SVLFMParams(NamedTuple):
    """Kinetics + GP hypers (constrained space) and variational state.

    ``kinetics``: the kinetic parameter block — ``SIMMParams``
    (B/S/D/lengthscale/obs_stddev) for the first-order model, or
    ``SIMM2Params`` (B/S/alpha/omega/...) for the second-order family.
    ``z``: (M,) inducing times (unconstrained — times are unbounded).
    ``q_mu``: (M,) whitened variational mean.
    ``q_sqrt``: (M, M) whitened variational square root; only the lower
    triangle is used, diagonal passed through softplus for positivity.
    """

    kinetics: SIMMParams
    z: jnp.ndarray
    q_mu: jnp.ndarray
    q_sqrt: jnp.ndarray


def _kinetics_bijectors(kinetics):
    from dis_project_tpu.models.multisimm import (
        MULTISIMM_BIJECTORS,
        MultiSIMMParams,
    )
    from dis_project_tpu.models.simm2 import SIMM2_BIJECTORS, SIMM2Params

    if isinstance(kinetics, SIMM2Params):
        return SIMM2_BIJECTORS
    if isinstance(kinetics, MultiSIMMParams):
        return MULTISIMM_BIJECTORS
    return SIMM_BIJECTORS


def init_params(
    num_genes: int,
    num_inducing: int,
    t_max: float = 12.0,
    dtype=None,
    order: int = 1,
    num_forces: int = 1,
) -> SVLFMParams:
    """Reference kinetic inits + identity whitened posterior, inducing
    times uniform over [0, t_max]. ``order=2`` selects spring-damper
    kinetics (SIMM2Params); ``num_forces > 1`` selects the multi-force
    first-order family (MultiSIMMParams kinetics; the inducing variables
    become the R stacked force evaluations u = [f_1(z); ...; f_R(z)],
    so the whitened posterior is (R*M)-dimensional over a shared z grid).
    """
    dtype = dtype or default_float()
    if num_forces > 1:
        if order != 1:
            raise ValueError("num_forces > 1 requires order=1")
        from dis_project_tpu.models.multisimm import init_params as kin_init

        kinetics = kin_init(num_genes, num_forces, dtype)
    elif order == 2:
        from dis_project_tpu.models.simm2 import init_params as kin_init

        kinetics = kin_init(num_genes, dtype)
    else:
        from dis_project_tpu.models.simm import init_params as kin_init

        kinetics = kin_init(num_genes, dtype)
    m_total = num_inducing * num_forces
    return SVLFMParams(
        kinetics=kinetics,
        z=jnp.linspace(0.0, t_max, num_inducing, dtype=dtype),
        q_mu=jnp.zeros((m_total,), dtype),
        q_sqrt=jnp.eye(m_total, dtype=dtype),
    )


def constrain(raw: SVLFMParams) -> SVLFMParams:
    return SVLFMParams(
        kinetics=bij.constrain(raw.kinetics, _kinetics_bijectors(raw.kinetics)),
        z=raw.z,
        q_mu=raw.q_mu,
        q_sqrt=_tri_constrain(raw.q_sqrt),
    )


def unconstrain(params: SVLFMParams) -> SVLFMParams:
    return SVLFMParams(
        kinetics=bij.unconstrain(
            params.kinetics, _kinetics_bijectors(params.kinetics)
        ),
        z=params.z,
        q_mu=params.q_mu,
        q_sqrt=_tri_unconstrain(params.q_sqrt),
    )


def _tri_constrain(raw):
    sp = bij.Softplus()
    diag = sp.forward(jnp.diagonal(raw))
    return jnp.tril(raw, -1) + jnp.diag(diag)


def _tri_unconstrain(L):
    sp = bij.Softplus()
    diag = sp.inverse(jnp.diagonal(L))
    return jnp.tril(L, -1) + jnp.diag(diag)


@dataclasses.dataclass(frozen=True)
class SparseSIMM:
    """Static configuration + pure methods for the sparse variational LFM.

    ``order`` selects the output-process dynamics: 1 = first-order SIMM
    (``SIMMParams`` kinetics), 2 = spring-damper (``SIMM2Params``) — the
    variational machinery is identical, only the cross/auto covariances
    and the steady-state mean change (all resolved at trace time).

    ``num_forces > 1`` (order 1 only, ``MultiSIMMParams`` kinetics)
    stacks the inducing variables over R independent latent forces on a
    shared z grid: ``Kuu`` is block-diagonal over forces,
    ``K_{u,x}`` sums nothing (each inducing block projects through its
    own force's ``S[:, r] k_xf(l_r)``), and the prior variance on
    expression rows sums the per-force contributions — everything
    downstream (whitened bound, collapsed bound, predicts) is unchanged.
    Latent rows carry the FORCE index in the gene column (the
    ``models.multisimm`` row convention).
    """

    num_genes: int = 5
    num_inducing: int = 64
    jitter: float = 1e-6
    order: int = 1
    num_forces: int = 1

    # -- shared pieces ------------------------------------------------------

    def mean_function(self, params: SVLFMParams, x: jnp.ndarray) -> jnp.ndarray:
        k = params.kinetics
        g = jnp.clip(x[:, 1].astype(jnp.int32), 0, self.num_genes - 1)
        if self.order == 2:
            ratio = k.basal / (k.alpha**2 + k.omega**2)
        else:
            ratio = k.basal / k.decay
        return ratio[g] * x[:, 2]

    def _luu(self, params: SVLFMParams):
        z = params.z
        ell = params.kinetics.lengthscale
        if self.num_forces > 1:
            # Independent forces: Kuu is block-diagonal over the R force
            # blocks, each the consistent RBF at its own lengthscale.
            Kuu = jax.scipy.linalg.block_diag(
                *[
                    lfk.k_ff_consistent_block(z, z, ell[r])
                    for r in range(self.num_forces)
                ]
            )
        else:
            Kuu = lfk.k_ff_consistent_block(z, z, ell)
        # The RBF Kuu is near-low-rank (a handful of effective degrees of
        # freedom across [0, t_max]); in f32 its kernel-build error alone
        # pushes the tiny eigenvalues negative, so the jitter floor must
        # scale with the working precision or the factorisation NaNs the
        # moment the inducing points leave a perfectly uniform grid.
        floor = 1e-4 if z.dtype == jnp.float32 else self.jitter
        Kuu = Kuu + max(self.jitter, floor) * jnp.eye(
            Kuu.shape[0], dtype=z.dtype
        )
        return jnp.linalg.cholesky(Kuu)

    def _proj(self, params: SVLFMParams, luu, x: jnp.ndarray):
        """A = Luu^{-1} K_{u,x} for mixed (t, gene, flag) rows x: per-row
        cross-covariance to the inducing force values, flag-dispatched
        (expression rows use k_xf, force rows use k_ff)."""
        k = params.kinetics
        t = x[:, 0]
        raw_g = x[:, 1].astype(jnp.int32)
        g = jnp.clip(raw_g, 0, self.num_genes - 1)
        flag = x[:, 2]
        s = k.sensitivity[g]
        # (B, M): gene rows vs inducing times / force rows vs inducing times
        if self.num_forces > 1:
            # One (B, M) block per force: expression rows project through
            # that force's S[:, r] k_xf(l_r); latent rows (gene column =
            # force index) hit only their own force's block.
            fidx = jnp.clip(raw_g, 0, self.num_forces - 1)
            blocks = []
            for r in range(self.num_forces):
                kxu_r = lfk.k_xf(
                    t[:, None], params.z[None, :], k.decay[g][:, None],
                    s[:, r][:, None], k.lengthscale[r],
                )
                kfu_r = (fidx == r).astype(t.dtype)[
                    :, None
                ] * lfk.k_ff_consistent(
                    t[:, None], params.z[None, :], k.lengthscale[r]
                )
                blocks.append(
                    flag[:, None] * kxu_r + (1.0 - flag[:, None]) * kfu_r
                )
            Kxu = jnp.concatenate(blocks, axis=1)  # (B, R*M)
            return jax.scipy.linalg.solve_triangular(
                luu, Kxu.T, lower=True
            )  # (R*M, B)
        if self.order == 2:
            from dis_project_tpu.ops import lfm_kernels2 as lfk2

            kxu = lfk2.k_xf2(
                t[:, None], params.z[None, :], k.alpha[g][:, None],
                k.omega[g][:, None], s[:, None], k.lengthscale,
            )
        else:
            kxu = lfk.k_xf(
                t[:, None], params.z[None, :], k.decay[g][:, None],
                s[:, None], k.lengthscale,
            )
        kfu = lfk.k_ff_consistent(t[:, None], params.z[None, :], k.lengthscale)
        Kxu = flag[:, None] * kxu + (1.0 - flag[:, None]) * kfu
        return jax.scipy.linalg.solve_triangular(luu, Kxu.T, lower=True)  # (M, B)

    def _prior_var(self, params: SVLFMParams, x: jnp.ndarray):
        """Diagonal of the prior covariance at rows x (k_xx or k_ff)."""
        k = params.kinetics
        t = x[:, 0]
        g = jnp.clip(x[:, 1].astype(jnp.int32), 0, self.num_genes - 1)
        flag = x[:, 2]
        s = k.sensitivity[g]
        if self.num_forces > 1:
            d = k.decay[g]
            one = jnp.ones((), t.dtype)
            vxx = sum(
                s[:, r] ** 2 * lfk.k_xx(t, t, d, d, one, one, k.lengthscale[r])
                for r in range(self.num_forces)
            )
        elif self.order == 2:
            from dis_project_tpu.ops import lfm_kernels2 as lfk2

            vxx = lfk2.k_xx2(
                t, t, k.alpha[g], k.omega[g], k.alpha[g], k.omega[g],
                s, s, k.lengthscale,
            )
        else:
            d = k.decay[g]
            vxx = lfk.k_xx(t, t, d, d, s, s, k.lengthscale)
        vff = jnp.ones_like(t)  # k_ff*(t, t) = 1
        return flag * vxx + (1.0 - flag) * vff

    def _marginals(self, params: SVLFMParams, x: jnp.ndarray):
        """Whitened SVGP marginals q(g_i) = N(mu_i, var_i) at rows x."""
        luu = self._luu(params)
        A = self._proj(params, luu, x)  # (M, B)
        mean = self.mean_function(params, x) + A.T @ params.q_mu
        SA = params.q_sqrt.T @ A  # (M, B)
        var = (
            self._prior_var(params, x)
            - jnp.sum(A * A, axis=0)
            + jnp.sum(SA * SA, axis=0)
        )
        return mean, jnp.maximum(var, self.jitter)

    # -- objectives ---------------------------------------------------------

    def kl(self, params: SVLFMParams) -> jnp.ndarray:
        """KL(q(v) || N(0, I)) in the whitened space."""
        Ls = params.q_sqrt
        m = params.q_mu
        M = m.shape[0]
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Ls)))
        return 0.5 * (jnp.sum(m * m) + jnp.sum(Ls * Ls) - logdet - M)

    def elbo(
        self,
        params: SVLFMParams,
        x: jnp.ndarray,
        y: jnp.ndarray,
        variances: jnp.ndarray,
        n_total: int,
    ) -> jnp.ndarray:
        """Uncollapsed whitened ELBO on a minibatch of rows (Hensman-style);
        ``n_total`` scales the likelihood term to the full dataset."""
        y = y.reshape(-1)
        variances = variances.reshape(-1)
        mean, var = self._marginals(params, x)
        noise = params.kinetics.obs_stddev ** 2 + variances
        quad = (y - mean) ** 2 + var
        ll = -0.5 * jnp.sum(jnp.log(2 * jnp.pi * noise) + quad / noise)
        scale = n_total / x.shape[0]
        return scale * ll - self.kl(params)

    def collapsed_elbo(
        self,
        params: SVLFMParams,
        x: jnp.ndarray,
        y: jnp.ndarray,
        variances: jnp.ndarray,
    ) -> jnp.ndarray:
        r"""Titsias (2009) collapsed bound — q(u) analytically optimal:

        .. math:: \log N(y \mid \mu, Q_{ff} + \Lambda)
                  - \tfrac12 \mathrm{tr}(\Lambda^{-1}(K_{ff} - Q_{ff}))

        with :math:`Q_{ff} = A^\top A`, :math:`\Lambda` the heteroscedastic
        noise diagonal — evaluated in O(N M^2) via the Woodbury identity.
        ``q_mu``/``q_sqrt`` are unused (implied optimal).
        """
        y = y.reshape(-1)
        variances = variances.reshape(-1)
        n = y.shape[0]
        noise = params.kinetics.obs_stddev ** 2 + variances  # (N,)
        luu = self._luu(params)
        A = self._proj(params, luu, x)  # (M, N)
        yc = y - self.mean_function(params, x)

        An = A / noise[None, :]  # Lambda^{-1}-scaled
        B = jnp.eye(A.shape[0], dtype=A.dtype) + An @ A.T  # I + A Λ^{-1} Aᵀ
        Lb = jnp.linalg.cholesky(B)
        c = jax.scipy.linalg.solve_triangular(Lb, An @ yc, lower=True)

        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lb))) + jnp.sum(jnp.log(noise))
        quad = jnp.sum(yc * yc / noise) - jnp.sum(c * c)
        logp = -0.5 * (logdet + quad + n * LOG_2PI)

        trace = jnp.sum(
            (self._prior_var(params, x) - jnp.sum(A * A, axis=0)) / noise
        )
        return logp - 0.5 * trace

    def optimal_q(
        self,
        params: SVLFMParams,
        x: jnp.ndarray,
        y: jnp.ndarray,
        variances: jnp.ndarray,
    ) -> SVLFMParams:
        """Closed-form optimal whitened (q_mu, q_sqrt) for fixed hypers —
        S* = B^{-1}, m* = B^{-1} A Λ^{-1} (y - μ) — so the collapsed fit
        plugs straight into the shared predict paths."""
        y = y.reshape(-1)
        variances = variances.reshape(-1)
        noise = params.kinetics.obs_stddev ** 2 + variances
        luu = self._luu(params)
        A = self._proj(params, luu, x)
        yc = y - self.mean_function(params, x)
        An = A / noise[None, :]
        B = jnp.eye(A.shape[0], dtype=A.dtype) + An @ A.T
        Lb = jnp.linalg.cholesky(B)
        m = jax.scipy.linalg.cho_solve((Lb, True), An @ yc)
        # S* = B^{-1} => L_s = Lb^{-T} (since B^{-1} = Lb^{-T} Lb^{-1}).
        eye = jnp.eye(A.shape[0], dtype=A.dtype)
        Ls = jax.scipy.linalg.solve_triangular(Lb.T, eye, lower=False)
        # Re-lower-triangularise: Lb^{-T} is upper; take the Cholesky of S*.
        S = Ls @ Ls.T
        Ls_lower = jnp.linalg.cholesky(S)
        return params._replace(q_mu=m, q_sqrt=Ls_lower)

    # -- prediction ---------------------------------------------------------

    def latent_predict(
        self, params: SVLFMParams, t_grid: jnp.ndarray, force: int = 0
    ) -> Gaussian:
        """q(f*) on force rows at ``t_grid`` (diagonal covariance).

        ``force`` selects which latent force when ``num_forces > 1``
        (latent rows carry the force index in the gene column); with one
        force it is a no-op (the single-force convention's -1 clips to 0).
        """
        rows = jnp.stack(
            [
                t_grid,
                jnp.full_like(t_grid, force),
                jnp.zeros_like(t_grid),
            ],
            axis=-1,
        )
        mean, var = self._marginals(params, rows)
        return Gaussian(mean=mean, cov=jnp.diag(var))

    def gene_predict(self, params: SVLFMParams, rows: jnp.ndarray) -> Gaussian:
        """q(x*) marginals at expression rows (flag forced to 1)."""
        rows = rows.at[:, 2].set(1.0)
        mean, var = self._marginals(params, rows)
        return Gaussian(mean=mean, cov=jnp.diag(var))
