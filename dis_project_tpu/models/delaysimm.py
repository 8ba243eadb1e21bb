r"""Delayed-response exact SIMM — per-gene transcriptional delays.

The SIMM ODE responds to the force instantaneously; real transcriptional
cascades do not (binding, elongation, export all take time).  The
ALFI-lineage extension adds a per-gene delay :math:`\delta_j \ge 0`:

.. math:: \dot x_j(t) = B_j + S_j f(t - \delta_j) - D_j x_j(t)

The reference has no delay path (its ``src/model.py`` kernels are the
instantaneous closed forms); this module provides the family **without any
new kernel math**, via an exact reduction:

With the switch-on convention :math:`f(u) = 0` for :math:`u < 0` (the same
convention that gives the instantaneous family its :math:`\mathrm{erf}(t/l
+ \gamma)` boundary terms — the integrals in ``ops.lfm_kernels`` start at
0) and :math:`x_j(0) = B_j/D_j`:

.. math:: x_j(t) = \tilde x_j\big(\max(t - \delta_j,\, 0)\big)

where :math:`\tilde x_j` is the **zero-delay** solution.  Proof: for
:math:`t < \delta_j` the forcing term is zero, so :math:`x_j` sits at its
:math:`B_j/D_j` fixed point; for :math:`t \ge \delta_j`, substituting
:math:`w = u - \delta_j` in the integrating-factor solution gives
:math:`e^{-D_j(t-\delta_j)} \int_0^{t-\delta_j} e^{D_j w} f(w)\,dw` — the
zero-delay solution at time :math:`t - \delta_j`.  Every joint covariance
therefore evaluates the existing closed forms at **time-warped inputs**:

.. math::
    k^{\delta}_{xx}(t, t') &= k_{xx}(\,[t-\delta_j]_+,\, [t'-\delta_k]_+)\\
    k^{\delta}_{xf}(t, t') &= k_{xf}(\,[t-\delta_j]_+,\, t')

with :math:`k_{ff}` and the (constant) mean unchanged, and the boundary
values are consistent automatically (:math:`k_{xf}(0, t') = 0`,
:math:`k_{xx}(0, \cdot) = 0` — the pre-onset gene is deterministic at
:math:`B/D`).  The warp is one VPU ``max`` per row, so the family inherits
the whole O(N^3) dispatch stack (Pallas/table/blocked-Cholesky paths) at
zero extra cost.  Validated against delayed-ODE quadrature oracles in
``tests/test_delaysimm.py``.

Identifiability: a common shift ``delta_j += c`` is *not* exactly
degenerate (the switch-on transient at t=0 breaks translation invariance)
but is weakly identified at coarse samplings — ``fit(fix_params=True)``
additionally pins one gene's delay to 0 (default: the p21 clamp gene, next
to its reference S/D pin) so the remaining delays are read relative to it.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dis_project_tpu.models.base import Gaussian
from dis_project_tpu.ops import bijectors as bij
from dis_project_tpu.ops.precision import default_float


class DelaySIMMParams(NamedTuple):
    """SIMM kinetics + per-gene transcriptional delays (constrained space).

    ``basal/sensitivity/decay``: (G,); ``lengthscale``/``obs_stddev``:
    scalars (single-force SIMM conventions); ``delay``: (G,) nonnegative
    per-gene delays in the same time units as the observations.
    """

    basal: jnp.ndarray
    sensitivity: jnp.ndarray
    decay: jnp.ndarray
    lengthscale: jnp.ndarray
    obs_stddev: jnp.ndarray
    delay: jnp.ndarray


DELAY_BIJECTORS = DelaySIMMParams(
    basal=bij.Softplus(),
    sensitivity=bij.Softplus(),
    decay=bij.Softplus(),
    lengthscale=bij.SigmoidBounded(0.5, 3.5),
    obs_stddev=bij.Softplus(),
    delay=bij.Softplus(),
)


def init_params(num_genes: int, dtype=None, delay0: float = 0.2) -> DelaySIMMParams:
    """Reference kinetic inits (B=0.05, S=1.0, D=0.4, l=2.5, obs=1.0) +
    small positive initial delays (``delay0``; exactly 0 is unreachable
    through the Softplus bijector, and a small offset keeps the warp's
    kink away from the t=0 observation at init)."""
    dtype = dtype or default_float()
    return DelaySIMMParams(
        basal=jnp.full((num_genes,), 0.05, dtype),
        sensitivity=jnp.full((num_genes,), 1.0, dtype),
        decay=jnp.full((num_genes,), 0.4, dtype),
        lengthscale=jnp.asarray(2.5, dtype),
        obs_stddev=jnp.asarray(1.0, dtype),
        delay=jnp.full((num_genes,), delay0, dtype),
    )


def constrain(raw: DelaySIMMParams) -> DelaySIMMParams:
    return bij.constrain(raw, DELAY_BIJECTORS)


def unconstrain(params: DelaySIMMParams) -> DelaySIMMParams:
    return bij.unconstrain(params, DELAY_BIJECTORS)


def warp_rows(x, delay, num_genes: int):
    """Apply the delay time-warp ``t -> max(t - delta_gene, 0)`` to the
    expression rows of a ``(t, gene, flag)`` row matrix; force rows
    (flag 0) pass through unchanged."""
    g = jnp.clip(x[:, 1].astype(jnp.int32), 0, num_genes - 1)
    flag = x[:, 2]
    t_w = jnp.maximum(x[:, 0] - delay[g], 0.0)
    return x.at[:, 0].set(jnp.where(flag == 1, t_w, x[:, 0]))


def fit(
    model: "ExactDelaySIMM",
    params: DelaySIMMParams,
    x,
    y,
    num_iters: int = 150,
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
    """Negative exact MLL, one compiled ``lax.scan`` program via the shared
    :func:`dis_project_tpu.training.generic.fit_loop`.

    ``fix_params=True`` applies the reference's p21 pin (S=1.0, D=0.8 at
    ``clamp_gene``, raw space, every step) AND pins that gene's delay to 0
    — the delay-family identifiability anchor (module notes).  Returns
    ``(constrained params, (num_iters,) loss history)``, or the full
    ``LoopResult`` with ``full_result=True``. ``optimizer`` may be an
    optax transform or ``'adam'``/``'lbfgs'``.
    """
    y = y.reshape(-1)
    raw0 = unconstrain(params)
    sp = bij.Softplus()
    dt = raw0.delay.dtype
    s_raw = sp.inverse(jnp.asarray(1.0, dt))
    d_raw = sp.inverse(jnp.asarray(0.8, dt))
    # Softplus never reaches 0 exactly; a large negative raw value gives a
    # delay below any representable observation spacing (~1e-9).
    zero_raw = jnp.asarray(-20.0, dt)

    def clamp(raw):
        if not fix_params:
            return raw
        return raw._replace(
            sensitivity=raw.sensitivity.at[clamp_gene].set(s_raw),
            decay=raw.decay.at[clamp_gene].set(d_raw),
            delay=raw.delay.at[clamp_gene].set(zero_raw),
        )

    def loss_fn(raw):
        return -model.mll(constrain(raw), x, y)

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


def kinetics_posterior(
    model: "ExactDelaySIMM",
    params: DelaySIMMParams,
    x,
    y,
    key,
    num_warmup: int = 400,
    num_samples: int = 400,
    num_leapfrog: int = 24,
    num_chains: int = 1,
    mesh=None,
):
    """Full-Bayes posterior over (kinetics, delays) — ``training.hmc`` on
    the delayed exact MLL, flat prior on the CONSTRAINED parameters via the
    bijector Jacobian (the convention of
    ``training.hmc.kinetics_posterior``).  Seed at the trained point;
    returned samples are in constrained space.  Like the instantaneous
    posterior this is over the UNCLAMPED model — the delay anchor is a
    point constraint the posterior does not impose, so delays show the
    common-shift spread the anchor exists to resolve.  ``num_chains > 1``
    returns ``(C, S)``-leading samples for R-hat/ESS diagnostics
    (``training.hmc.pytree_diagnostics``), optionally sharded over
    ``mesh``.
    """
    from dis_project_tpu.training import hmc

    y = y.reshape(-1)

    def logdensity(raw):
        p = constrain(raw)
        return model.mll(p, x, y) + bij.constrain_log_det(
            raw, DELAY_BIJECTORS
        )

    return hmc.sample_constrained(
        logdensity, unconstrain(params), key, num_chains, mesh, constrain,
        dict(num_warmup=num_warmup, num_samples=num_samples,
             num_leapfrog=num_leapfrog),
    )


@dataclasses.dataclass(frozen=True)
class ExactDelaySIMM:
    """Static configuration + pure methods for the delayed exact SIMM.

    Every method DELEGATES to an instantaneous :class:`~dis_project_tpu.
    models.simm.ExactSIMM` at time-warped inputs (the module-note
    reduction), so the family genuinely inherits the whole behavioral
    contract (MLL variance asymmetry, diagonalised latent posterior with
    double jitter, flag forced to 1 in the gene posterior) AND the whole
    measured dispatch stack (Pallas symmetric Gram, blocked Cholesky) —
    with ``delay == 0`` every method is bit-identical to the instantaneous
    family (tested).  The ``gram_impl``/``chol_impl`` switches pass
    through.
    """

    num_genes: int = 5
    jitter: float = 1e-4
    gram_impl: str = "auto"
    chol_impl: str = "auto"

    @property
    def _inner(self):
        from dis_project_tpu.models.simm import ExactSIMM

        return ExactSIMM(
            num_genes=self.num_genes,
            jitter=self.jitter,
            gram_impl=self.gram_impl,
            chol_impl=self.chol_impl,
        )

    @staticmethod
    def _kin(params: DelaySIMMParams):
        """The instantaneous-family view of the parameters (delay used only
        through the input warp)."""
        from dis_project_tpu.models.simm import SIMMParams

        return SIMMParams(
            basal=params.basal,
            sensitivity=params.sensitivity,
            decay=params.decay,
            lengthscale=params.lengthscale,
            obs_stddev=params.obs_stddev,
        )

    def _warp(self, params: DelaySIMMParams, x):
        return warp_rows(x, params.delay, self.num_genes)

    def mean_function(self, params: DelaySIMMParams, x) -> jnp.ndarray:
        """B_j / D_j on expression rows, 0 on force rows — the delay does
        not move the fixed point, so the mean is the instantaneous one
        (and is warp-invariant: the warp only touches the time column)."""
        return self._inner.mean_function(self._kin(params), x)

    def cross_covariance(self, params: DelaySIMMParams, x1, x2) -> jnp.ndarray:
        return self._inner.cross_covariance(
            self._kin(params), self._warp(params, x1), self._warp(params, x2)
        )

    def gram(self, params: DelaySIMMParams, x) -> jnp.ndarray:
        return self._inner.gram(self._kin(params), self._warp(params, x))

    def mll(self, params: DelaySIMMParams, x, y) -> jnp.ndarray:
        """Exact conjugate MLL, single-force Sigma convention (jitter +
        obs_stddev^2, NO per-point variances — the reference asymmetry)."""
        return self._inner.mll(self._kin(params), self._warp(params, x), y)

    def latent_predict(
        self, params: DelaySIMMParams, test_rows, x, y, variances
    ) -> Gaussian:
        """Posterior over the force at ``test_rows`` (flag 0) — the
        instantaneous family's conventions (per-point variances + jitter,
        diagonalised posterior, double jitter, no learned obs noise)."""
        return self._inner.latent_predict(
            self._kin(params),
            self._warp(params, test_rows),
            self._warp(params, x),
            y,
            variances,
        )

    def multi_gene_predict(
        self, params: DelaySIMMParams, test_rows, x, y, variances
    ) -> Gaussian:
        """Posterior over expression at ``test_rows`` (flag forced 1);
        variances + learned obs noise in Sigma, full covariance kept.
        The flag is forced BEFORE the warp so test rows are delayed by
        their gene's delta (the inner re-set is a no-op)."""
        t2 = test_rows.at[:, 2].set(1)
        return self._inner.multi_gene_predict(
            self._kin(params),
            self._warp(params, t2),
            self._warp(params, x),
            y,
            variances,
        )
