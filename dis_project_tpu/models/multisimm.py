r"""Exact multi-force SIMM latent force model (R independent latent forces).

The reference implements the single-force SIM motif (one p53 profile
driving every target, ``src/model.py:30-514``); its upstream package (ALFI,
``src/gpytorch_alfi/__init__.py``) is built around the *multi-force*
generalisation. This module provides that generalisation natively:

.. math::
    \frac{dx_j}{dt} = B_j + \sum_{r=1}^R S_{jr}\, f_r(t) - D_j x_j(t),
    \qquad f_r \sim \mathrm{GP}(0,\ k_{ff}(\cdot,\cdot; \ell_r))
    \ \text{independent}

Because the forces are independent and enter linearly, every closed form of
the single-force family (``ops.lfm_kernels``) composes by summation:

- ``K_xx[j,k] = sum_r S_jr S_kr * k_xx(d_j, d_k, 1, 1, l_r)``
- ``K_xf[j, r] = S_jr * k_xf(d_j, 1, l_r)``
- ``K_ff[(r,t),(r',t')] = [r == r'] * k_ff(t, t'; l_r)`` (block-diagonal)

so the Gram assembly is a static Python sum of R vectorised block builds —
each term the same fused XLA program as the single-force path — and the
O(N^3) inference core (custom-VJP MLL, blocked Cholesky) is shared
unchanged. With R = 1 every quantity reduces EXACTLY to
:class:`~dis_project_tpu.models.simm.ExactSIMM` (tested to bit level).

Row encoding extends the reference's ``(t, gene, flag)`` convention
(``src/dataset.py:358-399``): expression rows are unchanged (flag 1, gene
column = gene index); latent rows (flag 0) carry the FORCE index in the
gene column (the single-force reference leaves -1 there — with one force
the index is irrelevant; here it selects which force a row refers to).

Kernel conventions: ``k_xx``/``k_xf`` and the MLL-vs-predict variance
asymmetry follow the single-force family; the force PRIOR uses
``k_ff_consistent`` (the Lawrence convention the closed forms actually
integrate, ``ops/lfm_kernels.py``) — NOT the reference's quirky ``2*l``
``k_ff`` — because this family conditions on a JOINT (x, f) covariance
that must be PSD (measured: the quirky prior leaves the joint matrix
indefinite, min eigenvalue ~ -0.4 on random mixed rows; same reasoning
as the sparse inter-domain path). The R=1 reduction to ``ExactSIMM``
still holds for every reference-visible quantity: the Gram, MLL and
gene posterior never touch ``k_ff``, and the diagonalised latent
posterior agrees because both conventions have unit prior variance on
the diagonal (the latent posterior MEAN involves ``K_xf`` only).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dis_project_tpu.models.base import Gaussian
from dis_project_tpu.ops import bijectors as bij
from dis_project_tpu.ops import lfm_kernels as lfk
from dis_project_tpu.ops import mll as mll_ops
from dis_project_tpu.ops.precision import default_float


class MultiSIMMParams(NamedTuple):
    """Constrained-space parameters of the R-force SIMM.

    basal (G,), decay (G,) — per-gene kinetics B/D;
    sensitivity (G, R) — per-gene-per-force sensitivities S_jr;
    lengthscale (R,) — per-force RBF lengthscales, bounded [0.5, 3.5];
    obs_stddev () — learned observation noise std-dev.
    """

    basal: jnp.ndarray
    sensitivity: jnp.ndarray
    decay: jnp.ndarray
    lengthscale: jnp.ndarray
    obs_stddev: jnp.ndarray


MULTISIMM_BIJECTORS = MultiSIMMParams(
    basal=bij.Softplus(),
    sensitivity=bij.Softplus(),
    decay=bij.Softplus(),
    lengthscale=bij.SigmoidBounded(0.5, 3.5),
    obs_stddev=bij.Softplus(),
)


def init_params(
    num_genes: int, num_forces: int = 2, dtype=None
) -> MultiSIMMParams:
    """Single-force-consistent inits (B=0.05, S=1.0, D=0.4, obs=1.0).

    Lengthscales are spread symmetrically around the reference's 2.5
    (`2.5 + s*(r - (R-1)/2)`) so distinct forces start distinguishable —
    with two identical lengthscales the prior is exchangeable in the
    forces and the MLL surface has a permutation symmetry the optimiser
    cannot break. R = 1 gives exactly [2.5]; R <= 4 uses s = 0.5. The
    spread shrinks for larger R so every init stays strictly INSIDE the
    SigmoidBounded(0.5, 3.5) support — on the bound the unconstraining
    transform is inf, beyond it NaN, and either silently NaNs the whole
    fit.
    """
    dtype = dtype or default_float()
    r = jnp.arange(num_forces, dtype=dtype)
    spread = min(0.5, 1.8 / max(num_forces - 1, 1))  # max offset 0.9
    return MultiSIMMParams(
        basal=jnp.full((num_genes,), 0.05, dtype),
        sensitivity=jnp.full((num_genes, num_forces), 1.0, dtype),
        decay=jnp.full((num_genes,), 0.4, dtype),
        lengthscale=2.5 + spread * (r - (num_forces - 1) / 2.0),
        obs_stddev=jnp.asarray(1.0, dtype),
    )


def constrain(raw: MultiSIMMParams) -> MultiSIMMParams:
    return bij.constrain(raw, MULTISIMM_BIJECTORS)


def unconstrain(params: MultiSIMMParams) -> MultiSIMMParams:
    return bij.unconstrain(params, MULTISIMM_BIJECTORS)


constrain_jit = jax.jit(constrain)
unconstrain_jit = jax.jit(unconstrain)


def cross_covariance(x1, x2, decay, sens, lengthscales):
    """Dense (N, M) multi-force covariance from (t, gene-or-force, flag)
    rows — the R-force generalisation of ``ops.gram.cross_covariance``,
    assembled as a static sum over forces of the single-force block
    formulas (each term one fused XLA elementwise program).
    """
    G, R = sens.shape
    t1 = x1[:, 0]
    g1 = jnp.clip(x1[:, 1].astype(jnp.int32), 0, max(G, R) - 1)
    f1 = x1[:, 2].astype(x1.dtype)
    t2 = x2[:, 0]
    g2 = jnp.clip(x2[:, 1].astype(jnp.int32), 0, max(G, R) - 1)
    f2 = x2[:, 2].astype(x2.dtype)

    gg1 = jnp.clip(g1, 0, G - 1)
    gg2 = jnp.clip(g2, 0, G - 1)
    d1, d2 = decay[gg1], decay[gg2]

    T1, T2 = t1[:, None], t2[None, :]
    D1, D2 = d1[:, None], d2[None, :]
    F1, F2 = f1[:, None], f2[None, :]

    one = jnp.ones((), x1.dtype)
    kxx = jnp.zeros((x1.shape[0], x2.shape[0]), x1.dtype)
    kff = jnp.zeros_like(kxx)
    kxf = jnp.zeros_like(kxx)
    kfx = jnp.zeros_like(kxx)
    for r in range(R):
        ell = lengthscales[r]
        s1r = sens[gg1, r][:, None]
        s2r = sens[gg2, r][None, :]
        # Force-index selectors for latent rows (gene column = force id).
        m1 = (g1 == r).astype(x1.dtype)[:, None]
        m2 = (g2 == r).astype(x2.dtype)[None, :]
        kxx = kxx + s1r * s2r * lfk.k_xx(T1, T2, D1, D2, one, one, ell)
        kff = kff + m1 * m2 * lfk.k_ff_consistent(T1, T2, ell)
        kxf = kxf + m2 * s1r * lfk.k_xf(T1, T2, D1, one, ell)
        kfx = kfx + m1 * s2r * lfk.k_xf(T2, T1, D2, one, ell)

    w_xx = F1 * F2
    w_ff = (1.0 - F1) * (1.0 - F2)
    w_xf = F1 * (1.0 - F2)
    w_fx = (1.0 - F1) * F2
    return w_xx * kxx + w_ff * kff + w_xf * kxf + w_fx * kfx


def force_rows(timepoints, force: int, dtype=None) -> jnp.ndarray:
    """Latent-grid rows for one force: ``(t, force_index, 0)``."""
    t = jnp.asarray(timepoints, dtype or default_float())
    return jnp.stack(
        [t, jnp.full_like(t, force), jnp.zeros_like(t)], axis=-1
    )


def fit(
    model: "ExactMultiSIMM",
    params: MultiSIMMParams,
    x,
    y,
    num_iters: int = 150,
    learning_rate: float = 0.01,
    optimizer=None,
    track_parameters: bool = False,
    full_result: bool = False,
    checkpoint_dir=None,
    checkpoint_every: int = 50,
    resume: bool = True,
):
    """Training to the negative exact MLL via the shared
    :func:`dis_project_tpu.training.generic.fit_loop` (one compiled
    ``lax.scan`` program — the multi-force analogue of
    ``training.trainer.fit``). No clamp schedule: multi-force
    identifiability comes from the distinct per-force lengthscale inits
    (see :func:`init_params`), not a p21-style pin.

    Returns ``(constrained params, (num_iters,) loss history)``, or the
    full :class:`~dis_project_tpu.training.generic.LoopResult` (grad
    norms, parameter trace, optimizer state) with ``full_result=True``.
    ``optimizer`` may be an optax transform or ``'adam'``/``'lbfgs'``.
    """
    from dis_project_tpu.training import generic

    y = y.reshape(-1)

    def loss_fn(raw):
        return -model.mll(constrain(raw), x, y)

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
            clamp_raw=None,
            track_parameters=track_parameters,
            resume=resume,
        )
        return result if full_result else (result.params, result.history)
    result = generic.fit_loop(
        loss_fn,
        unconstrain(params),
        num_iters=num_iters,
        learning_rate=learning_rate,
        optimizer=optimizer or "adam",
        constrain_fn=constrain,
        track_parameters=track_parameters,
    )
    if full_result:
        return result
    return result.params, result.history


@dataclasses.dataclass(frozen=True)
class ExactMultiSIMM:
    """Static configuration + pure methods for the R-force exact SIMM.

    Shares the single-force family's O(N^3) dispatch: the MLL routes
    through the custom-VJP ``ops.mll.mvn_logpdf`` with the blocked
    factoriser at scale (``resolve_chol_impl``).
    """

    num_genes: int = 5
    num_forces: int = 2
    jitter: float = 1e-6

    def mean_function(self, params: MultiSIMMParams, x) -> jnp.ndarray:
        """B_j / D_j on expression rows, 0 on force rows (forces enter the
        steady state only through S f; the basal mean matches the
        single-force convention)."""
        ratio = params.basal / params.decay
        g = jnp.clip(x[:, 1].astype(jnp.int32), 0, self.num_genes - 1)
        return ratio[g] * x[:, 2]

    def cross_covariance(self, params, x1, x2) -> jnp.ndarray:
        return cross_covariance(
            x1, x2, params.decay, params.sensitivity, params.lengthscale
        )

    def gram(self, params, x) -> jnp.ndarray:
        return self.cross_covariance(params, x, x)

    def mll(self, params: MultiSIMMParams, x, y) -> jnp.ndarray:
        """Exact conjugate MLL, single-force Sigma convention
        (jitter + obs_stddev^2, no per-point variances)."""
        y = y.reshape(-1)
        mx = self.mean_function(params, x)
        K = self.gram(params, x)
        sigma = mll_ops.add_diagonal(K, self.jitter + params.obs_stddev**2)
        impl = mll_ops.resolve_chol_impl(x.shape[0], x.dtype)
        return mll_ops.mvn_logpdf(y, mx, sigma, impl=impl)

    def latent_predict(
        self, params: MultiSIMMParams, test_rows, x, y, variances
    ) -> Gaussian:
        """Posterior over latent forces at ``test_rows`` (flag 0, gene
        column = force index; build with :func:`force_rows`). Variance
        handling follows the single-force ``latent_predict`` conventions
        (per-point variances + jitter, diagonalised posterior)."""
        y = y.reshape(-1)
        variances = variances.reshape(-1)
        mean_x = self.mean_function(params, x)

        Kxx = self.gram(params, x)
        Kxx = mll_ops.add_diagonal(Kxx, variances + self.jitter)
        L = mll_ops.cholesky(
            Kxx, mll_ops.resolve_chol_impl(x.shape[0], x.dtype)
        )
        Kxf = self.cross_covariance(params, x, test_rows)  # (N, M)
        solved = mll_ops.chol_solve(L, Kxf)
        mean = solved.T @ (y - mean_x)
        kff_diag = jnp.diagonal(self.gram(params, test_rows))
        corr = jnp.einsum("nm,nm->m", solved, Kxf)
        var = jnp.diag(kff_diag + self.jitter - corr)
        var = mll_ops.add_diagonal(var, self.jitter)
        return Gaussian(mean=mean, cov=var)

    def multi_gene_predict(
        self, params: MultiSIMMParams, test_rows, x, y, variances
    ) -> Gaussian:
        """Posterior over gene expression at ``test_rows`` (flag forced 1);
        single-force conventions (variances + learned obs noise, full
        covariance)."""
        y = y.reshape(-1)
        variances = variances.reshape(-1)
        t2 = test_rows.at[:, 2].set(1)

        mean_x = self.mean_function(params, x)
        mean_t = self.mean_function(params, t2)
        Kxx = self.gram(params, x)
        sigma = mll_ops.add_diagonal(
            Kxx, variances + params.obs_stddev**2
        )
        L = mll_ops.cholesky(
            sigma, mll_ops.resolve_chol_impl(x.shape[0], x.dtype)
        )
        Ktt = self.gram(params, t2)
        Kxt = self.cross_covariance(params, x, t2)
        solved = mll_ops.chol_solve(L, Kxt)
        mean = mean_t + solved.T @ (y - mean_x)
        cov = Ktt - Kxt.T @ solved
        cov = mll_ops.add_diagonal(cov, self.jitter)
        return Gaussian(mean=mean, cov=cov)
