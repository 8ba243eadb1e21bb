"""Exact SIMM latent force model — the flagship model family.

Functionally equivalent to the reference's ``ExactLFM``
(``src/model.py:30-514``) but organised the JAX way: parameters are a plain
pytree (:class:`SIMMParams`), the model object holds only *static*
configuration (gene count, jitter, behavioral switches), and every method is
a pure function of ``(params, arrays)`` so the whole pipeline jits, vmaps and
shards without framework machinery.

Behavioral parity notes (each deliberate, see SURVEY.md §2/§7):

- The conjugate MLL adds ``jitter`` and ``obs_stddev**2`` to the Gram but NOT
  the fixed per-point measurement variances, while both predict paths DO add
  them — the reference's asymmetry (``src/objectives.py:70-73`` vs
  ``src/model.py:446-449,489-499``).
- ``latent_predict`` diagonalises its posterior covariance and adds jitter
  twice (once to Kff, once after diagonalisation), and does NOT add learned
  observation noise (``src/model.py:420-463``).
- ``multi_gene_predict`` forces the flag column of the test rows to 1 and
  keeps the full covariance (``src/model.py:465-514``).
- ``mean_function`` defaults to *index-based* B_g/D_g (correct for every
  replicate layout); ``legacy_block_mean=True`` reproduces the reference's
  block-repeat indexing (``src/model.py:143-149``), which silently misaligns
  for multi-replicate inputs — kept only as a parity oracle.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dis_project_tpu.models.base import Gaussian
from dis_project_tpu.ops import bijectors as bij
from dis_project_tpu.ops import gram as gram_ops
from dis_project_tpu.ops import mll as mll_ops
from dis_project_tpu.ops.precision import default_float


class SIMMParams(NamedTuple):
    """Trainable kinetic and GP hyperparameters (constrained space).

    basal (G,), sensitivity (G,), decay (G,) — per-gene kinetics B/S/D;
    lengthscale () — RBF prior lengthscale, bounded to [0.5, 3.5];
    obs_stddev () — learned observation noise std-dev.
    Initial values match reference ``src/model.py:99-108,114,66``.
    """

    basal: jnp.ndarray
    sensitivity: jnp.ndarray
    decay: jnp.ndarray
    lengthscale: jnp.ndarray
    obs_stddev: jnp.ndarray


SIMM_BIJECTORS = SIMMParams(
    basal=bij.Softplus(),
    sensitivity=bij.Softplus(),
    decay=bij.Softplus(),
    lengthscale=bij.SigmoidBounded(0.5, 3.5),
    obs_stddev=bij.Softplus(),
)


def init_params(num_genes: int, dtype=None, shared_kinetics: bool = False) -> SIMMParams:
    """Reference inits: B=0.05, S=1.0, D=0.4, l=2.5, obs_stddev=1.0.

    ``shared_kinetics=True`` ties B/S/D across genes (one trainable value
    each, shape (1,)) — the shared-vs-per-gene ablation axis; pair with
    ``ExactSIMM(shared_kinetics=True)``.
    """
    dtype = dtype or default_float()
    g = 1 if shared_kinetics else num_genes
    return SIMMParams(
        basal=jnp.full((g,), 0.05, dtype),
        sensitivity=jnp.full((g,), 1.0, dtype),
        decay=jnp.full((g,), 0.4, dtype),
        lengthscale=jnp.asarray(2.5, dtype),
        obs_stddev=jnp.asarray(1.0, dtype),
    )


def constrain(raw: SIMMParams) -> SIMMParams:
    return bij.constrain(raw, SIMM_BIJECTORS)


def unconstrain(params: SIMMParams) -> SIMMParams:
    return bij.unconstrain(params, SIMM_BIJECTORS)


# Jitted aliases for PIPELINE-TOP-LEVEL use (outside any jit trace): eager
# bijector chains dispatch ~7 one-op programs each, and over the remote-TPU
# tunnel every program costs ~0.37 s of executable-load round trip per
# process. One fused program per direction instead. Inside jit traces keep
# calling the plain functions.
constrain_jit = jax.jit(constrain)
unconstrain_jit = jax.jit(unconstrain)


def _on_tpu() -> bool:
    # The axon tunnel reports platform 'axon'/'TPU v5 lite'; anything that is
    # not cpu/gpu gets the TPU-tuned defaults.
    return jax.default_backend() not in ("cpu", "gpu")


@dataclasses.dataclass(frozen=True)
class ExactSIMM:
    """Static configuration + pure methods for the exact SIMM LFM.

    Backend dispatch (all resolved at **trace time** from static shape,
    dtype and the default JAX backend — nothing dynamic enters the jit):

    - ``gram_impl``: ``'auto' | 'xla' | 'pallas'``. ``'auto'`` routes
      *square* Grams through the lower-triangle symmetric Pallas kernel
      (``ops.pallas_gram.gram_sym`` — half the transcendentals, mirrored
      by DMA; v5e r2: 1.92 vs 2.39 ms against XLA at N=8192) for f32
      N >= ``PALLAS_GRAM_MIN_N`` on TPU with no upper cutoff, and
      *rectangular* cross-covariances through the dense tile kernel only
      inside [``PALLAS_GRAM_MIN_N``, ``PALLAS_GRAM_MAX_N``) — beyond that
      XLA's fused erf codegen wins (1.5x at N=8192) — else the XLA-fused
      block formulas.
    - ``chol_impl``: ``'auto' | 'xla' | 'blocked'``. ``'auto'`` picks the
      blocked factoriser (``ops.pallas_cholesky``) for f32
      N >= ``BLOCKED_CHOL_MIN_N`` on TPU — for f32 that is the r3
      transposed-layout two-level form (v5e, real-Gram, mandatory
      f32-faithful matmul precision: 0.52 vs 0.73 ms at N=2048, 1.47 vs
      1.70 at 4096, 6.10 vs 7.96 at 8192 against the r2 list form, and
      12.9 ms for XLA's native ``cholesky`` at 8192).  It is also the
      building block of the *distributed* factoriser, which XLA's op
      cannot shard.
    - ``canonical_rows``: promise that inputs follow the canonical row
      population — training rows all gene-expression, latent grids all
      force rows — letting the Pallas path specialise its branch ``kind``
      instead of evaluating all four flag branches per tile.
    """

    num_genes: int = 5
    jitter: float = 1e-6
    legacy_block_mean: bool = False
    gram_impl: str = "auto"
    chol_impl: str = "auto"
    canonical_rows: bool = False
    # Tie B/S/D across genes (one trainable value each; params hold
    # shape-(1,) kinetics) — the shared-vs-per-gene ablation.
    shared_kinetics: bool = False

    PALLAS_GRAM_MIN_N = 512
    PALLAS_GRAM_MAX_N = 6144
    # Left-looking blocked factoriser beats XLA's native cholesky on v5e
    # f32 from N=2048 up (see chol_impl note for the measured table).
    # Canonical threshold lives in ops.mll (shared with SecondOrderSIMM).
    BLOCKED_CHOL_MIN_N = mll_ops.BLOCKED_CHOL_MIN_N

    # -- backend resolution ------------------------------------------------

    def _resolve_gram(self, n: int, dtype) -> str:
        if self.gram_impl != "auto":
            return self.gram_impl
        if (
            self.PALLAS_GRAM_MIN_N <= n < self.PALLAS_GRAM_MAX_N
            and dtype == jnp.float32
            and _on_tpu()
        ):
            return "pallas"
        return "xla"

    def _resolve_chol(self, n: int, dtype) -> str:
        if self.chol_impl != "auto":
            return self.chol_impl
        return mll_ops.resolve_chol_impl(n, dtype)

    def _kind(self, default: str) -> str:
        return default if self.canonical_rows else "mixed"

    def _expand(self, params: SIMMParams) -> SIMMParams:
        """Broadcast shared (1,) kinetics to per-gene (G,) for the gathers."""
        if not self.shared_kinetics:
            return params
        G = self.num_genes
        return params._replace(
            basal=jnp.broadcast_to(params.basal, (G,)),
            sensitivity=jnp.broadcast_to(params.sensitivity, (G,)),
            decay=jnp.broadcast_to(params.decay, (G,)),
        )

    # -- model pieces -----------------------------------------------------

    def mean_function(self, params: SIMMParams, x: jnp.ndarray) -> jnp.ndarray:
        """SIMM mean: B_j / D_j on expression rows, 0 on force rows."""
        params = self._expand(params)
        ratio = params.basal / params.decay  # (G,)
        flags = x[:, 2]
        if self.legacy_block_mean:
            # Reference block-repeat (src/model.py:143-149): repeats each
            # B_g/D_g over N//G contiguous rows regardless of the gene column.
            block = x.shape[0] // self.num_genes
            mean = jnp.repeat(ratio, block)
            mean = jnp.concatenate(
                [mean, jnp.zeros(x.shape[0] - mean.shape[0], mean.dtype)]
            )
        else:
            g = jnp.clip(x[:, 1].astype(jnp.int32), 0, self.num_genes - 1)
            mean = ratio[g]
        return mean * flags

    def gram(self, params: SIMMParams, x: jnp.ndarray, kind: str = "mixed") -> jnp.ndarray:
        n = x.shape[0]
        use_sym = self.gram_impl == "pallas" or (
            self.gram_impl == "auto"
            and n >= self.PALLAS_GRAM_MIN_N
            and x.dtype == jnp.float32
            and _on_tpu()
        )
        if use_sym:
            from dis_project_tpu.ops import pallas_gram

            # Square Gram: lower-triangle kernel — half the transcendentals
            # of the rectangular tile kernel, mirrored by DMA.  Unlike the
            # rectangular kernel there is no upper N cutoff: the symmetric
            # kernel beats XLA's fused build at every measured size (v5e
            # r2: 1.92 vs 2.39 ms at N=8192, kind='xx').
            params_e = self._expand(params)
            return pallas_gram.gram_sym(
                x, params_e.decay, params_e.sensitivity, params_e.lengthscale,
                kind=kind,
            )
        return self.cross_covariance(params, x, x, kind)

    def cross_covariance(
        self, params: SIMMParams, x1: jnp.ndarray, x2: jnp.ndarray, kind: str = "mixed"
    ) -> jnp.ndarray:
        params = self._expand(params)
        impl = self._resolve_gram(max(x1.shape[0], x2.shape[0]), x1.dtype)
        if impl == "pallas":
            from dis_project_tpu.ops import pallas_gram

            return pallas_gram.cross_covariance(
                x1, x2, params.decay, params.sensitivity, params.lengthscale,
                kind=kind,
            )
        return gram_ops.cross_covariance(
            x1, x2, params.decay, params.sensitivity, params.lengthscale
        )

    # -- objective ---------------------------------------------------------

    def mll(self, params: SIMMParams, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Exact conjugate marginal log-likelihood.

        Sigma = Kxx + jitter*I + obs_stddev^2*I — per-point measurement
        variances deliberately excluded (reference ``src/objectives.py:70-73``).
        The O(N^3) log-density runs through the custom-VJP
        :func:`dis_project_tpu.ops.mll.mvn_logpdf`.
        """
        y = y.reshape(-1)
        with jax.named_scope("simm_mean"):
            mx = self.mean_function(params, x)
        with jax.named_scope("simm_gram"):
            K = self.gram(params, x, self._kind("xx"))
        sigma = mll_ops.add_diagonal(K, self.jitter + params.obs_stddev**2)
        impl = self._resolve_chol(x.shape[0], x.dtype)
        with jax.named_scope("simm_mvn_logpdf"):
            return mll_ops.mvn_logpdf(y, mx, sigma, impl=impl)

    def mll_gridded(
        self,
        params: SIMMParams,
        timepoints: jnp.ndarray,
        y: jnp.ndarray,
        replicates: int = 1,
    ) -> jnp.ndarray:
        """Exact conjugate MLL for canonical GRIDDED data (gene-major
        blocks of one shared time grid, optionally replicate-tiled — the
        layout ``dataset_3d`` produces). Uses the table-based fast Gram
        (``ops.gram.gram_xx_blocked_fast``): O(T G^2) transcendentals
        instead of O((GT)^2), leaving bandwidth-bound gathers — measured
        ~4x faster than the row-metadata build at N=10^4 on v5e. Same
        Sigma convention as :meth:`mll`.
        """
        params = self._expand(params)
        y = y.reshape(-1)
        T = timepoints.shape[0]
        with jax.named_scope("simm_gram_gridded"):
            K = gram_ops.gram_xx_blocked_fast(
                timepoints, params.decay, params.sensitivity, params.lengthscale
            )
            if replicates > 1:
                K = jnp.tile(K, (replicates, replicates))
        mean = jnp.tile(jnp.repeat(params.basal / params.decay, T), replicates)
        sigma = mll_ops.add_diagonal(K, self.jitter + params.obs_stddev**2)
        impl = self._resolve_chol(y.shape[0], y.dtype)
        return mll_ops.mvn_logpdf(y, mean, sigma, impl=impl)

    def mll_replicated(
        self,
        params: SIMMParams,
        timepoints: jnp.ndarray,
        y: jnp.ndarray,
        replicates: int,
    ) -> jnp.ndarray:
        r"""Exact conjugate MLL for R replicates, R^3-fold cheaper.

        The training covariance over replicate-tiled rows is EXACTLY

        .. math:: \Sigma = J_R \otimes B + c I, \qquad c = jitter +
                  \sigma_{obs}^2

        (the kernel ignores the replicate index — reference
        ``src/model.py:392-414`` rebuilds identical blocks per replicate
        pair — and the reference MLL adds only the uniform noise, not the
        per-point variances). Diagonalising the all-ones matrix
        :math:`J_R = Q\,\mathrm{diag}(R,0,\dots)\,Q^\top` block-
        diagonalises :math:`\Sigma` into ONE dense (GT, GT) system
        :math:`R B + cI` plus :math:`(R-1)` pure-noise copies:

        .. math:: \log p = \log N(\bar y \sqrt R \mid \sqrt R\,\mu,
                  R B + c I) + \sum_{r>1} \log N(z_r \mid 0, c I)

        where :math:`\bar y` is the replicate mean and the :math:`z_r`
        are the orthogonal residual combinations — computable from
        :math:`\sum_r \lVert y_r \rVert^2` alone. O((GT)^3) instead of
        O((RGT)^3): 27x fewer factorisation FLOPs for the canonical
        3-replicate run. Value/gradient parity with :meth:`mll` tested
        to 1e-12.
        """
        params = self._expand(params)
        T = timepoints.shape[0]
        n_block = self.num_genes * T
        R = replicates
        Y = y.reshape(R, n_block)
        c = self.jitter + params.obs_stddev**2

        B = gram_ops.gram_xx_blocked_fast(
            timepoints, params.decay, params.sensitivity, params.lengthscale
        )
        mu = jnp.repeat(params.basal / params.decay, T)

        ybar = jnp.mean(Y, axis=0)
        # Dense component: sqrt(R)*(ybar - mu) ~ N(0, R B + c I).
        sigma1 = mll_ops.add_diagonal(R * B, c)
        impl = self._resolve_chol(n_block, y.dtype)
        w = jnp.sqrt(jnp.asarray(R, y.dtype)) * (ybar - mu)
        logp_dense = mll_ops.mvn_logpdf(w, jnp.zeros_like(w), sigma1, impl=impl)

        # Orthogonal complement: (R-1)*n_block iid N(0, c) residuals with
        # total energy sum_r ||y_r - mu||^2 - R ||ybar - mu||^2.
        resid = Y - mu[None, :]
        ss_total = jnp.sum(resid * resid)
        ss_mean = R * jnp.sum((ybar - mu) ** 2)
        ss_perp = ss_total - ss_mean
        n_perp = (R - 1) * n_block
        logp_perp = -0.5 * (
            ss_perp / c + n_perp * jnp.log(c) + n_perp * mll_ops.LOG_2PI
        )
        return logp_dense + logp_perp

    def mll_iterative(
        self,
        params: SIMMParams,
        x: jnp.ndarray,
        y: jnp.ndarray,
        key,
        num_probes: int = 16,
        lanczos_iters: int = 32,
        cg_iters: int = 256,
    ) -> jnp.ndarray:
        """Matmul-only exact MLL via batched CG + stochastic Lanczos
        quadrature (``ops.iterative``, the BBMM pattern) — same Sigma
        convention as :meth:`mll`. The logdet (value) is a randomised
        estimate and gradients are unbiased; use for SGD-style training at
        N where O(N^3) factorisation does not pay. The LFM Sigma is
        noise*I + low-rank, so CG converges in ~rank(K) iterations."""
        from dis_project_tpu.ops import iterative

        y = y.reshape(-1)
        mx = self.mean_function(params, x)
        K = self.gram(params, x, self._kind("xx"))
        sigma = mll_ops.add_diagonal(K, self.jitter + params.obs_stddev**2)
        return iterative.mvn_logpdf_cg(
            y - mx, sigma, key, num_probes, lanczos_iters, cg_iters
        )

    # -- posteriors ---------------------------------------------------------

    def latent_predict(
        self,
        params: SIMMParams,
        test_rows: jnp.ndarray,
        x: jnp.ndarray,
        y: jnp.ndarray,
        variances: jnp.ndarray,
    ) -> Gaussian:
        """Posterior over the latent force f at ``test_rows`` (flag 0).

        Math of reference ``src/model.py:420-463``: train covariance uses the
        fixed per-point variances + jitter (no learned noise); posterior
        variance is diagonalised and re-jittered. Solves use the Cholesky
        factor instead of the reference's explicit ``cola.inv`` — same
        linear map, better conditioning and an O(N^3) -> O(N^2 M) saving.
        """
        y = y.reshape(-1)
        variances = variances.reshape(-1)

        mean_x = self.mean_function(params, x)
        mean_t = self.mean_function(params, test_rows)

        Kxx = self.gram(params, x, self._kind("xx"))
        Kxx = mll_ops.add_diagonal(Kxx, variances + self.jitter)
        L = mll_ops.cholesky(Kxx, self._resolve_chol(x.shape[0], x.dtype))

        Kxf = self.cross_covariance(params, x, test_rows, self._kind("xf"))  # (N, M)
        # Kfx Kxx^{-1} == solve(Kxx, Kxf)^T by symmetry of Kxx.
        solved = mll_ops.chol_solve(L, Kxf)  # (N, M)
        mean = mean_t + solved.T @ (y - mean_x)

        # Only the diagonal survives the reference's diagonalisation quirk,
        # so compute just diag(Kff) + the einsum correction diagonal —
        # O(N*M) instead of the O(N*M^2) matmul (identical outputs).
        kff_diag = jnp.diagonal(self.gram(params, test_rows, self._kind("ff")))
        corr = jnp.einsum("nm,nm->m", solved, Kxf)
        var = jnp.diag(kff_diag + self.jitter - corr)
        var = mll_ops.add_diagonal(var, self.jitter)
        return Gaussian(mean=mean, cov=var)

    def multi_gene_predict(
        self,
        params: SIMMParams,
        test_rows: jnp.ndarray,
        x: jnp.ndarray,
        y: jnp.ndarray,
        variances: jnp.ndarray,
    ) -> Gaussian:
        """Posterior over gene expression at ``test_rows`` (flag forced 1).

        Math of reference ``src/model.py:465-514``: Sigma adds per-point
        variances AND learned obs noise; full predictive covariance kept.
        """
        y = y.reshape(-1)
        variances = variances.reshape(-1)
        t2 = test_rows.at[:, 2].set(1)

        mean_x = self.mean_function(params, x)
        mean_t = self.mean_function(params, t2)

        Kxx = self.gram(params, x, self._kind("xx"))
        sigma = mll_ops.add_diagonal(Kxx, variances + params.obs_stddev**2)
        L = mll_ops.cholesky(sigma, self._resolve_chol(x.shape[0], x.dtype))

        Ktt = self.gram(params, t2, self._kind("xx"))
        Kxt = self.cross_covariance(params, x, t2, self._kind("xx"))
        solved = mll_ops.chol_solve(L, Kxt)

        mean = mean_t + solved.T @ (y - mean_x)
        cov = Ktt - Kxt.T @ solved
        cov = mll_ops.add_diagonal(cov, self.jitter)
        return Gaussian(mean=mean, cov=cov)


def clamp_params(
    params: SIMMParams,
    gene_index: int = 3,
    sensitivity: float = 1.0,
    decay: float = 0.8,
) -> SIMMParams:
    """Identifiability clamp: fix one gene's S and D (reference p21 clamp,
    ``src/trainer.py:151-158``; index 3 = p21 in the canonical gene order).

    Applied to whatever space ``params`` is in — the reference applies it to
    *raw* values during the training scan and to *constrained* values after
    (``src/trainer.py:205-222``), a quirk this framework reproduces in
    ``training.trainer``.

    Raises at trace time when ``gene_index`` is out of bounds for the
    parameter arrays (shared-kinetics (1,)-shaped params, or gene subsets
    smaller than the index): JAX scatter semantics would otherwise DROP
    the update and the identifiability clamp would silently never apply.
    """
    if gene_index >= params.sensitivity.shape[0]:
        raise ValueError(
            f"clamp_params: gene_index {gene_index} is out of bounds for "
            f"{params.sensitivity.shape[0]} gene parameter(s) (shared "
            "kinetics or a small gene subset?) — pass the in-subset index "
            "or disable fix_params, as the CLI does (main.py run())."
        )
    dtype = params.sensitivity.dtype
    return params._replace(
        sensitivity=params.sensitivity.at[gene_index].set(
            jnp.asarray(sensitivity, dtype)
        ),
        decay=params.decay.at[gene_index].set(jnp.asarray(decay, dtype)),
    )
