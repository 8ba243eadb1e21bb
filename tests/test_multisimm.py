"""Multi-force exact SIMM tests: exact reduction to the single-force
family at R=1, PSD structure, block-diagonal force prior, joint-prior-draw
posterior recovery of TWO distinct forces, and a short training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.data.dataset import P53Data, dataset_3d
from dis_project_tpu.models import multisimm, simm
from dis_project_tpu.models.multisimm import (
    ExactMultiSIMM,
    MultiSIMMParams,
    force_rows,
)


def _p53_arrays():
    data = P53Data(replicate=0, source="synthetic")
    X, y, var = dataset_3d(data)
    return jnp.asarray(X), jnp.asarray(y), jnp.asarray(var), data


def _as_multi(p: simm.SIMMParams) -> MultiSIMMParams:
    """Embed single-force params as R=1 multi-force params."""
    return MultiSIMMParams(
        basal=p.basal,
        sensitivity=p.sensitivity[:, None],
        decay=p.decay,
        lengthscale=jnp.atleast_1d(p.lengthscale),
        obs_stddev=p.obs_stddev,
    )


class TestSingleForceReduction:
    """R=1 must reproduce ExactSIMM exactly (same closed forms, same
    conventions) — gram, MLL, and both posteriors."""

    def setup_method(self):
        self.X, self.y, self.var, self.data = _p53_arrays()
        self.single = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        self.multi = ExactMultiSIMM(num_genes=5, num_forces=1, jitter=1e-4)
        self.ps = simm.init_params(5)
        self.pm = _as_multi(self.ps)

    def test_gram_matches(self):
        K1 = self.single.gram(self.ps, self.X)
        K2 = self.multi.gram(self.pm, self.X)
        np.testing.assert_allclose(
            np.asarray(K2), np.asarray(K1), rtol=1e-14, atol=1e-15
        )

    def test_mll_matches(self):
        m1 = float(self.single.mll(self.ps, self.X, self.y))
        m2 = float(self.multi.mll(self.pm, self.X, self.y))
        assert m2 == pytest.approx(m1, rel=1e-12)

    def test_latent_posterior_matches(self):
        # Legacy single-force grid rows carry gene column -1; force index
        # 0 must accept them (clip) so existing grids keep working.
        from dis_project_tpu.utils.test_grids import latent_grid

        rows = jnp.asarray(latent_grid())
        d1 = self.single.latent_predict(self.ps, rows, self.X, self.y, self.var)
        d2 = self.multi.latent_predict(self.pm, rows, self.X, self.y, self.var)
        np.testing.assert_allclose(
            np.asarray(d2.mean), np.asarray(d1.mean), rtol=1e-10, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(jnp.diagonal(d2.cov)),
            np.asarray(jnp.diagonal(d1.cov)),
            rtol=1e-8,
            atol=1e-12,
        )

    def test_gene_posterior_matches(self):
        from dis_project_tpu.utils.test_grids import expression_grid

        rows = jnp.asarray(expression_grid(num_genes=5, t=40))
        d1 = self.single.multi_gene_predict(
            self.ps, rows, self.X, self.y, self.var
        )
        d2 = self.multi.multi_gene_predict(
            self.pm, rows, self.X, self.y, self.var
        )
        np.testing.assert_allclose(
            np.asarray(d2.mean), np.asarray(d1.mean), rtol=1e-10, atol=1e-12
        )

    def test_bijector_round_trip(self):
        pm = multisimm.init_params(5, num_forces=3)
        back = multisimm.constrain(multisimm.unconstrain(pm))
        for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(pm)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
        assert pm.sensitivity.shape == (5, 3)
        assert pm.lengthscale.shape == (3,)
        # R=1 init reduces to the reference lengthscale.
        np.testing.assert_allclose(
            np.asarray(multisimm.init_params(5, 1).lengthscale), [2.5]
        )

    @pytest.mark.parametrize("num_forces", [2, 4, 5, 6, 12])
    def test_init_inside_lengthscale_support(self, num_forces):
        # Regression: R >= 5 used to generate lengthscales on/outside the
        # SigmoidBounded(0.5, 3.5) support, so unconstrain() was inf/NaN
        # and the whole fit silently NaN'd.
        pm = multisimm.init_params(5, num_forces=num_forces)
        ell = np.asarray(pm.lengthscale)
        assert (ell > 0.5).all() and (ell < 3.5).all()
        assert len(np.unique(ell)) == num_forces  # distinguishable inits
        raw = multisimm.unconstrain(pm)
        assert all(
            np.isfinite(np.asarray(leaf)).all()
            for leaf in jax.tree.leaves(raw)
        )
        # R <= 4 keeps the original 0.5 spacing (golden numbers unchanged).
        if num_forces <= 4:
            np.testing.assert_allclose(np.diff(ell), 0.5)


class TestMultiForceStructure:
    def test_force_prior_block_diagonal(self):
        """K_ff between different forces must be exactly zero (independent
        priors); within a force it is the RBF with that force's
        lengthscale."""
        from dis_project_tpu.ops import lfm_kernels as lfk

        t = jnp.linspace(0.0, 12.0, 9)
        pm = multisimm.init_params(4, num_forces=2)
        model = ExactMultiSIMM(num_genes=4, num_forces=2)
        rows = jnp.concatenate([force_rows(t, 0), force_rows(t, 1)])
        K = model.gram(pm, rows)
        M = t.shape[0]
        np.testing.assert_array_equal(np.asarray(K[:M, M:]), 0.0)
        # The force prior is the CONSISTENT Lawrence RBF (the convention
        # the closed-form k_xx/k_xf integrate), not the reference's 2*l
        # quirk — required for the joint (x, f) covariance to be PSD.
        np.testing.assert_allclose(
            np.asarray(K[:M, :M]),
            np.asarray(
                lfk.k_ff_consistent(t[:, None], t[None, :], pm.lengthscale[0])
            ),
            rtol=1e-14,
        )
        np.testing.assert_allclose(
            np.asarray(K[M:, M:]),
            np.asarray(
                lfk.k_ff_consistent(t[:, None], t[None, :], pm.lengthscale[1])
            ),
            rtol=1e-14,
        )

    def test_gram_psd(self):
        rng = np.random.default_rng(0)
        G, R, T = 6, 3, 12
        t = jnp.asarray(np.sort(rng.uniform(0, 12, T)))
        pm = MultiSIMMParams(
            basal=jnp.asarray(rng.uniform(0.01, 0.1, G)),
            sensitivity=jnp.asarray(rng.uniform(0.3, 1.5, (G, R))),
            decay=jnp.asarray(rng.uniform(0.2, 1.0, G)),
            lengthscale=jnp.asarray([1.0, 2.0, 3.0]),
            obs_stddev=jnp.asarray(0.5),
        )
        model = ExactMultiSIMM(num_genes=G, num_forces=R)
        times = jnp.tile(t, G)
        genes = jnp.repeat(jnp.arange(G, dtype=t.dtype), T)
        X = jnp.stack([times, genes, jnp.ones_like(times)], axis=-1)
        rows = jnp.concatenate(
            [X] + [force_rows(t, r, t.dtype) for r in range(R)]
        )
        K = np.asarray(model.gram(pm, rows))
        np.testing.assert_allclose(K, K.T, atol=1e-12)
        w = np.linalg.eigvalsh(K)
        assert w.min() > -1e-9


class TestJointPriorRecovery:
    """Draw (expression, f_1, f_2) JOINTLY from the 2-force prior, condition
    on the noisy expression, and require the posterior over each force to
    recover its own draw — the posterior-math integration test (no
    training involved, so it isolates the covariance algebra)."""

    def test_two_force_posterior_recovery(self):
        rng = np.random.default_rng(3)
        G, T, M = 6, 24, 40
        t = jnp.asarray(np.linspace(0.0, 12.0, T))
        grid = jnp.asarray(np.linspace(0.0, 12.0, M))
        pm = MultiSIMMParams(
            basal=jnp.asarray(rng.uniform(0.01, 0.08, G)),
            sensitivity=jnp.asarray(rng.uniform(0.4, 1.4, (G, 2))),
            decay=jnp.asarray(rng.uniform(0.3, 0.9, G)),
            lengthscale=jnp.asarray([1.0, 3.0]),
            obs_stddev=jnp.asarray(0.05),
        )
        model = ExactMultiSIMM(num_genes=G, num_forces=2, jitter=1e-8)
        times = jnp.tile(t, G)
        genes = jnp.repeat(jnp.arange(G, dtype=t.dtype), T)
        X = jnp.stack([times, genes, jnp.ones_like(times)], axis=-1)
        rows = jnp.concatenate(
            [X, force_rows(grid, 0, t.dtype), force_rows(grid, 1, t.dtype)]
        )

        joint = model.gram(pm, rows)
        joint = joint + 1e-8 * jnp.eye(joint.shape[0], dtype=joint.dtype)
        Lj = np.linalg.cholesky(np.asarray(joint))
        z = Lj @ rng.standard_normal(joint.shape[0])
        mean_rows = np.asarray(model.mean_function(pm, rows))
        sample = mean_rows + z

        n = G * T
        noise = 0.05 * rng.standard_normal(n)
        y = jnp.asarray(sample[:n] + noise)
        f_true = [sample[n : n + M], sample[n + M :]]
        var = jnp.full((n,), 0.05**2)

        for r in range(2):
            post = model.latent_predict(
                pm, force_rows(grid, r, t.dtype), X, y, var
            )
            corr = np.corrcoef(np.asarray(post.mean), f_true[r])[0, 1]
            assert corr > 0.9, f"force {r}: corr {corr:.3f}"
        # The two recovered forces must not be the same curve.
        p0 = model.latent_predict(pm, force_rows(grid, 0, t.dtype), X, y, var)
        p1 = model.latent_predict(pm, force_rows(grid, 1, t.dtype), X, y, var)
        cross = np.corrcoef(np.asarray(p0.mean), np.asarray(p1.mean))[0, 1]
        assert abs(cross) < 0.9


class TestSparseMultiForce:
    """Multi-force sparse variational path (SparseSIMM(num_forces=R))."""

    def _sim(self, rng, G=6, T=30, M=50):
        t = jnp.asarray(np.linspace(0.0, 12.0, T))
        grid = jnp.asarray(np.linspace(0.0, 12.0, M))
        pm = MultiSIMMParams(
            basal=jnp.asarray(rng.uniform(0.01, 0.08, G)),
            sensitivity=jnp.asarray(rng.uniform(0.4, 1.4, (G, 2))),
            decay=jnp.asarray(rng.uniform(0.3, 0.9, G)),
            lengthscale=jnp.asarray([1.0, 3.0]),
            obs_stddev=jnp.asarray(0.05),
        )
        dense = ExactMultiSIMM(num_genes=G, num_forces=2, jitter=1e-8)
        times = jnp.tile(t, G)
        genes = jnp.repeat(jnp.arange(G, dtype=t.dtype), T)
        X = jnp.stack([times, genes, jnp.ones_like(times)], axis=-1)
        rows = jnp.concatenate(
            [X, force_rows(grid, 0, t.dtype), force_rows(grid, 1, t.dtype)]
        )
        joint = dense.gram(pm, rows)
        joint = joint + 1e-8 * jnp.eye(joint.shape[0], dtype=joint.dtype)
        z = np.linalg.cholesky(np.asarray(joint)) @ rng.standard_normal(
            joint.shape[0]
        )
        sample = np.asarray(dense.mean_function(pm, rows)) + z
        n = G * T
        y = jnp.asarray(sample[:n] + 0.05 * rng.standard_normal(n))
        var = jnp.full((n,), 0.05**2)
        return pm, dense, X, y, var, grid, [sample[n : n + 50], sample[n + 50 :]]

    def test_single_force_reduction(self):
        """num_forces=1 must reproduce the existing sparse path exactly."""
        from dis_project_tpu.models import svlfm

        X, y, var, _ = _p53_arrays()
        p1 = svlfm.init_params(5, 16)
        old = svlfm.SparseSIMM(num_genes=5, num_inducing=16)
        new = svlfm.SparseSIMM(num_genes=5, num_inducing=16, num_forces=1)
        e_old = float(old.collapsed_elbo(p1, X, y, var))
        e_new = float(new.collapsed_elbo(p1, X, y, var))
        assert e_new == pytest.approx(e_old, rel=1e-12)

    def test_collapsed_bound_and_tightness(self):
        """Titsias bound <= exact multi-force MLL (like-for-like noise);
        dense inducing grid makes it tight."""
        from dis_project_tpu.models import svlfm

        rng = np.random.default_rng(5)
        pm, dense, X, y, var, grid, _ = self._sim(rng, G=4, T=16, M=50)
        # Like-for-like: exact MLL with per-point variances folded into
        # the noise so both sides use identical likelihoods.
        K = dense.gram(pm, X)
        from dis_project_tpu.ops import mll as mll_ops

        sigma = mll_ops.add_diagonal(K, var + pm.obs_stddev**2)
        exact = float(
            mll_ops.mvn_logpdf(y, dense.mean_function(pm, X), sigma)
        )
        # NOTE: unlike standard SoR, z = the data times does NOT make the
        # bound exact here — expression is a linear FUNCTIONAL of the
        # whole force path, so Q_ff < K_ff for any finite z (measured gap
        # 4.3 nats at M=16). A dense z grid shrinks the gap instead.
        M = 64
        sp = svlfm.SparseSIMM(
            num_genes=4, num_inducing=M, num_forces=2, jitter=1e-10
        )
        params = svlfm.SVLFMParams(
            kinetics=pm,
            z=jnp.asarray(np.linspace(0.0, 12.0, M)),
            q_mu=jnp.zeros(2 * M),
            q_sqrt=jnp.eye(2 * M),
        )
        bound = float(sp.collapsed_elbo(params, X, y, var))
        assert bound <= exact + 1e-6
        assert bound > exact - 1.0, (bound, exact)

    def test_two_force_recovery_sparse(self):
        """Collapsed-optimal q at TRUE hypers recovers both forces."""
        from dis_project_tpu.models import svlfm

        rng = np.random.default_rng(6)
        pm, dense, X, y, var, grid, f_true = self._sim(rng)
        sp = svlfm.SparseSIMM(num_genes=6, num_inducing=24, num_forces=2)
        params = svlfm.SVLFMParams(
            kinetics=pm,
            z=jnp.asarray(np.linspace(0.0, 12.0, 24)),
            q_mu=jnp.zeros(48),
            q_sqrt=jnp.eye(48),
        )
        params = sp.optimal_q(params, X, y, var)
        for r in range(2):
            post = sp.latent_predict(params, grid, force=r)
            corr = np.corrcoef(np.asarray(post.mean), f_true[r])[0, 1]
            assert corr > 0.9, f"force {r}: corr {corr:.3f}"


def test_fit_smoke():
    """Short multi-force training run: loss decreases, params stay finite."""
    X, y, var, _ = _p53_arrays()
    model = ExactMultiSIMM(num_genes=5, num_forces=2, jitter=1e-4)
    params, hist = multisimm.fit(
        model, multisimm.init_params(5, 2), X, y, num_iters=25
    )
    assert float(hist[-1]) < float(hist[0])
    for leaf in jax.tree.leaves(params):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    assert params.sensitivity.shape == (5, 2)
