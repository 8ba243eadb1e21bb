"""Sparse variational SIMM: bound sanity (ELBO <= exact MLL), collapsed-
bound/optimal-q consistency, posterior agreement with the exact GP at dense
inducing grids, and minibatch unbiasedness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.data import synthetic
from dis_project_tpu.data.dataset import train_arrays
from dis_project_tpu.models import simm, svlfm


@pytest.fixture(scope="module")
def problem():
    cfg = synthetic.SyntheticConfig(
        num_genes=3, num_timepoints=9, num_replicates=1, noise_std=0.1
    )
    data = synthetic.sample_prior(jax.random.PRNGKey(0), cfg)
    X, y, var = train_arrays(data)
    p = data.params_true
    kin = simm.SIMMParams(
        basal=p["basal"],
        sensitivity=p["sensitivity"],
        decay=p["decay"],
        lengthscale=p["lengthscale"],
        obs_stddev=jnp.asarray(0.1, y.dtype),
    )
    return data, X, y, var, kin


def _sv(params_kin, num_inducing, num_genes=3):
    model = svlfm.SparseSIMM(num_genes=num_genes, num_inducing=num_inducing)
    params = svlfm.init_params(num_genes, num_inducing)
    params = params._replace(kinetics=params_kin)
    return model, params


def _exact_mll_with_variances(kin, X, y, var, jitter=1e-6):
    """Exact log-marginal with heteroscedastic noise obs^2 + var — the
    likelihood the sparse bounds use (NOT the reference's MLL asymmetry)."""
    from dis_project_tpu.ops import gram as gram_ops
    from dis_project_tpu.ops import mll as mll_ops

    model = simm.ExactSIMM(num_genes=3, jitter=jitter)
    K = gram_ops.gram(X, kin.decay, kin.sensitivity, kin.lengthscale)
    sigma = mll_ops.add_diagonal(K, kin.obs_stddev**2 + var.reshape(-1))
    mx = model.mean_function(kin, X)
    return float(mll_ops.mvn_logpdf(y.reshape(-1), mx, sigma))


class TestBounds:
    def test_collapsed_elbo_below_exact_mll(self, problem):
        data, X, y, var, kin = problem
        model, params = _sv(kin, num_inducing=8)
        bound = float(model.collapsed_elbo(params, X, y, var))
        exact = _exact_mll_with_variances(kin, X, y, var)
        assert bound <= exact + 1e-6

    def test_collapsed_elbo_tightens_with_more_inducing(self, problem):
        data, X, y, var, kin = problem
        bounds = []
        for m in (4, 16, 64):
            model, params = _sv(kin, num_inducing=m)
            bounds.append(float(model.collapsed_elbo(params, X, y, var)))
        assert bounds[0] <= bounds[1] <= bounds[2] + 1e-8
        exact = _exact_mll_with_variances(kin, X, y, var)
        # Dense inducing grid over [0, 12]: bound is essentially tight.
        assert abs(bounds[-1] - exact) < 1e-3 * abs(exact) + 1e-3

    def test_optimal_q_elbo_matches_collapsed(self, problem):
        """Plugging the closed-form optimal q into the uncollapsed ELBO must
        recover the collapsed bound (same optimum, two expressions)."""
        data, X, y, var, kin = problem
        model, params = _sv(kin, num_inducing=16)
        collapsed = float(model.collapsed_elbo(params, X, y, var))
        params_opt = model.optimal_q(params, X, y, var)
        uncollapsed = float(model.elbo(params_opt, X, y, var, n_total=X.shape[0]))
        # Residual ~1e-4: the uncollapsed marginals floor their variance at
        # jitter (rows at t=0 have exactly zero prior variance) while the
        # collapsed trace term uses the raw values.
        assert uncollapsed == pytest.approx(collapsed, abs=2e-4)

    def test_elbo_suboptimal_q_is_lower(self, problem):
        data, X, y, var, kin = problem
        model, params = _sv(kin, num_inducing=16)
        params_opt = model.optimal_q(params, X, y, var)
        best = float(model.elbo(params_opt, X, y, var, n_total=X.shape[0]))
        worse = float(model.elbo(params, X, y, var, n_total=X.shape[0]))
        assert worse <= best

    def test_kl_zero_at_identity(self):
        model, params = _sv(
            simm.init_params(3), num_inducing=8
        )
        assert float(model.kl(params)) == pytest.approx(0.0, abs=1e-12)

    def test_minibatch_elbo_unbiased(self, problem):
        """Averaging the minibatch estimator over a partition of the data
        equals the full-batch ELBO (linearity of the likelihood term)."""
        data, X, y, var, kin = problem
        model, params = _sv(kin, num_inducing=8)
        params = model.optimal_q(params, X, y, var)
        full = float(model.elbo(params, X, y, var, n_total=X.shape[0]))
        n = X.shape[0]
        kl = float(model.kl(params))
        est = -kl
        for sl in (slice(0, n // 2), slice(n // 2, n)):
            b = float(model.elbo(params, X[sl], y[sl], var[sl], n_total=n))
            size = len(range(*sl.indices(n)))
            # (elbo_b + kl) = (n/|b|) * ll_b, so weighting by |b|/n and
            # summing recovers the full-data likelihood term exactly.
            est += (b + kl) * size / n
        assert est == pytest.approx(full, rel=1e-10)


class TestPredictions:
    def test_latent_posterior_matches_exact_gp(self, problem):
        """With a dense inducing grid and optimal q, the sparse latent-force
        posterior must agree with the exact GP conditional."""
        data, X, y, var, kin = problem
        model, params = _sv(kin, num_inducing=64)
        params = model.optimal_q(params, X, y, var)
        t_grid = jnp.linspace(0.0, 12.0, 25)
        sparse_post = model.latent_predict(params, t_grid)

        exact_model = simm.ExactSIMM(num_genes=3, jitter=1e-6)
        rows = jnp.stack(
            [t_grid, -jnp.ones_like(t_grid), jnp.zeros_like(t_grid)], axis=-1
        )
        # Exact conditional with the same noise model (obs^2 + variances).
        from dis_project_tpu.ops import gram as gram_ops
        from dis_project_tpu.ops import mll as mll_ops

        K = gram_ops.gram(X, kin.decay, kin.sensitivity, kin.lengthscale)
        sigma = mll_ops.add_diagonal(K, kin.obs_stddev**2 + var.reshape(-1))
        L = jnp.linalg.cholesky(sigma)
        Kxf = gram_ops.cross_covariance(
            X, rows, kin.decay, kin.sensitivity, kin.lengthscale
        )
        mx = exact_model.mean_function(kin, X)
        solved = mll_ops.chol_solve(L, Kxf)
        mean_exact = solved.T @ (y.reshape(-1) - mx)
        var_exact = 1.0 - jnp.sum(Kxf * solved, axis=0)  # k_ff(t,t) = 1

        np.testing.assert_allclose(
            np.asarray(sparse_post.mean), np.asarray(mean_exact), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(sparse_post.variance()), np.asarray(var_exact), atol=2e-3
        )

    def test_gene_predict_shapes(self, problem):
        data, X, y, var, kin = problem
        model, params = _sv(kin, num_inducing=16)
        params = model.optimal_q(params, X, y, var)
        g = model.gene_predict(params, X[:10])
        assert g.mean.shape == (10,)
        assert float(jnp.min(g.variance())) > 0


class TestDataParallel:
    """Data-parallel SVI (VERDICT r3 #3): svtrainer.fit(mesh=) shards the
    minibatch row axis over the mesh (per-device ELBO shards, psum'd
    grads via GSPMD). Pure scheduling change — the sharded trajectory
    must match the single-device one to roundoff."""

    def test_sharded_step_matches_single_device(self):
        from jax.sharding import Mesh

        from dis_project_tpu.training import svtrainer

        cfg = synthetic.SyntheticConfig(
            num_genes=4, num_timepoints=48, num_replicates=1,
            noise_std=0.1,
        )
        data = synthetic.generate_ode(jax.random.PRNGKey(0), cfg,
                                      oversample=4)
        X, y, var = train_arrays(data)
        model = svlfm.SparseSIMM(num_genes=4)
        p0 = svlfm.init_params(4, num_inducing=16, t_max=12.0)
        tc = svtrainer.SVTrainConfig(
            num_epochs=2, batch_size=64, learning_rate=0.01
        )
        r_ref = svtrainer.fit(model, p0, X, y, var, tc)
        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
        r_dp = svtrainer.fit(model, p0, X, y, var, tc, mesh=mesh)
        assert r_ref.history.shape == r_dp.history.shape
        assert np.abs(
            np.asarray(r_ref.history) - np.asarray(r_dp.history)
        ).max() < 1e-8
        for leaf_a, leaf_b in zip(
            jax.tree_util.tree_leaves(r_ref.params),
            jax.tree_util.tree_leaves(r_dp.params),
        ):
            assert np.abs(np.asarray(leaf_a - leaf_b)).max() < 1e-8

    def test_batch_not_divisible_rounds_up(self):
        """bs=50 over 8 devices rounds to 56; the run still executes and
        reports the adjusted batch count."""
        from jax.sharding import Mesh

        from dis_project_tpu.training import svtrainer

        cfg = synthetic.SyntheticConfig(
            num_genes=3, num_timepoints=40, num_replicates=1,
            noise_std=0.1,
        )
        data = synthetic.generate_ode(jax.random.PRNGKey(1), cfg,
                                      oversample=4)
        X, y, var = train_arrays(data)
        model = svlfm.SparseSIMM(num_genes=3)
        p0 = svlfm.init_params(3, num_inducing=8, t_max=12.0)
        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
        r = svtrainer.fit(
            model, p0, X, y, var,
            svtrainer.SVTrainConfig(num_epochs=1, batch_size=50),
            mesh=mesh,
        )
        assert np.isfinite(np.asarray(r.history)).all()
        # N=120, bs 50 -> 56: ceil(120/56) = 3 batches
        assert r.history.shape == (1, 3)

    def test_too_few_rows_fails_loudly(self):
        from jax.sharding import Mesh

        from dis_project_tpu.training import svtrainer

        model = svlfm.SparseSIMM(num_genes=1)
        p0 = svlfm.init_params(1, num_inducing=4)
        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
        X = jnp.zeros((5, 3))
        with pytest.raises(ValueError, match="row shard"):
            svtrainer.fit(
                model, p0, X, jnp.zeros(5), jnp.ones(5),
                svtrainer.SVTrainConfig(num_epochs=1, batch_size=5),
                mesh=mesh,
            )


class TestTrainability:
    def test_elbo_gradients_finite_and_improve(self, problem):
        import optax

        data, X, y, var, kin = problem
        model = svlfm.SparseSIMM(num_genes=3, num_inducing=12)
        raw = svlfm.unconstrain(svlfm.init_params(3, 12))

        def loss(raw):
            return -model.elbo(
                svlfm.constrain(raw), X, y, var, n_total=X.shape[0]
            )

        opt = optax.adam(0.05)
        state = opt.init(raw)
        l0 = float(loss(raw))

        @jax.jit
        def step(raw, state):
            l, g = jax.value_and_grad(loss)(raw)
            upd, state = opt.update(g, state)
            return optax.apply_updates(raw, upd), state, l

        for _ in range(60):
            raw, state, l = step(raw, state)
        assert np.isfinite(float(l))
        assert float(l) < l0

    def test_second_order_sparse_bound_below_exact(self):
        """order=2 sparse model: collapsed bound must lower-bound the exact
        second-order MLL (same heteroscedastic noise) and tighten with M."""
        from dis_project_tpu.models import simm2
        from dis_project_tpu.ops import lfm_kernels2 as lfk2
        from dis_project_tpu.ops import mll as mll_ops

        G, T = 2, 10
        t = jnp.linspace(0.0, 10.0, T)
        kin = simm2.SIMM2Params(
            basal=jnp.asarray([0.05, 0.08]),
            sensitivity=jnp.asarray([1.0, 1.2]),
            alpha=jnp.asarray([0.4, 0.6]),
            omega=jnp.asarray([1.0, 0.8]),
            lengthscale=jnp.asarray(2.0),
            obs_stddev=jnp.asarray(0.1),
        )
        n = G * T
        rows = jnp.stack(
            [jnp.tile(t, G), jnp.repeat(jnp.arange(G, dtype=t.dtype), T),
             jnp.ones(n)],
            axis=-1,
        )
        K = lfk2.k_xx2_block(t, t, kin.alpha, kin.omega, kin.sensitivity,
                             kin.lengthscale)
        L = jnp.linalg.cholesky(K + 1e-8 * jnp.eye(n))
        mean = jnp.repeat(kin.basal / (kin.alpha**2 + kin.omega**2), T)
        y = mean + L @ jax.random.normal(jax.random.PRNGKey(3), (n,))
        var = jnp.full((n,), 1e-4)

        sigma = mll_ops.add_diagonal(K, kin.obs_stddev**2 + var)
        exact = float(mll_ops.mvn_logpdf(y, mean, sigma))

        bounds = []
        for m in (6, 40):
            model = svlfm.SparseSIMM(num_genes=G, num_inducing=m, order=2)
            params = svlfm.init_params(G, m, t_max=10.0, order=2)
            params = params._replace(kinetics=kin)
            bounds.append(float(model.collapsed_elbo(params, rows, y, var)))
        assert bounds[0] <= bounds[1] <= exact + 1e-6
        assert abs(bounds[1] - exact) < 0.05 * abs(exact) + 0.5

    def test_second_order_sparse_constrain_round_trip(self):
        raw = svlfm.unconstrain(svlfm.init_params(3, 8, order=2))
        back = svlfm.unconstrain(svlfm.constrain(raw))
        for a, b in zip(jax.tree.leaves(raw), jax.tree.leaves(back)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)

    def test_svtrainer_checkpointed_resume_exact(self, problem, tmp_path):
        """Segmented SVI equals the unsegmented run bit-for-bit, and a
        crash/rerun resumes from the last epoch checkpoint."""
        import numpy as np

        from dis_project_tpu.training import svtrainer

        data, X, y, var, kin = problem
        model = svlfm.SparseSIMM(num_genes=3, num_inducing=8)
        params = svlfm.init_params(3, 8)
        cfg = svtrainer.SVTrainConfig(num_epochs=12, batch_size=10,
                                      learning_rate=0.05)
        straight = svtrainer.fit(model, params, X, y, var, cfg)
        seg = svtrainer.fit_checkpointed(
            model, params, X, y, var, cfg, str(tmp_path / "a"),
            checkpoint_every=5,
        )
        np.testing.assert_allclose(
            np.asarray(seg.history), np.asarray(straight.history), rtol=1e-12
        )
        # crash after 5 epochs then rerun to completion
        svtrainer.fit_checkpointed(
            model, params, X, y, var,
            svtrainer.SVTrainConfig(num_epochs=5, batch_size=10,
                                    learning_rate=0.05),
            str(tmp_path / "b"), checkpoint_every=5,
        )
        resumed = svtrainer.fit_checkpointed(
            model, params, X, y, var, cfg, str(tmp_path / "b"),
            checkpoint_every=5,
        )
        np.testing.assert_allclose(
            np.asarray(resumed.history),
            np.asarray(straight.history)[5:],
            rtol=1e-12,
        )

    def test_svtrainer_checkpointed_with_frozen_z(self, problem, tmp_path):
        """fit_checkpointed(train_z=False) must build the SAME
        multi_transform optimizer as fit() so the checkpointed state
        pytree matches (r2 review: it initialised a plain adam state and
        crashed in the first segment)."""
        import numpy as np

        from dis_project_tpu.training import svtrainer

        data, X, y, var, kin = problem
        model = svlfm.SparseSIMM(num_genes=3, num_inducing=8)
        params = svlfm.init_params(3, 8)
        cfg = svtrainer.SVTrainConfig(
            num_epochs=6, batch_size=10, learning_rate=0.05, train_z=False
        )
        straight = svtrainer.fit(model, params, X, y, var, cfg)
        seg = svtrainer.fit_checkpointed(
            model, params, X, y, var, cfg, str(tmp_path / "z"),
            checkpoint_every=3,
        )
        np.testing.assert_allclose(
            np.asarray(seg.history), np.asarray(straight.history), rtol=1e-12
        )
        np.testing.assert_array_equal(
            np.asarray(seg.params.z), np.asarray(params.z)
        )

    def test_svtrainer_minibatch_fit_improves_elbo(self, problem):
        from dis_project_tpu.training import svtrainer

        data, X, y, var, kin = problem
        model = svlfm.SparseSIMM(num_genes=3, num_inducing=12)
        params = svlfm.init_params(3, 12)
        res = svtrainer.fit(
            model,
            params,
            X,
            y,
            var,
            svtrainer.SVTrainConfig(
                num_epochs=30, batch_size=10, learning_rate=0.05, train_z=False
            ),
        )
        hist = np.asarray(res.history)
        assert hist.shape == (30, 3)  # 27 rows -> 3 padded batches of 10
        assert np.isfinite(hist).all()
        assert hist[-1].mean() < hist[0].mean()
        # frozen inducing grid must not have moved
        np.testing.assert_array_equal(
            np.asarray(res.params.z), np.asarray(params.z)
        )
