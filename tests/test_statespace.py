"""State-space (Kalman) LFM engine: correctness vs the dense closed-form
path, parallel-vs-sequential filter equivalence, smoother-based predict
parity, and f32 robustness of the balanced realization.

The dense MLL (``ExactSIMM.mll_gridded``) is the oracle everywhere: the
only approximation in ``ops.statespace`` is the order-p SDE of the RBF
force prior, so the MLL error must match the measured kernel-approximation
scale (6.0e-4 at p=8, 1.28e-4 at p=10, 2.9e-5 at p=12) and shrink
monotonically with the order.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dis_project_tpu.data import synthetic
from dis_project_tpu.data.dataset import train_arrays
from dis_project_tpu.models import multisimm, simm, simm2
from dis_project_tpu.ops import statespace as ss


@pytest.fixture(scope="module")
def p53_shaped():
    """Canonical p53-shaped problem: 5 genes x 7 timepoints, prior draw."""
    scfg = synthetic.SyntheticConfig(
        num_genes=5, num_timepoints=7, num_replicates=1, noise_std=0.1
    )
    data = synthetic.sample_prior(jax.random.PRNGKey(0), scfg)
    X, y, var = train_arrays(data)
    return (
        jnp.asarray(data.timepoints),
        X,
        y.reshape(-1),
        var.reshape(-1),
        simm.init_params(5),
        simm.ExactSIMM(num_genes=5, jitter=1e-4),
    )


class TestCanonicalSystem:
    def test_balanced_realization_is_well_conditioned(self):
        """Balancing is the f32 enabler: every constant O(1)-ish, the
        stationary covariance exactly diagonal (the companion form carries
        ~p!-scale coefficients and is unusable in f32 past p~6)."""
        for order in (6, 8, 10, 12):
            f_c, h_c, _, p_diag = ss.canonical_system(order)
            assert np.abs(f_c).max() < 10.0
            assert np.abs(h_c).max() < 2.0
            assert (p_diag > 0).all()

    def test_kernel_approximation_error_is_monotone(self):
        """Reconstructed k(tau) = h expm(F tau) P h^T converges to the
        Lawrence-convention RBF as the order grows, at the measured rates.
        The canonical system lives at unit time-scale l/2 = 1, i.e. it
        realises exp(-tau^2 / 4)."""
        from scipy.linalg import expm

        taus = np.linspace(0.0, 6.0, 13)
        errs = {}
        for order in (8, 10, 12):
            f_c, h_c, _, p_diag = ss.canonical_system(order)
            p_ff = np.diag(p_diag)
            k = np.array([h_c @ expm(f_c * t) @ p_ff @ h_c for t in taus])
            errs[order] = np.abs(k - np.exp(-(taus**2) / 4.0)).max()
        assert errs[8] < 7e-4
        assert errs[10] < 1.5e-4
        assert errs[12] < 4e-5
        assert errs[12] < errs[10] < errs[8]

    def test_stationary_variance_is_unit(self):
        _, h_c, _, p_diag = ss.canonical_system(10)
        var0 = h_c @ np.diag(p_diag) @ h_c
        assert abs(var0 - 1.0) < 2e-4


class TestMllParity:
    def test_matches_dense_mll_by_order(self, p53_shaped):
        t, X, y, var, params, model = p53_shaped
        exact = float(model.mll_gridded(params, t, y))
        tol = {8: 2e-2, 10: 4e-3, 12: 6e-4}
        prev = np.inf
        for order in (8, 10, 12):
            val = float(
                ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=order,
                              parallel=False)
            )
            err = abs(val - exact)
            assert err < tol[order], (order, val, exact)
            assert err < prev + 1e-12
            prev = err

    def test_matches_dense_mll_off_init(self, p53_shaped):
        """Not just at the init point: perturbed kinetics and lengthscale."""
        t, X, y, var, params, model = p53_shaped
        params = params._replace(
            decay=params.decay * jnp.asarray([1.5, 0.7, 1.0, 2.0, 0.9]),
            sensitivity=params.sensitivity
            * jnp.asarray([0.8, 1.2, 1.0, 0.6, 1.4]),
            lengthscale=jnp.asarray(1.3, params.lengthscale.dtype),
        )
        exact = float(model.mll_gridded(params, t, y))
        val = float(
            ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=10, parallel=False)
        )
        assert abs(val - exact) < 5e-3 * max(1.0, abs(exact))

    def test_replicates(self, p53_shaped):
        t, X, y, var, params, model = p53_shaped
        rng = np.random.default_rng(1)
        mean = np.repeat(np.asarray(params.basal / params.decay), t.shape[0])
        yr = jnp.asarray(rng.normal(size=(3 * y.shape[0],)) + np.tile(mean, 3))
        exact = float(model.mll_gridded(params, t, yr, replicates=3))
        val = float(
            ss.lfm_mll_ss(params, t, yr, jitter=1e-4, replicates=3, order=10,
                          parallel=False)
        )
        assert abs(val - exact) < 1e-3

    def test_nonuniform_grid(self):
        """uniform=False (per-step expm) on an irregular sorted grid,
        against the dense closed forms on the same grid."""
        from dis_project_tpu.ops import lfm_kernels as lk
        from dis_project_tpu.ops import mll as mll_ops

        rng = np.random.default_rng(2)
        t = jnp.asarray(np.sort(rng.uniform(0.1, 12.0, size=17)))
        params = simm.init_params(3)
        params = params._replace(
            decay=jnp.asarray([0.4, 0.9, 1.3]),
            sensitivity=jnp.asarray([1.0, 0.7, 1.2]),
        )
        y = jnp.asarray(rng.normal(size=(3 * 17,)))
        K = lk.k_xx_block(
            t, t, params.decay, params.sensitivity, params.lengthscale
        )
        sigma = mll_ops.add_diagonal(K, 1e-4 + params.obs_stddev**2)
        mean = jnp.repeat(params.basal / params.decay, 17)
        exact = float(mll_ops.mvn_logpdf(y, mean, sigma))
        val = float(
            ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=10,
                          parallel=False, uniform=False)
        )
        assert abs(val - exact) < 2e-3 * max(1.0, abs(exact))

    def test_gradients_match_dense(self, p53_shaped):
        t, X, y, var, params, model = p53_shaped
        raw = simm.unconstrain(params)
        g_ss = jax.grad(
            lambda r: ss.lfm_mll_ss(
                simm.constrain(r), t, y, jitter=1e-4, order=10, parallel=False
            )
        )(raw)
        g_ex = jax.grad(
            lambda r: model.mll_gridded(simm.constrain(r), t, y)
        )(raw)
        for name in raw._fields:
            a = np.asarray(getattr(g_ss, name))
            b = np.asarray(getattr(g_ex, name))
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
            assert rel < 5e-3, (name, a, b)


class TestParallelFilter:
    def test_parallel_equals_sequential(self, p53_shaped):
        """The associative-scan filter is the SAME algorithm: f64
        agreement to near machine precision on value and gradient."""
        t, X, y, var, params, model = p53_shaped
        v_seq = float(
            ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=10, parallel=False)
        )
        v_par = float(
            ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=10, parallel=True)
        )
        assert abs(v_seq - v_par) < 1e-9

        raw = simm.unconstrain(params)
        g_seq = jax.grad(
            lambda r: ss.lfm_mll_ss(
                simm.constrain(r), t, y, jitter=1e-4, order=10, parallel=False
            )
        )(raw)
        g_par = jax.grad(
            lambda r: ss.lfm_mll_ss(
                simm.constrain(r), t, y, jitter=1e-4, order=10, parallel=True
            )
        )(raw)
        for name in raw._fields:
            a, b = np.asarray(getattr(g_seq, name)), np.asarray(
                getattr(g_par, name)
            )
            assert np.abs(a - b).max() < 1e-9 * (np.abs(a).max() + 1.0)

    def test_parallel_equals_sequential_long_grid(self):
        """T=257 (odd, forces unbalanced scan tree) uniform grid."""
        rng = np.random.default_rng(3)
        T = 257
        t = jnp.linspace(0.0, 40.0, T)
        params = simm.init_params(2)
        y = jnp.asarray(rng.normal(size=(2 * T,)))
        v_seq = float(
            ss.lfm_mll_ss(params, t, y, jitter=1e-5, order=10, parallel=False)
        )
        v_par = float(
            ss.lfm_mll_ss(params, t, y, jitter=1e-5, order=10, parallel=True)
        )
        assert abs(v_seq - v_par) < 1e-8 * max(1.0, abs(v_seq))

    def test_masked_filter_matches_subset(self):
        """A masked step contributes nothing: filtering a union grid with
        mask == filtering the observed subset only."""
        rng = np.random.default_rng(4)
        params = simm.init_params(2)
        t_obs = jnp.asarray([1.0, 3.0, 5.0, 9.0])
        y = jnp.asarray(rng.normal(size=(2 * 4,)))
        ll_direct = float(
            ss.lfm_mll_ss(params, t_obs, y, jitter=1e-4, order=8,
                          parallel=False, uniform=False)
        )
        # Union grid with interleaved unobserved times.
        f_aug, p_inf, p0, _ = ss.build_lfm_ssm(
            params.decay, params.sensitivity, params.lengthscale, order=8
        )
        t_all = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 7.0, 9.0])
        mask = jnp.asarray([1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0])
        dts = jnp.diff(t_all, prepend=jnp.zeros((1,), t_all.dtype))
        a, q = ss.discretize(f_aug, p_inf, dts)
        h = ss.gene_observation_matrix(8, 2, 1, t_all.dtype)
        mean = params.basal / params.decay
        ys_obs = y.reshape(2, 4).T - mean[None, :]
        ys = jnp.zeros((7, 2)).at[jnp.asarray([0, 2, 4, 6])].set(ys_obs)
        r_var = jnp.full((2,), 1e-4) + params.obs_stddev**2
        for fil in (ss.kalman_filter, ss.parallel_filter):
            _, _, ll = fil(a, q, h, r_var, ys, p0, mask=mask)
            assert abs(float(ll) - ll_direct) < 1e-9


class TestBlockedSchedule:
    """The r5 hybrid blocked scans (``blocked_filter`` /
    ``blocked_rts_smoother``): batched combines inside sqrt(T)-sized
    blocks, a sequential composite chain across them — exact, so f64
    parity with the sequential pair to near machine precision on value
    and gradient, at every block size including non-dividing ones."""

    def test_blocked_mll_matches_sequential(self, p53_shaped):
        t, X, y, var, params, model = p53_shaped
        v_seq = float(
            ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=10, parallel=False)
        )
        for sched in ("blocked", 2, 4):
            v_blk = float(
                ss.lfm_mll_ss(
                    params, t, y, jitter=1e-4, order=10, parallel=sched
                )
            )
            assert abs(v_seq - v_blk) < 1e-9, sched

        raw = simm.unconstrain(params)
        g_seq = jax.grad(
            lambda r: ss.lfm_mll_ss(
                simm.constrain(r), t, y, jitter=1e-4, order=10, parallel=False
            )
        )(raw)
        g_blk = jax.grad(
            lambda r: ss.lfm_mll_ss(
                simm.constrain(r), t, y, jitter=1e-4, order=10,
                parallel="blocked",
            )
        )(raw)
        for name in raw._fields:
            a, b = np.asarray(getattr(g_seq, name)), np.asarray(
                getattr(g_blk, name)
            )
            assert np.abs(a - b).max() < 1e-9 * (np.abs(a).max() + 1.0)

    def test_blocked_long_odd_grid_pads_exactly(self):
        """T=257: no block size divides it — identity-element padding
        must be likelihood-neutral."""
        rng = np.random.default_rng(3)
        T = 257
        t = jnp.linspace(0.0, 40.0, T)
        params = simm.init_params(2)
        y = jnp.asarray(rng.normal(size=(2 * T,)))
        v_seq = float(
            ss.lfm_mll_ss(params, t, y, jitter=1e-5, order=10, parallel=False)
        )
        for sched in ("blocked", 8, 64):
            v_blk = float(
                ss.lfm_mll_ss(
                    params, t, y, jitter=1e-5, order=10, parallel=sched
                )
            )
            assert abs(v_seq - v_blk) < 1e-8 * max(1.0, abs(v_seq)), sched

    def test_blocked_filter_masks_and_moments(self):
        """Primitive-level parity incl. step mask + per-entry obs_mask:
        moments bitwise-close, likelihood exact."""
        rng = np.random.default_rng(11)
        params = simm.init_params(3)
        f_aug, p_inf, p0, _ = ss.build_lfm_ssm(
            params.decay, params.sensitivity, params.lengthscale, order=8
        )
        m_dim = p0.shape[0]
        T = 37
        t = jnp.asarray(np.sort(rng.uniform(0.1, 12.0, T)))
        dts = jnp.diff(t, prepend=jnp.zeros((1,), t.dtype))
        a, q = ss.discretize(f_aug, p_inf, dts)
        h = ss.gene_observation_matrix(m_dim - 3, 3, 1, t.dtype)
        rv = jnp.full((3,), 0.2)
        ys = jnp.asarray(rng.normal(size=(T, 3)))
        mask = jnp.asarray((rng.uniform(size=T) > 0.3).astype(float))
        om = jnp.asarray((rng.uniform(size=(T, 3)) > 0.2).astype(float))
        ms0, ps0, ll0 = ss.kalman_filter(
            a, q, h, rv, ys, p0, mask=mask, obs_mask=om
        )
        for blk in (None, 4, 16):
            ms2, ps2, ll2 = ss.blocked_filter(
                a, q, h, rv, ys, p0, mask=mask, obs_mask=om, block=blk
            )
            assert float(jnp.max(jnp.abs(ms2 - ms0))) < 1e-10
            assert float(jnp.max(jnp.abs(ps2 - ps0))) < 1e-10
            assert abs(float(ll2 - ll0)) < 1e-9

    def test_blocked_smoother_matches_sequential(self):
        """Smoother parity at the tolerance the log-depth smoother
        already meets (~1e-7 covariance error near the t=0 deterministic
        directions is inherent to the smoothing-semigroup path and shared
        with ``parallel_rts_smoother``)."""
        rng = np.random.default_rng(12)
        params = simm.init_params(3)
        f_aug, p_inf, p0, _ = ss.build_lfm_ssm(
            params.decay, params.sensitivity, params.lengthscale, order=8
        )
        m_dim = p0.shape[0]
        T = 41
        t = jnp.asarray(np.sort(rng.uniform(0.1, 12.0, T)))
        dts = jnp.diff(t, prepend=jnp.zeros((1,), t.dtype))
        a, q = ss.discretize(f_aug, p_inf, dts)
        h = ss.gene_observation_matrix(m_dim - 3, 3, 1, t.dtype)
        rv = jnp.full((3,), 0.2)
        ys = jnp.asarray(rng.normal(size=(T, 3)))
        ms, ps, _ = ss.kalman_filter(a, q, h, rv, ys, p0)
        sm0, sp0 = ss.rts_smoother(a, q, ms, ps)
        for blk in (None, 4, 16):
            sm2, sp2 = ss.blocked_rts_smoother(a, q, ms, ps, block=blk)
            assert float(jnp.max(jnp.abs(sm2 - sm0))) < 1e-8
            assert float(jnp.max(jnp.abs(sp2 - sp0))) < 1e-6

    def test_blocked_predict_matches_sequential(self):
        """The smoothing driver accepts the blocked schedule end-to-end."""
        rng = np.random.default_rng(13)
        params = simm.init_params(2)
        T = 9
        t = jnp.linspace(0.5, 11.5, T)
        y = jnp.asarray(rng.normal(size=(2 * T,)))
        t_test = jnp.linspace(0.0, 12.0, 23)
        out_seq = ss.lfm_predict_ss(
            params, t, y, t_test, noise_var=0.1, parallel=False
        )
        out_blk = ss.lfm_predict_ss(
            params, t, y, t_test, noise_var=0.1, parallel="blocked"
        )
        for a_, b_ in zip(out_seq, out_blk):
            assert float(jnp.max(jnp.abs(a_ - b_))) < 1e-6

    def test_auto_dispatch_is_sequential_on_cpu(self):
        """``parallel=None`` must resolve to the sequential pair on the
        CPU backend regardless of T (the measured policy)."""
        fil, smo = ss._select_schedule(None, 100000)
        assert fil is ss.kalman_filter and smo is ss.rts_smoother

    def test_integer_parallel_below_two_is_rejected(self):
        """parallel=0/1 as ints were the old boolean spellings — they
        must raise (a silent clamp would run the measured-slower blocked
        schedule), while bools keep their schedule meaning."""
        for bad in (0, 1, -4):
            with pytest.raises(ValueError, match="block length"):
                ss._select_schedule(bad, 100)
        assert ss._select_schedule(False, 100)[0] is ss.kalman_filter
        assert ss._select_schedule(True, 100)[0] is ss.parallel_filter

    def test_traced_bucketing_matches_perstep_under_jit(self):
        """The jitted ``max_unique`` branch (jnp.unique + nearest-bucket
        gather — the path bench/serving rely on): bit-identical A to the
        per-step build at an EXACT bound, at an OVERSTATED bound, and
        unchanged by the nearest-vs-exact gather rewrite."""
        params = simm.init_params(3)
        f_aug, p_inf, _, _ = ss.build_lfm_ssm(
            params.decay, params.sensitivity, params.lengthscale, order=8
        )
        t_all = np.sort(
            np.concatenate([np.linspace(0, 12, 17), np.linspace(0, 12, 25)])
        )
        dts = jnp.asarray(np.diff(t_all, prepend=0.0))
        u_exact = int(np.unique(np.asarray(dts)).size)
        assert u_exact < dts.shape[0]

        a_ref, q_ref = jax.jit(
            lambda d: ss.discretize(f_aug, p_inf, d)
        )(dts)
        for bound in (u_exact, u_exact + 5):
            a_b, q_b = jax.jit(
                lambda d, mb=bound: ss.discretize(
                    f_aug, p_inf, d, max_unique=mb
                )
            )(dts)
            assert bool(jnp.all(a_b == a_ref)), bound
            assert float(jnp.max(jnp.abs(q_b - q_ref))) < 1e-12, bound

    def test_chol_gain_knob_matches_pseudo_on_benign_problem(self):
        """``rts_smoother(chol_gain_from=k)``: on a well-conditioned
        problem (low order, away from t=0) the shifted-Cholesky tail
        must agree with the pseudo-solve path — the head/tail split's
        indexing is what this pins (the order>=10 NaN refutation is the
        knob's docstring)."""
        rng = np.random.default_rng(9)
        params = simm.init_params(3)
        f_aug, p_inf, p0, _ = ss.build_lfm_ssm(
            params.decay, params.sensitivity, params.lengthscale, order=6
        )
        m = p0.shape[0]
        T = 19
        t = jnp.asarray(np.linspace(0.5, 12.0, T))
        dts = jnp.diff(t, prepend=jnp.zeros((1,), t.dtype))
        a, q = ss.discretize(f_aug, p_inf, dts)
        h = ss.gene_observation_matrix(m - 3, 3, 1, t.dtype)
        rv = jnp.full((3,), 0.2)
        ys = jnp.asarray(rng.normal(size=(T, 3)))
        ms, ps, _ = ss.kalman_filter(a, q, h, rv, ys, p0)
        sm0, sp0 = ss.rts_smoother(a, q, ms, ps)
        for k in (0, 4, T - 1, T + 7):
            sm1, sp1 = ss.rts_smoother(a, q, ms, ps, chol_gain_from=k)
            assert float(jnp.max(jnp.abs(sm1 - sm0))) < 1e-7, k
            assert float(jnp.max(jnp.abs(sp1 - sp0))) < 1e-7, k

    def test_discretize_unique_dt_bucketing_is_bitwise(self):
        """Concrete union-grid dts: one expm per DISTINCT step plus a
        gather must be bit-identical to the per-step build (equal inputs
        give bitwise-equal expm outputs)."""
        params = simm.init_params(3)
        f_aug, p_inf, _, _ = ss.build_lfm_ssm(
            params.decay, params.sensitivity, params.lengthscale, order=8
        )
        t_all = np.sort(
            np.concatenate([np.linspace(0, 12, 29), np.linspace(0, 12, 41)])
        )
        dts = jnp.asarray(np.diff(t_all, prepend=0.0))
        assert np.unique(np.asarray(dts)).size < dts.shape[0]
        a_b, q_b = ss.discretize(f_aug, p_inf, dts)  # eager: bucketed
        a_p, q_p = jax.jit(
            lambda d: ss.discretize(f_aug, p_inf, d)
        )(dts)  # traced: per-step
        assert bool(jnp.all(a_b == a_p))
        # Q's stationarity matmul fuses differently under jit — 1 ulp.
        assert float(jnp.max(jnp.abs(q_b - q_p))) < 1e-12


class TestStationaryTail:
    """The opt-in frozen-gain steady-state tail (r5,
    ``stationary_after=K``): geometric convergence to the exact MLL in
    the warmup length, across families, with loud guards. Measured at
    N=5e5 f64: K=4096 of T=5e4 -> 9.3e-8 relative error at 5.6x; K=1024
    -> 2.6e-5 at 8.7x (CPU; the per-step covariance leg vanishes)."""

    @pytest.fixture(scope="class")
    def problem(self):
        rng = np.random.default_rng(2)
        G, T = 4, 256
        t = jnp.linspace(0.0, 25.0, T)
        params = simm.init_params(G)
        y = jnp.asarray(rng.normal(size=(G * T,)) + 1.0)
        return G, t, params, y

    def test_error_decays_geometrically(self, problem):
        G, t, params, y = problem
        v_exact = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=8))
        errs = []
        for k in (8, 16, 32, 64):
            v = float(
                ss.lfm_mll_ss(
                    params, t, y, jitter=1e-4, order=8, stationary_after=k
                )
            )
            errs.append(abs(v - v_exact))
        assert errs[-1] < 5e-2
        assert errs[0] > errs[1] > errs[2] > errs[3]
        # Roughly geometric: each doubling of K cuts the error > 2x.
        assert errs[0] / errs[-1] > 8

    def test_k_at_or_past_chain_length_is_exact(self, problem):
        G, t, params, y = problem
        v_exact = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=8))
        for k in (t.shape[0] - 1, t.shape[0] + 50):
            v = float(
                ss.lfm_mll_ss(
                    params, t, y, jitter=1e-4, order=8, stationary_after=k
                )
            )
            assert abs(v - v_exact) < 1e-9

    def test_other_families_and_grads(self, problem):
        from dis_project_tpu.models import multisimm, simm2

        G, t, params, y = problem
        raw = simm.unconstrain(params)
        g = jax.grad(
            lambda r: ss.lfm_mll_ss(
                simm.constrain(r), t, y, jitter=1e-4, order=8,
                stationary_after=64,
            )
        )(raw)
        assert all(
            np.isfinite(np.asarray(le)).all()
            for le in jax.tree_util.tree_leaves(g)
        )
        rng = np.random.default_rng(5)
        p2 = simm2.init_params(2)
        y2 = jnp.asarray(rng.normal(size=(2 * t.shape[0],)))
        d2 = abs(
            float(ss.lfm2_mll_ss(p2, t, y2, jitter=1e-4, order=8))
            - float(
                ss.lfm2_mll_ss(
                    p2, t, y2, jitter=1e-4, order=8, stationary_after=64
                )
            )
        )
        assert d2 < 0.5
        mp = multisimm.init_params(2, 2)
        dm = abs(
            float(ss.multisimm_mll_ss(mp, t, y2, jitter=1e-4, order=8))
            - float(
                ss.multisimm_mll_ss(
                    mp, t, y2, jitter=1e-4, order=8, stationary_after=64
                )
            )
        )
        assert dm < 0.5

    def test_guards(self, problem):
        G, t, params, y = problem
        with pytest.raises(ValueError, match="uniform"):
            ss.lfm_mll_ss(
                params, t, y, jitter=1e-4, order=8, uniform=False,
                stationary_after=8,
            )
        with pytest.raises(ValueError, match="obs_mask"):
            ss.lfm_mll_ss(
                params, t, y, jitter=1e-4, order=8, stationary_after=8,
                obs_mask=jnp.ones_like(y),
            )


class TestMultiForceFamily:
    """The R-force family through the same filter: only the SSM builder
    changes. Oracle: ``ExactMultiSIMM.mll`` (the closed forms sum the
    single-force kernels over independent Lawrence-convention priors —
    exactly what the block-diagonal force state realises)."""

    def _problem(self):
        from dis_project_tpu.models import multisimm

        G, R, T = 3, 2, 9
        mp = multisimm.init_params(G, R)
        mp = mp._replace(
            sensitivity=jnp.asarray(
                np.random.default_rng(0).uniform(0.4, 1.4, (G, R))
            ),
            lengthscale=jnp.asarray([1.2, 3.0]),
            decay=jnp.asarray([0.4, 0.8, 1.2]),
        )
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(1).normal(size=(G * T,)))
        model = multisimm.ExactMultiSIMM(
            num_genes=G, num_forces=R, jitter=1e-4
        )
        X = jnp.stack(
            [
                jnp.tile(t, G),
                jnp.repeat(jnp.arange(G), T).astype(t.dtype),
                jnp.ones(G * T),
            ],
            axis=1,
        )
        return mp, t, y, model, X

    def test_mll_matches_dense(self):
        mp, t, y, model, X = self._problem()
        exact = float(model.mll(mp, X, y))
        prev = np.inf
        for order, tol in ((8, 2e-3), (10, 5e-4)):
            v = float(
                ss.multisimm_mll_ss(mp, t, y, jitter=1e-4, order=order,
                                    parallel=False)
            )
            err = abs(v - exact)
            assert err < tol, (order, v, exact)
            assert err < prev + 1e-12
            prev = err

    def test_gradients_match_dense(self):
        from dis_project_tpu.models import multisimm

        mp, t, y, model, X = self._problem()
        raw = multisimm.unconstrain(mp)
        g_ss = jax.grad(
            lambda r: ss.multisimm_mll_ss(
                multisimm.constrain(r), t, y, jitter=1e-4, parallel=False
            )
        )(raw)
        g_ex = jax.grad(
            lambda r: model.mll(multisimm.constrain(r), X, y)
        )(raw)
        for name in raw._fields:
            a = np.asarray(getattr(g_ss, name))
            b = np.asarray(getattr(g_ex, name))
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
            assert rel < 1e-2, (name, a, b)

    def test_predict_matches_dense(self):
        """Smoothed posterior vs ``ExactMultiSIMM.latent_predict`` for
        BOTH forces in one pass: the multi-force closed forms use the
        self-consistent force prior, so mean AND variance must agree (to
        SDE-order + the dense path's double-jitter quirk)."""
        from dis_project_tpu.models import multisimm

        mp, t, y, model, X = self._problem()
        tt = jnp.linspace(0.0, 13.0, 40)
        var = jnp.full((y.shape[0],), 1e-3)
        f_mean, f_var, x_mean, x_var = ss.multisimm_predict_ss(
            mp, t, y, tt, noise_var=1e-3 + 1e-4, order=12
        )
        assert f_mean.shape == (2, 40) and f_var.shape == (2, 40)
        for r in range(2):
            post = model.latent_predict(
                mp, multisimm.force_rows(tt, r, t.dtype), X, y, var
            )
            em = np.asarray(post.mean)
            sm = np.asarray(f_mean[r])
            assert np.abs(em - sm).max() < 3e-3, r
            ev = np.asarray(jnp.diagonal(post.cov))
            sv = np.asarray(f_var[r])
            assert np.abs(ev - sv).max() < 3e-3, r
            assert sv.min() > 0.0
        assert np.isfinite(np.asarray(x_mean)).all()
        assert (np.asarray(x_var) >= 0.0).all()

    def test_stationary_covariance_is_lyapunov_consistent(self):
        """F P + P F^T must be a NEGATIVE-semidefinite residual confined
        to the force blocks (noise enters the forces only) — pins the
        closed-form block assembly against the full Lyapunov equation."""
        mp, t, y, model, X = self._problem()
        f_aug, p_inf, p0, _ = ss.build_multiforce_ssm(
            mp.decay, mp.sensitivity, mp.lengthscale, order=8
        )
        resid = np.asarray(f_aug @ p_inf + p_inf @ f_aug.T)
        rp = 2 * 8
        assert np.abs(resid[rp:, :]).max() < 1e-12
        assert np.abs(resid[:, rp:]).max() < 1e-12
        ev = np.linalg.eigvalsh(-resid[:rp, :rp])
        assert ev.min() > -1e-10


class TestSecondOrderFamily:
    """The spring-damper family through the filter. Oracle:
    ``SecondOrderSIMM.mll`` (complex-erf closed forms) — agreement here is
    ALSO an independent cross-validation of those closed forms, since the
    two computations share no code past the force prior."""

    def _problem(self):
        from dis_project_tpu.models import simm2

        G, T = 3, 9
        p2 = simm2.init_params(G)
        p2 = p2._replace(
            alpha=jnp.asarray([0.4, 0.7, 1.0]),
            omega=jnp.asarray([0.8, 1.2, 0.5]),
            sensitivity=jnp.asarray([1.0, 0.7, 1.3]),
        )
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(1).normal(size=(G * T,)))
        model = simm2.SecondOrderSIMM(num_genes=G, jitter=1e-4)
        X = jnp.stack(
            [
                jnp.tile(t, G),
                jnp.repeat(jnp.arange(G), T).astype(t.dtype),
                jnp.ones(G * T),
            ],
            axis=1,
        )
        return p2, t, y, model, X

    def test_mll_matches_complex_erf_closed_forms(self):
        p2, t, y, model, X = self._problem()
        exact = float(model.mll(p2, X, y))
        for order, tol in ((8, 1e-3), (10, 2e-4), (12, 3e-5)):
            v = float(
                ss.lfm2_mll_ss(p2, t, y, jitter=1e-4, order=order,
                               parallel=False)
            )
            assert abs(v - exact) < tol, (order, v, exact)

    def test_gradients_match_dense(self):
        from dis_project_tpu.models import simm2

        p2, t, y, model, X = self._problem()
        raw = simm2.unconstrain(p2)
        g_ss = jax.grad(
            lambda r: ss.lfm2_mll_ss(
                simm2.constrain(r), t, y, jitter=1e-4, parallel=False
            )
        )(raw)
        g_ex = jax.grad(lambda r: model.mll(simm2.constrain(r), X, y))(raw)
        for name in raw._fields:
            a = np.asarray(getattr(g_ss, name))
            b = np.asarray(getattr(g_ex, name))
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-12)
            assert rel < 1e-2, (name, a, b)

    def test_predict_matches_dense(self):
        """Smoothed posterior vs ``SecondOrderSIMM.latent_predict``: the
        simm2 closed forms use the self-consistent prior, so force mean
        AND variance must agree; the position block must match the dense
        ``output_predict`` mean at the per-point-variance convention."""
        from dis_project_tpu.models import simm2

        p2, t, y, model, X = self._problem()
        tt = jnp.linspace(0.0, 13.0, 40)
        var = jnp.full((y.shape[0],), 1e-3)
        rows_f = jnp.stack(
            [tt, -jnp.ones_like(tt), jnp.zeros_like(tt)], axis=-1
        )
        post = model.latent_predict(p2, rows_f, X, y, var)
        # Order 14, not the default 10: with near-noiseless conditioning
        # (1e-3) the SDE prior error is amplified through K^-1 — measured
        # mean error 2.2e-2 @10, 5.6e-3 @12, 1.2e-3 @14 (then f64
        # roundoff turns it around at 16).
        f_mean, f_var, x_mean, x_var = ss.lfm2_predict_ss(
            p2, t, y, tt, noise_var=1e-3 + 1e-4, order=14
        )
        em = np.asarray(post.mean)
        assert np.abs(em - np.asarray(f_mean)).max() < 3e-3
        ev = np.asarray(jnp.diagonal(post.cov))
        assert np.abs(ev - np.asarray(f_var)).max() < 3e-3
        assert float(f_var.min()) > 0.0
        assert x_mean.shape == (40, 3) and x_var.shape == (40, 3)
        assert np.isfinite(np.asarray(x_mean)).all()
        assert (np.asarray(x_var) >= 0.0).all()

    def test_stationary_covariance_is_lyapunov_consistent(self):
        p2, t, y, model, X = self._problem()
        f_aug, p_inf, p0, _ = ss.build_lfm2_ssm(
            p2.alpha, p2.omega, p2.sensitivity, p2.lengthscale, order=8
        )
        resid = np.asarray(f_aug @ p_inf + p_inf @ f_aug.T)
        assert np.abs(resid[8:, :]).max() < 1e-12
        assert np.abs(resid[:, 8:]).max() < 1e-12
        ev = np.linalg.eigvalsh(-resid[:8, :8])
        assert ev.min() > -1e-10

    def test_survives_beyond_closed_form_overflow_region(self):
        """The complex-erf closed forms carry exp((omega*l/2)^2)
        intermediates and die past omega*l ~ 12 in f64; the SSM's only
        transcendental is expm of a stable matrix. At omega*l = 30 the
        engine must return a finite MLL and gradient."""
        from dis_project_tpu.models import simm2

        p2, t, y, model, X = self._problem()
        p_hot = p2._replace(omega=jnp.asarray([10.0, 12.0, 9.0]),
                            lengthscale=jnp.asarray(3.0))
        v = float(
            ss.lfm2_mll_ss(p_hot, t, y, jitter=1e-4, parallel=False)
        )
        assert np.isfinite(v)
        raw = simm2.unconstrain(p_hot)
        g = jax.grad(
            lambda r: ss.lfm2_mll_ss(
                simm2.constrain(r), t, y, jitter=1e-4, parallel=False
            )
        )(raw)
        assert all(
            np.isfinite(np.asarray(le)).all()
            for le in jax.tree_util.tree_leaves(g)
        )


class TestShardedFilter:
    """Temporal (sequence) parallelism: the time axis sharded over the
    8-device virtual mesh. The semigroup factorisation is exact, so
    values AND gradients must match the single-device filter to machine
    precision — this is a scheduling change, not an approximation."""

    @pytest.fixture(scope="class")
    def mesh(self):
        from jax.sharding import Mesh

        return Mesh(np.asarray(jax.devices()).reshape(8), ("t",))

    def test_matches_single_device(self, mesh):
        rng = np.random.default_rng(5)
        params = simm.init_params(4)
        T = 37  # T-1 = 36 pads to 40 over 8 devices: exercises masking
        t = jnp.linspace(0.0, 20.0, T)
        y = jnp.asarray(rng.normal(size=(4 * T,)))
        v_ref = float(
            ss.lfm_mll_ss(params, t, y, jitter=1e-4, parallel=False)
        )
        v_sh = float(
            ss.lfm_mll_ss(params, t, y, jitter=1e-4, shard=(mesh, "t"))
        )
        assert abs(v_ref - v_sh) < 1e-10 * max(1.0, abs(v_ref))

    def test_gradients_match_single_device(self, mesh):
        rng = np.random.default_rng(6)
        params = simm.init_params(3)
        T = 33
        t = jnp.linspace(0.0, 16.0, T)
        y = jnp.asarray(rng.normal(size=(3 * T,)))
        raw = simm.unconstrain(params)
        g1 = jax.grad(
            lambda r: ss.lfm_mll_ss(
                simm.constrain(r), t, y, jitter=1e-4, parallel=False
            )
        )(raw)
        g2 = jax.grad(
            lambda r: ss.lfm_mll_ss(
                simm.constrain(r), t, y, jitter=1e-4, shard=(mesh, "t")
            )
        )(raw)
        for name in raw._fields:
            a = np.asarray(getattr(g1, name))
            b = np.asarray(getattr(g2, name))
            assert np.abs(a - b).max() < 1e-10 * (np.abs(a).max() + 1.0)

    def test_multiforce_family_matches_single_device(self, mesh):
        """The sharded filter is family-agnostic: the R-force block-diagonal
        force state rides the same semigroup, so `multisimm_mll_ss` with
        `shard=` must match its sequential value and gradient exactly."""
        from dis_project_tpu.models import multisimm

        G, R, T = 3, 2, 21  # T-1 = 20 pads to 24 over 8 devices
        mp = multisimm.init_params(G, R)
        mp = mp._replace(
            sensitivity=jnp.asarray(
                np.random.default_rng(0).uniform(0.4, 1.4, (G, R))
            ),
            lengthscale=jnp.asarray([1.2, 3.0]),
            decay=jnp.asarray([0.4, 0.8, 1.2]),
        )
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(8).normal(size=(G * T,)))
        raw = multisimm.unconstrain(mp)

        def mll(r, shard):
            return ss.multisimm_mll_ss(
                multisimm.constrain(r), t, y, jitter=1e-4,
                parallel=False if shard is None else None,
                shard=shard,
            )

        v_ref, g_ref = jax.value_and_grad(lambda r: mll(r, None))(raw)
        v_sh, g_sh = jax.value_and_grad(
            lambda r: mll(r, (mesh, "t"))
        )(raw)
        assert abs(float(v_ref) - float(v_sh)) < 1e-10 * max(
            1.0, abs(float(v_ref))
        )
        for name in raw._fields:
            a = np.asarray(getattr(g_ref, name))
            b = np.asarray(getattr(g_sh, name))
            assert np.abs(a - b).max() < 1e-10 * (np.abs(a).max() + 1.0)

    def test_second_order_family_matches_single_device(self, mesh):
        """Same for the spring-damper family's (x, v) gene pairs."""
        from dis_project_tpu.models import simm2

        G, T = 3, 19
        p2 = simm2.init_params(G)
        p2 = p2._replace(
            alpha=jnp.asarray([0.4, 0.7, 1.0]),
            omega=jnp.asarray([0.8, 1.2, 0.5]),
            sensitivity=jnp.asarray([1.0, 0.7, 1.3]),
        )
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(9).normal(size=(G * T,)))
        raw = simm2.unconstrain(p2)

        def mll(r, shard):
            return ss.lfm2_mll_ss(
                simm2.constrain(r), t, y, jitter=1e-4,
                parallel=False if shard is None else None,
                shard=shard,
            )

        v_ref, g_ref = jax.value_and_grad(lambda r: mll(r, None))(raw)
        v_sh, g_sh = jax.value_and_grad(
            lambda r: mll(r, (mesh, "t"))
        )(raw)
        assert abs(float(v_ref) - float(v_sh)) < 1e-10 * max(
            1.0, abs(float(v_ref))
        )
        for name in raw._fields:
            a = np.asarray(getattr(g_ref, name))
            b = np.asarray(getattr(g_sh, name))
            assert np.abs(a - b).max() < 1e-10 * (np.abs(a).max() + 1.0)

    def test_prior_element_composition(self):
        """The prior-as-element form underpinning the sharded start-state:
        composing (0, m0, P0, 0, 0) left of the step elements reproduces
        the sequential filter's states exactly."""
        rng = np.random.default_rng(7)
        params = simm.init_params(3)
        T = 12
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(rng.normal(size=(3 * T,)))
        f_aug, p_inf, p0, _ = ss.build_lfm_ssm(
            params.decay, params.sensitivity, params.lengthscale, order=8
        )
        dts = jnp.diff(t, prepend=jnp.zeros((1,), t.dtype))
        a, q = ss.discretize(f_aug, p_inf, dts)
        h = ss.gene_observation_matrix(8, 3, 1, t.dtype)
        ys = y.reshape(3, T).T - (params.basal / params.decay)[None, :]
        r_var = jnp.full((3,), 1e-4) + params.obs_stddev**2
        ms_ref, ps_ref, _ = ss.kalman_filter(a, q, h, r_var, ys, p0)

        rv = jnp.broadcast_to(r_var, (T, 3))
        mask = jnp.ones((T,))
        elems = jax.vmap(ss._filter_element, in_axes=(0, 0, None, 0, 0, 0))(
            a, q, h, rv, ys, mask
        )
        cur = ss._prior_element(jnp.zeros((p0.shape[0],)), p0)
        for i in range(T):
            cur = ss._combine(cur, jax.tree_util.tree_map(
                lambda x: x[i], elems
            ))
        assert np.abs(np.asarray(cur[1] - ms_ref[-1])).max() < 1e-12
        assert np.abs(np.asarray(cur[2] - ps_ref[-1])).max() < 1e-12

    def test_indivisible_t_fails_loudly(self, mesh):
        f_aug, p_inf, p0, _ = ss.build_lfm_ssm(
            jnp.asarray([0.4]), jnp.asarray([1.0]), jnp.asarray(2.5), order=8
        )
        a, q = ss.discretize(f_aug, p_inf, jnp.asarray(1.0))
        h = ss.gene_observation_matrix(8, 1, 1, jnp.float64)
        with pytest.raises(ValueError, match="divide"):
            ss.sharded_parallel_filter(
                a, q, h, jnp.ones((1,)), jnp.zeros((13, 1)), p0, mesh, "t"
            )


class TestDelayFamily:
    """Warped-event state-space engine for the delayed-response family
    (VERDICT r3 #5): per-gene delays are observation-time warps of the
    shared zero-delay state, so each (timepoint, gene) pair becomes one
    obs-masked filter step. Parity vs the dense ``ExactDelaySIMM`` closed
    forms (which apply the identical warp to the kernel inputs)."""

    def test_scalar_event_route_matches_masked_dense(self):
        """The r5 scalar-observation event chain (each event reads ONE
        gene — innovation covariance is a scalar) must equal the
        obs-masked dense-H filter on value and every gradient leaf,
        including the delays."""
        from dis_project_tpu.models import delaysimm

        rng = np.random.default_rng(3)
        G, T = 4, 11
        t = jnp.linspace(0.3, 12.0, T)
        params = delaysimm.init_params(G)._replace(
            delay=jnp.asarray([0.0, 0.4, 0.9, 0.2])
        )
        y = jnp.asarray(rng.normal(size=(G * T,)) + 1.0)
        v_sc = float(ss.delaysimm_mll_ss(params, t, y, jitter=1e-4, order=8))
        v_dn = float(
            ss.delaysimm_mll_ss(
                params, t, y, jitter=1e-4, order=8, parallel=True
            )
        )
        assert abs(v_sc - v_dn) < 1e-9
        raw = delaysimm.unconstrain(params)
        g_sc = jax.grad(
            lambda r: ss.delaysimm_mll_ss(
                delaysimm.constrain(r), t, y, jitter=1e-4, order=8
            )
        )(raw)
        g_dn = jax.grad(
            lambda r: ss.delaysimm_mll_ss(
                delaysimm.constrain(r), t, y, jitter=1e-4, order=8,
                parallel=True,
            )
        )(raw)
        for name in raw._fields:
            a, b = np.asarray(getattr(g_sc, name)), np.asarray(
                getattr(g_dn, name)
            )
            assert np.abs(a - b).max() < 1e-8 * (np.abs(a).max() + 1.0), name

    @pytest.fixture(scope="class")
    def problem(self):
        from dis_project_tpu.models import delaysimm

        G, T = 3, 9
        t = jnp.linspace(0.0, 12.0, T)
        rng = np.random.default_rng(5)
        y = jnp.asarray(rng.normal(size=(G * T,)))
        params = delaysimm.init_params(G)._replace(
            delay=jnp.asarray([0.5, 0.0, 1.3]),
            decay=jnp.asarray([0.4, 0.9, 0.6]),
            sensitivity=jnp.asarray([1.0, 0.8, 1.2]),
        )
        model = delaysimm.ExactDelaySIMM(num_genes=G, jitter=1e-4)
        rows = jnp.stack([
            jnp.tile(t, G),
            jnp.repeat(jnp.arange(G, dtype=t.dtype), T),
            jnp.ones((G * T,), t.dtype),
        ], axis=1)
        return G, T, t, y, params, model, rows

    def test_mll_matches_dense_by_order(self, problem):
        G, T, t, y, params, model, rows = problem
        dense = float(model.mll(params, rows, y))
        errs = [
            abs(dense - float(ss.delaysimm_mll_ss(
                params, t, y, jitter=1e-4, order=o, parallel=False
            )))
            for o in (8, 12)
        ]
        assert errs[0] < 5e-3 and errs[1] < 2e-4
        assert errs[1] < errs[0]  # SDE-order error, monotone

    def test_gradients_match_dense_incl_delay(self, problem):
        from dis_project_tpu.models import delaysimm

        G, T, t, y, params, model, rows = problem
        raw = delaysimm.unconstrain(params)
        gd = jax.grad(
            lambda r: model.mll(delaysimm.constrain(r), rows, y)
        )(raw)
        gs = jax.grad(
            lambda r: ss.delaysimm_mll_ss(
                delaysimm.constrain(r), t, y, jitter=1e-4, order=12,
                parallel=False,
            )
        )(raw)
        for name in raw._fields:
            a = np.asarray(getattr(gd, name))
            b = np.asarray(getattr(gs, name))
            assert np.abs(a - b).max() < 5e-4 * (np.abs(a).max() + 1.0), name

    def test_zero_delay_reduces_to_first_order_engine(self, problem):
        G, T, t, y, params, model, rows = problem
        p0 = params._replace(delay=jnp.zeros((G,)))
        v1 = float(ss.lfm_mll_ss(
            simm.SIMMParams(p0.basal, p0.sensitivity, p0.decay,
                            p0.lengthscale, p0.obs_stddev),
            t, y, jitter=1e-4, parallel=False,
        ))
        v2 = float(ss.delaysimm_mll_ss(p0, t, y, jitter=1e-4,
                                       parallel=False))
        assert abs(v1 - v2) < 1e-9 * max(1.0, abs(v1))

    def test_predict_matches_dense(self, problem):
        """Force posterior vs the dense warped ``latent_predict`` and
        gene posterior vs ``multi_gene_predict`` (noise conventions
        matched per path: the force path has no learned noise, the gene
        path adds obs_stddev^2 — the reference asymmetry)."""
        G, T, t, y, params, model, rows = problem
        tt = jnp.linspace(0.0, 13.0, 20)
        test_rows = jnp.stack(
            [tt, -jnp.ones_like(tt), jnp.zeros_like(tt)], axis=1
        )
        var_pp = jnp.full((G * T,), 1e-3 - 1e-4)
        post = model.latent_predict(params, test_rows, rows, y, var_pp)
        fm, fv, _, _ = ss.delaysimm_predict_ss(
            params, t, y, tt, noise_var=1e-3, order=12, parallel=False
        )
        em = np.asarray(post.mean)
        assert np.corrcoef(em, np.asarray(fm))[0, 1] > 0.9999
        assert float(fv.min()) > 0.0

        grows = jnp.stack([
            jnp.tile(tt, G),
            jnp.repeat(jnp.arange(G, dtype=t.dtype), tt.shape[0]),
            jnp.ones((G * tt.shape[0],), t.dtype),
        ], axis=1)
        gpost = model.multi_gene_predict(params, grows, rows, y, var_pp)
        obs2 = float(params.obs_stddev) ** 2
        _, _, xm, xv = ss.delaysimm_predict_ss(
            params, t, y, tt, noise_var=1e-3 + obs2, order=12,
            parallel=False,
        )
        gm = np.asarray(gpost.mean).reshape(G, tt.shape[0]).T
        assert np.abs(gm - np.asarray(xm)).max() < 1e-3
        assert float(xv.min()) >= 0.0

    def test_sharded_and_parallel_match(self, problem):
        from jax.sharding import Mesh

        G, T, t, y, params, model, rows = problem
        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("t",))
        v_ref, g_ref = jax.value_and_grad(
            lambda d: ss.delaysimm_mll_ss(
                params._replace(delay=d), t, y, jitter=1e-4,
                parallel=False,
            )
        )(params.delay)
        v_par = float(ss.delaysimm_mll_ss(params, t, y, jitter=1e-4,
                                          parallel=True))
        v_sh, g_sh = jax.value_and_grad(
            lambda d: ss.delaysimm_mll_ss(
                params._replace(delay=d), t, y, jitter=1e-4,
                shard=(mesh, "t"),
            )
        )(params.delay)
        assert abs(float(v_ref) - v_par) < 1e-9 * max(1.0, abs(float(v_ref)))
        assert abs(float(v_ref) - float(v_sh)) < 1e-9 * max(
            1.0, abs(float(v_ref))
        )
        assert np.abs(np.asarray(g_ref - g_sh)).max() < 1e-8

    def test_generator_delay_recovery(self):
        """End-to-end: train on delayed quadrature data, recover the
        generating delays (the dense10k delaysimm route's math at smoke
        scale)."""
        import optax

        from dis_project_tpu.data import synthetic
        from dis_project_tpu.data.dataset import train_arrays
        from dis_project_tpu.models import delaysimm

        scfg = synthetic.SyntheticConfig(
            num_genes=5, num_timepoints=30, num_replicates=1,
            noise_std=0.05,
        )
        data = synthetic.generate_ode_delay(jax.random.PRNGKey(0), scfg)
        _, y, _ = train_arrays(data)
        t = jnp.asarray(data.timepoints)
        raw0 = delaysimm.unconstrain(delaysimm.init_params(5))
        opt = optax.adam(0.02)
        zero_raw = jnp.asarray(-20.0)

        obj = lambda r: -ss.delaysimm_mll_ss(  # noqa: E731
            delaysimm.constrain(r), t, y, jitter=1e-4, order=10,
            parallel=False,
        )

        @jax.jit
        def fit(raw):
            st = opt.init(raw)

            def step(c, _):
                raw, st = c
                _, g = jax.value_and_grad(obj)(raw)
                u, st = opt.update(g, st)
                raw = optax.apply_updates(raw, u)
                raw = raw._replace(delay=raw.delay.at[0].set(zero_raw))
                return (raw, st), None

            (raw, _), _ = jax.lax.scan(step, (raw, st), None, length=400)
            return raw

        p = delaysimm.constrain(fit(raw0))
        d_true = np.asarray(data.params_true["delay"])
        d_fit = np.asarray(p.delay)
        assert np.corrcoef(d_fit, d_true)[0, 1] > 0.99
        assert np.abs(d_fit - d_true).mean() < 0.1


class TestPerForceKernels:
    """Per-force priors for the R-force family (r4): the force blocks
    may mix RBF with exact Matern smoothness (ragged state dims)."""

    @pytest.fixture(scope="class")
    def problem(self):
        from dis_project_tpu.models import multisimm

        G, R, T = 3, 2, 9
        mp = multisimm.init_params(G, R)._replace(
            sensitivity=jnp.asarray(
                np.random.default_rng(0).uniform(0.4, 1.4, (G, R))
            ),
            lengthscale=jnp.asarray([1.2, 3.0]),
            decay=jnp.asarray([0.4, 0.8, 1.2]),
        )
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(8).normal(size=(G * T,)))
        return G, R, T, mp, t, y

    def test_all_rbf_bit_equal_to_default(self, problem):
        G, R, T, mp, t, y = problem
        v0 = float(ss.multisimm_mll_ss(mp, t, y, jitter=1e-4,
                                       parallel=False))
        v1 = float(ss.multisimm_mll_ss(
            mp, t, y, jitter=1e-4, parallel=False,
            force_kernels=("rbf", "rbf"),
        ))
        assert v0 == v1

    def test_mixed_kernels_grads_finite_and_predict(self, problem):
        from dis_project_tpu.models import multisimm

        G, R, T, mp, t, y = problem
        raw = multisimm.unconstrain(mp)
        v, g = jax.value_and_grad(lambda r: ss.multisimm_mll_ss(
            multisimm.constrain(r), t, y, jitter=1e-4, parallel=False,
            force_kernels=("rbf", "matern32"),
        ))(raw)
        assert np.isfinite(float(v))
        assert all(
            np.isfinite(np.asarray(le)).all()
            for le in jax.tree_util.tree_leaves(g)
        )
        tt = jnp.linspace(0.0, 13.0, 11)
        fm, fv, xm, xv = ss.multisimm_predict_ss(
            mp, t, y, tt, noise_var=1e-3, parallel=False,
            force_kernels=("rbf", "matern32"),
        )
        assert fm.shape == (R, 11) and xm.shape == (11, G)
        assert float(fv.min()) > 0.0

    def test_all_matern_matches_brute_force_joint(self, problem):
        """Ragged all-Matern blocks vs the dense SSM-implied joint MVN
        log-density — exact agreement (both realizations exact)."""
        from scipy.linalg import expm

        G, R, T, mp, t, y = problem
        kinds = ("matern32", "matern52")
        v_ss = float(ss.multisimm_mll_ss(
            mp, t, y, jitter=1e-4, parallel=False, force_kernels=kinds
        ))
        f_aug, p_inf, p0, _ = ss.build_multiforce_ssm(
            mp.decay, mp.sensitivity, mp.lengthscale, force_kernels=kinds
        )
        m = p0.shape[0]
        p_tot = m - G
        F, Pinf = np.asarray(f_aug), np.asarray(p_inf)
        tg = np.asarray(t)
        dts = np.diff(tg, prepend=0.0)
        A = [expm(F * dt) for dt in dts]
        Q = [Pinf - a @ Pinf @ a.T for a in A]
        P = []
        prev = np.asarray(p0)
        for i in range(T):
            prev = A[i] @ prev @ A[i].T + Q[i]
            P.append(0.5 * (prev + prev.T))
        J = np.zeros((T * m, T * m))
        for i in range(T):
            J[i*m:(i+1)*m, i*m:(i+1)*m] = P[i]
            Phi = np.eye(m)
            for j in range(i + 1, T):
                Phi = A[j] @ Phi
                C = P[i] @ Phi.T
                J[i*m:(i+1)*m, j*m:(j+1)*m] = C
                J[j*m:(j+1)*m, i*m:(i+1)*m] = C.T
        H = np.zeros((T * G, T * m))
        for i in range(T):
            H[i*G:(i+1)*G, i*m + p_tot:(i+1)*m] = np.eye(G)
        noise = 1e-4 + 1.0
        S = H @ J @ H.T + noise * np.eye(T * G)
        yc = np.asarray(y).reshape(G, T).T.reshape(-1) - np.tile(
            np.asarray(mp.basal / mp.decay), T
        )
        _, logdet = np.linalg.slogdet(S)
        v_bf = -0.5 * (
            logdet + yc @ np.linalg.solve(S, yc)
            + T * G * np.log(2 * np.pi)
        )
        assert abs(v_ss - v_bf) < 1e-8 * max(1.0, abs(v_bf))

    def test_wrong_arity_fails_loudly(self, problem):
        G, R, T, mp, t, y = problem
        with pytest.raises(ValueError, match="entries"):
            ss.build_multiforce_ssm(
                mp.decay, mp.sensitivity, mp.lengthscale,
                force_kernels=("rbf",),
            )

    def test_second_order_matern_matches_brute_force(self):
        """lfm2_mll_ss(force_kernel=) rides the same plumbing: rbf
        bit-equal to the default, Matern exact vs the SSM-implied joint
        oracle."""
        from scipy.linalg import expm

        from dis_project_tpu.models import simm2

        G, T = 2, 8
        p2 = simm2.init_params(G)._replace(
            alpha=jnp.asarray([0.4, 0.7]),
            omega=jnp.asarray([0.8, 1.2]),
            sensitivity=jnp.asarray([1.0, 0.7]),
        )
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(9).normal(size=(G * T,)))
        v0 = float(ss.lfm2_mll_ss(p2, t, y, jitter=1e-4, parallel=False))
        v0b = float(ss.lfm2_mll_ss(p2, t, y, jitter=1e-4,
                                   parallel=False, force_kernel="rbf"))
        assert v0 == v0b
        v_ss = float(ss.lfm2_mll_ss(
            p2, t, y, jitter=1e-4, parallel=False,
            force_kernel="matern32",
        ))
        f_aug, p_inf, p0, _ = ss.build_lfm2_ssm(
            p2.alpha, p2.omega, p2.sensitivity, p2.lengthscale,
            force_kernel="matern32",
        )
        m = p0.shape[0]
        p_f = m - 2 * G
        F, Pinf = np.asarray(f_aug), np.asarray(p_inf)
        tg = np.asarray(t)
        dts = np.diff(tg, prepend=0.0)
        A = [expm(F * dt) for dt in dts]
        Q = [Pinf - a_ @ Pinf @ a_.T for a_ in A]
        P = []
        prev = np.asarray(p0)
        for i in range(T):
            prev = A[i] @ prev @ A[i].T + Q[i]
            P.append(0.5 * (prev + prev.T))
        J = np.zeros((T * m, T * m))
        for i in range(T):
            J[i*m:(i+1)*m, i*m:(i+1)*m] = P[i]
            Phi = np.eye(m)
            for j in range(i + 1, T):
                Phi = A[j] @ Phi
                C = P[i] @ Phi.T
                J[i*m:(i+1)*m, j*m:(j+1)*m] = C
                J[j*m:(j+1)*m, i*m:(i+1)*m] = C.T
        H1 = np.zeros((G, m))
        H1[:, p_f:p_f + G] = np.eye(G)
        H = np.zeros((T * G, T * m))
        for i in range(T):
            H[i*G:(i+1)*G, i*m:(i+1)*m] = H1
        noise = 1e-4 + 1.0
        S = H @ J @ H.T + noise * np.eye(T * G)
        spring = np.asarray(p2.alpha)**2 + np.asarray(p2.omega)**2
        yc = np.asarray(y).reshape(G, T).T.reshape(-1) - np.tile(
            np.asarray(p2.basal) / spring, T
        )
        _, logdet = np.linalg.slogdet(S)
        v_bf = -0.5 * (
            logdet + yc @ np.linalg.solve(S, yc)
            + T * G * np.log(2 * np.pi)
        )
        assert abs(v_ss - v_bf) < 1e-8 * max(1.0, abs(v_bf))
        # Predict path shares the plumbing too.
        fm, fv, xm, xv = ss.lfm2_predict_ss(
            p2, t, y, jnp.linspace(0.0, 13.0, 9), noise_var=1e-3,
            parallel=False, force_kernel="matern52",
        )
        assert float(fv.min()) > 0.0 and xm.shape == (9, G)


class TestMaternForce:
    """Matern force priors (r4): EXACTLY Markovian at state dims 1/2/3 —
    unlike the RBF's order-p approximation — and a force-prior family
    the closed-form (RBF-only) dense Gram cannot express at all."""

    def test_ssm_covariance_matches_kernel_exactly(self):
        """The canonical system's stationary autocovariance must equal
        the closed-form Matern kernel to machine precision (this is an
        exact realization, not an approximation)."""
        from scipy.linalg import expm

        ell = 2.1
        kernels = {
            "matern12": lambda r: np.exp(-r / ell),
            "matern32": lambda r: (1 + np.sqrt(3) * r / ell)
            * np.exp(-np.sqrt(3) * r / ell),
            "matern52": lambda r: (
                1 + np.sqrt(5) * r / ell + 5 * r**2 / (3 * ell**2)
            ) * np.exp(-np.sqrt(5) * r / ell),
        }
        for kind, kf in kernels.items():
            f_c, h_c, pd = ss.matern_canonical_system(kind)
            rate = ss._FORCE_RATE[kind] / ell
            for tau in np.linspace(0.0, 6.0, 13):
                cov = h_c @ expm(f_c * rate * tau) @ np.diag(pd) @ h_c
                assert abs(cov - kf(tau)) < 1e-12, (kind, tau)

    def test_mll_matches_brute_force_joint(self):
        """lfm_mll_ss with a Matern prior vs the dense MVN log-density
        under the SSM-implied joint covariance of the observations —
        EXACT agreement expected (no SDE-order error term)."""
        from scipy.linalg import expm

        G, T = 2, 7
        ell = 2.0
        decay = np.array([0.4, 1.1])
        sens = np.array([1.0, 0.8])
        basal = np.array([0.1, 0.05])
        t_grid = np.linspace(0.0, 12.0, T)
        rng = np.random.default_rng(3)
        y = rng.normal(size=(G * T,))
        noise = 1e-4 + 1.0  # jitter + obs_stddev^2 at init obs=1.0
        params = simm.init_params(G)._replace(
            decay=jnp.asarray(decay), sensitivity=jnp.asarray(sens),
            basal=jnp.asarray(basal), lengthscale=jnp.asarray(ell),
        )
        for kind in ("matern12", "matern32", "matern52"):
            v_ss = float(ss.lfm_mll_ss(
                params, jnp.asarray(t_grid), jnp.asarray(y),
                jitter=1e-4, parallel=False, force_kernel=kind,
            ))
            # Brute force: propagate the joint Gaussian over all grid
            # states, read the gene components, dense MVN logpdf.
            f_aug, p_inf, p0, _ = ss.build_lfm_ssm(
                params.decay, params.sensitivity, params.lengthscale,
                force_kernel=kind,
            )
            m = p0.shape[0]
            p_f = m - G
            F = np.asarray(f_aug)
            Pinf = np.asarray(p_inf)
            dts = np.diff(t_grid, prepend=0.0)
            A = [expm(F * dt) for dt in dts]
            Q = [Pinf - a @ Pinf @ a.T for a in A]
            P = []
            prev = np.asarray(p0)
            for i in range(T):
                prev = A[i] @ prev @ A[i].T + Q[i]
                P.append(0.5 * (prev + prev.T))
            J = np.zeros((T * m, T * m))
            for i in range(T):
                J[i * m:(i + 1) * m, i * m:(i + 1) * m] = P[i]
                Phi = np.eye(m)
                for j in range(i + 1, T):
                    Phi = A[j] @ Phi
                    C = P[i] @ Phi.T
                    J[i * m:(i + 1) * m, j * m:(j + 1) * m] = C
                    J[j * m:(j + 1) * m, i * m:(i + 1) * m] = C.T
            H = np.zeros((T * G, T * m))
            for i in range(T):
                H[i * G:(i + 1) * G, i * m + p_f:(i + 1) * m] = np.eye(G)
            S = H @ J @ H.T + noise * np.eye(T * G)
            yc = y.reshape(G, T).T.reshape(-1) - np.tile(
                basal / decay, T
            )
            sign, logdet = np.linalg.slogdet(S)
            quad = yc @ np.linalg.solve(S, yc)
            v_bf = -0.5 * (logdet + quad + T * G * np.log(2 * np.pi))
            assert abs(v_ss - v_bf) < 1e-8 * max(1.0, abs(v_bf)), kind

    def test_grads_finite_and_trainable(self):
        G, T = 3, 9
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(5).normal(size=(G * T,)))
        raw = simm.unconstrain(simm.init_params(G))
        for kind in ("matern12", "matern32", "matern52"):
            v, g = jax.value_and_grad(
                lambda r: ss.lfm_mll_ss(
                    simm.constrain(r), t, y, jitter=1e-4,
                    parallel=False, force_kernel=kind,
                )
            )(raw)
            assert np.isfinite(float(v)), kind
            assert all(
                np.isfinite(np.asarray(le)).all()
                for le in jax.tree_util.tree_leaves(g)
            ), kind

    def test_delay_and_ekf_accept_matern(self):
        """The warp reduction and the EKF linearization are both
        prior-agnostic: the delay family's zero-delay Matern MLL reduces
        to the first-order Matern engine, and the identity-response EKF
        matches the Matern linear engine to integration error."""
        from dis_project_tpu.models import delaysimm

        G, T = 3, 9
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(5).normal(size=(G * T,)))
        dp = delaysimm.init_params(G)._replace(
            delay=jnp.zeros((G,)),
            decay=jnp.asarray([0.4, 0.9, 0.6]),
            sensitivity=jnp.asarray([1.0, 0.8, 1.2]),
        )
        kin = simm.SIMMParams(dp.basal, dp.sensitivity, dp.decay,
                              dp.lengthscale, dp.obs_stddev)
        v1 = float(ss.lfm_mll_ss(kin, t, y, jitter=1e-4, parallel=False,
                                 force_kernel="matern32"))
        v2 = float(ss.delaysimm_mll_ss(dp, t, y, jitter=1e-4,
                                       parallel=False,
                                       force_kernel="matern32"))
        assert abs(v1 - v2) < 1e-9 * max(1.0, abs(v1))
        y2 = y + 1.0
        v_lin = float(ss.lfm_mll_ss(kin, t, y2, jitter=1e-4,
                                    parallel=False,
                                    force_kernel="matern32"))
        v_ekf = float(ss.nlfm_mll_ekf(
            kin, t, y2, response="identity", jitter=1e-4, substeps=8,
            force_kernel="matern32",
        ))
        assert abs(v_lin - v_ekf) < 5e-6 * max(1.0, abs(v_lin))

    def test_predict_and_streaming_accept_matern(self):
        G, T = 2, 7
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(1).normal(size=(G * T,)))
        params = simm.init_params(G)
        tt = jnp.linspace(0.0, 13.0, 11)
        fm, fv, xm, xv = ss.lfm_predict_ss(
            params, t, y, tt, noise_var=1e-3, parallel=False,
            force_kernel="matern32",
        )
        assert np.isfinite(np.asarray(fm)).all()
        assert float(fv.min()) > 0.0
        carry, aux = ss.streaming_init(params, force_kernel="matern52")
        c = ss.streaming_update(carry, aux, 1.0, jnp.ones(G),
                                1e-4 + params.obs_stddev**2)
        assert np.isfinite(float(c.ll))


class TestPriorSampler:
    """sample_trajectory_ss (r4): O(T) prior draws — stationary force
    statistics must match the (exact, for Matern) kernel and the t=0
    gene convention must hold exactly."""

    def test_matern_prior_statistics(self):
        params = simm.init_params(2)._replace(
            lengthscale=jnp.asarray(2.0)
        )
        t = jnp.linspace(0.0, 12.0, 25)
        f, x = ss.sample_trajectory_ss(
            params, t, jax.random.PRNGKey(0), num_samples=4096,
            force_kernel="matern32",
        )
        assert f.shape == (4096, 25) and x.shape == (4096, 25, 2)
        fc = np.asarray(f) - np.asarray(f).mean(0)
        # Stationary marginal variance ~ 1 away from t=0.
        assert abs(fc[:, 12].var() - 1.0) < 0.08
        # Cross-time covariance vs the closed-form Matern kernel.
        tau = float(t[20] - t[12])
        ell = 2.0
        k = (1 + np.sqrt(3) * tau / ell) * np.exp(
            -np.sqrt(3) * tau / ell
        )
        emp = (fc[:, 12] * fc[:, 20]).mean()
        assert abs(emp - k) < 0.06
        # Genes start deterministically at B/D (the t=0 convention).
        assert float(np.asarray(x)[:, 0, :].std(0).max()) == 0.0


class TestFFBS:
    """Forward-filter backward-sampling (r4): JOINT posterior force
    draws — marginals must match the smoother, and the cross-time
    covariance must match the dense joint conditional (the property
    marginal bands cannot carry)."""

    def test_marginals_match_smoother(self):
        G, T = 3, 9
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(5).normal(size=(G * T,)))
        params = simm.init_params(G)._replace(
            decay=jnp.asarray([0.4, 0.9, 0.6]),
            sensitivity=jnp.asarray([1.0, 0.8, 1.2]),
        )
        tt = jnp.linspace(0.0, 13.0, 20)
        fm, fv, _, _ = ss.lfm_predict_ss(
            params, t, y, tt, noise_var=1e-3, parallel=False
        )
        draws = np.asarray(ss.posterior_sample_ss(
            params, t, y, tt, jax.random.PRNGKey(0), noise_var=1e-3,
            num_samples=2048,
        ))
        assert draws.shape == (2048, 20)
        scale = np.abs(np.asarray(fm)).max()
        assert np.abs(draws.mean(0) - np.asarray(fm)).max() < 0.02 * scale
        assert (
            np.abs(draws.var(0) - np.asarray(fv)).max()
            < 0.05 * np.asarray(fv).max()
        )

    def test_joint_covariance_matches_dense_conditional(self):
        """Empirical cross-time covariance of the draws vs the dense
        joint conditional covariance of the SAME (exact Matern) model —
        the jointness property itself, oracle-pinned."""
        from scipy.linalg import expm

        G, T = 2, 6
        decay = np.array([0.5, 1.0])
        sens = np.array([1.0, 0.8])
        t_grid = np.linspace(0.0, 10.0, T)
        tt = np.linspace(1.0, 11.0, 5)
        rng = np.random.default_rng(7)
        y = rng.normal(size=(G * T,))
        noise = 1e-2
        params = simm.init_params(G)._replace(
            decay=jnp.asarray(decay), sensitivity=jnp.asarray(sens),
            basal=jnp.zeros(G),
        )
        kind = "matern32"
        draws = np.asarray(ss.posterior_sample_ss(
            params, jnp.asarray(t_grid), jnp.asarray(y), jnp.asarray(tt),
            jax.random.PRNGKey(1), noise_var=noise, num_samples=8192,
            force_kernel=kind,
        ))
        emp_cov = np.cov(draws.T)  # (5, 5)

        # Dense joint conditional from the SSM (exact for matern32).
        f_aug, p_inf, p0, hf = ss.build_lfm_ssm(
            params.decay, params.sensitivity, params.lengthscale,
            force_kernel=kind,
        )
        m = p0.shape[0]
        p_f = m - G
        t_all = np.concatenate([t_grid, tt])
        idx = np.argsort(t_all, kind="stable")
        t_sorted = t_all[idx]
        is_train = np.concatenate([np.ones(T), np.zeros(len(tt))])[idx]
        n_all = len(t_sorted)
        dts = np.diff(t_sorted, prepend=0.0)
        F = np.asarray(f_aug)
        Pinf = np.asarray(p_inf)
        A = [expm(F * dt) for dt in dts]
        Q = [Pinf - a_ @ Pinf @ a_.T for a_ in A]
        P = []
        prev = np.asarray(p0)
        for i in range(n_all):
            prev = A[i] @ prev @ A[i].T + Q[i]
            P.append(0.5 * (prev + prev.T))
        J = np.zeros((n_all * m, n_all * m))
        for i in range(n_all):
            J[i*m:(i+1)*m, i*m:(i+1)*m] = P[i]
            Phi = np.eye(m)
            for j in range(i + 1, n_all):
                Phi = A[j] @ Phi
                C = P[i] @ Phi.T
                J[i*m:(i+1)*m, j*m:(j+1)*m] = C
                J[j*m:(j+1)*m, i*m:(i+1)*m] = C.T
        train_pos = np.nonzero(is_train)[0]
        test_pos = np.nonzero(1 - is_train)[0]
        H = np.zeros((T * G, n_all * m))
        for k, i in enumerate(train_pos):
            H[k*G:(k+1)*G, i*m + p_f:(i+1)*m] = np.eye(G)
        Fsel = np.zeros((len(tt), n_all * m))
        hfn = np.asarray(hf)
        for k, i in enumerate(test_pos):
            Fsel[k, i*m:(i+1)*m] = hfn
        S = H @ J @ H.T + noise * np.eye(T * G)
        Kfy = Fsel @ J @ H.T
        cond_cov = Fsel @ J @ Fsel.T - Kfy @ np.linalg.solve(S, Kfy.T)
        # Monte-Carlo tolerance: ~ sqrt(2/N) relative on covariances.
        assert np.abs(emp_cov - cond_cov).max() < 0.06 * np.abs(
            cond_cov
        ).max()


class TestStreaming:
    """Online serving API (r4): per-observation O((p+G)^3) updates at
    constant memory must reproduce the batch filter bitwise."""

    def test_frozen_updates_match_batch_stationary_tail(self):
        """The r5 frozen-gain serving path: warm up with exact
        streaming updates, freeze, then the O(m^2) per-arrival updates
        must (a) accumulate the SAME likelihood as the batch
        ``stationary_after`` route on the same grid, and (b) converge to
        the exact stream geometrically in the warmup length."""
        rng = np.random.default_rng(8)
        G, T, K = 3, 160, 48
        t0_first = 0.08
        dt = 0.08
        t = jnp.asarray(t0_first + dt * np.arange(T))
        params = simm.init_params(G)
        ys = rng.normal(size=(T, G)) + 1.0
        y_flat = jnp.asarray(ys.T.reshape(-1))
        nv = 1e-4 + float(params.obs_stddev) ** 2

        # batch steady-state reference on the same uniform grid
        ll_batch = float(
            ss.lfm_mll_ss(
                params, t, y_flat, jitter=1e-4, order=8,
                stationary_after=K,
            )
        )
        ll_exact = float(
            ss.lfm_mll_ss(params, t, y_flat, jitter=1e-4, order=8)
        )

        carry, aux = ss.streaming_init(params, order=8)
        for i in range(K + 1):  # step 0 + K exact warmup steps
            carry = ss.streaming_update(
                carry, aux, float(t[i]), jnp.asarray(ys[i]), nv
            )
        pack = ss.streaming_freeze(carry, aux, dt, nv)
        for i in range(K + 1, T):
            carry = ss.streaming_update_frozen(
                carry, pack, jnp.asarray(ys[i])
            )
        ll_stream = float(carry.ll)
        assert abs(ll_stream - ll_batch) < 1e-6 * max(1.0, abs(ll_batch))
        assert abs(ll_stream - ll_exact) < 0.05
        # predict still works off the frozen carry
        fm, fv, xm, xv = ss.streaming_predict(
            carry, aux, params, float(t[-1]) + 0.5
        )
        assert np.isfinite(float(fm)) and float(fv) > 0.0

    def test_streaming_matches_batch(self):
        G, T = 3, 9
        t = jnp.linspace(0.5, 12.0, T)
        y = jnp.asarray(np.random.default_rng(5).normal(size=(G * T,)))
        params = simm.init_params(G)._replace(
            decay=jnp.asarray([0.4, 0.9, 0.6]),
            sensitivity=jnp.asarray([1.0, 0.8, 1.2]),
        )
        v_batch = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4,
                                      parallel=False, uniform=False))
        ys = y.reshape(G, T).T
        carry, aux = ss.streaming_init(params)
        rv = 1e-4 + params.obs_stddev**2
        step = jax.jit(
            lambda c, ti, yi: ss.streaming_update(c, aux, ti, yi, rv)
        )
        for i in range(T):
            carry = step(carry, t[i], ys[i])
        assert abs(v_batch - float(carry.ll)) < 1e-10 * max(
            1.0, abs(v_batch)
        )
        # Filtered terminal moments match the batch filter to roundoff.
        f_aug, p_inf, p0, _ = ss.build_lfm_ssm(
            params.decay, params.sensitivity, params.lengthscale
        )
        dts = jnp.diff(t, prepend=jnp.zeros((1,), t.dtype))
        a, q = ss.discretize(f_aug, p_inf, dts)
        h = ss.gene_observation_matrix(10, G, 1, t.dtype)
        ms, ps, _ = ss.kalman_filter(
            a, q, h, jnp.full((G,), float(rv)),
            ys - (params.basal / params.decay)[None, :], p0,
        )
        assert np.abs(np.asarray(carry.mean - ms[-1])).max() < 1e-12
        assert np.abs(np.asarray(carry.cov - ps[-1])).max() < 1e-12

    def test_streaming_out_of_order_poisons_ll_not_state(self):
        """t_new < t_last must NaN the accumulated ll at THIS call while
        leaving the filter moments at their valid pre-call state (r4
        review: a negative dt silently corrupted the covariance)."""
        G = 2
        params = simm.init_params(G)
        carry, aux = ss.streaming_init(params)
        rv = 1e-4 + params.obs_stddev**2
        carry = ss.streaming_update(carry, aux, 2.0, jnp.ones(G), rv)
        good_mean = np.asarray(carry.mean)
        bad = ss.streaming_update(carry, aux, 1.0, jnp.ones(G), rv)
        assert not np.isfinite(float(bad.ll))
        assert np.array_equal(np.asarray(bad.mean), good_mean)
        assert float(bad.t_last) == 2.0

    def test_streaming_forecast_and_masked_update(self):
        G = 3
        params = simm.init_params(G)
        carry, aux = ss.streaming_init(params)
        rv = 1e-4 + params.obs_stddev**2
        y0 = jnp.asarray([1.0, jnp.nan, 0.5])
        carry = ss.streaming_update(
            carry, aux, 1.0, y0, rv, obs_mask=jnp.asarray([1.0, 0.0, 1.0])
        )
        assert bool(jnp.isfinite(carry.ll))
        fm, fv, xm, xv = ss.streaming_predict(carry, aux, params, 3.0)
        assert np.isfinite(float(fm)) and float(fv) > 0
        assert xm.shape == (G,) and float(xv.min()) > 0


class TestEKFNonlinear:
    """Extended Kalman engine for the nonlinear-response family (r4):
    approximate marginal likelihood with the force integrated out —
    exact when the response is linear."""

    def test_marginal_bias_vs_qmc_oracle(self):
        """Pin the EKF marginal's BIAS against a ground-truth marginal
        (VERDICT r4 #6): scrambled-Sobol QMC over the FULL whitened
        force path on a fine grid — no eigen-truncation — with the gene
        ODE integrated by RK4 per node. Measured r5 (T=6 obs, G=2,
        l=1.6, y ~ prior predictive, 4 x 8192 nodes):

            identity  gap +0.0006 nats  (QMC noise floor — sanity)
            sigmoid   gap -0.079
            softplus  gap -0.279
            exp       gap -0.483

        The EKF biases the marginal LOW, monotonically in the response's
        convexity (classic linearization bias). The assertions bound
        each gap at ~2x its measured value so a regression in either
        direction (engine or oracle) trips; the docs note in
        ``nlfm_mll_ekf`` quotes these numbers as the route's trust
        region. Two scrambles at 4096 nodes keep the oracle's own noise
        well under the loosest bound (exp QMC spread ~0.2 nats)."""
        from scipy.linalg import expm as sexpm
        from scipy.special import logsumexp
        from scipy.stats import norm, qmc

        G = 2
        t_max = 5.0
        fine = 61
        tg = np.linspace(0.0, t_max, fine)
        obs_idx = np.arange(10, fine, 10)
        t_obs = tg[obs_idx]
        params = simm.init_params(G)._replace(lengthscale=jnp.asarray(1.6))
        order = 8
        jitter = 1e-4
        r_var = jitter + float(params.obs_stddev) ** 2

        f_c, h_c, p_diag, rate = ss._force_system(order, "rbf")
        lam = rate / float(params.lengthscale)
        f_mat = np.asarray(f_c) * lam
        p_ff = np.diag(p_diag)
        h_cn = np.asarray(h_c)
        taus = np.abs(tg[:, None] - tg[None, :])
        uniq, inv = np.unique(taus, return_inverse=True)
        kv = np.array(
            [float(h_cn @ sexpm(f_mat * u) @ p_ff @ h_cn) for u in uniq]
        )
        k_grid = kv[inv].reshape(fine, fine)
        w_k, v_k = np.linalg.eigh(k_grid)
        chol_like = v_k @ np.diag(np.sqrt(np.clip(w_k, 0.0, None)))

        basal = np.asarray(params.basal)
        sens = np.asarray(params.sensitivity)
        decay = np.asarray(params.decay)
        responses = {
            "identity": (lambda f: f, 0.01),
            "sigmoid": (lambda f: 1.0 / (1.0 + np.exp(-f)), 0.2),
            "softplus": (lambda f: np.logaddexp(0.0, f), 0.6),
            "exp": (np.exp, 1.0),
        }

        def integrate_x(fgrid, g):
            dt = tg[1] - tg[0]

            def drift(x, fval):
                return basal + sens * g(fval) - decay * x

            x = np.broadcast_to(
                basal / decay, fgrid.shape[:-1] + (G,)
            ).astype(float).copy()
            out = np.empty(fgrid.shape[:-1] + (len(obs_idx), G))
            k_out = 0
            for i in range(fine - 1):
                f0, f1 = fgrid[..., i], fgrid[..., i + 1]
                fh = 0.5 * (f0 + f1)
                k1 = drift(x, f0[..., None])
                k2 = drift(x + 0.5 * dt * k1, fh[..., None])
                k3 = drift(x + 0.5 * dt * k2, fh[..., None])
                k4 = drift(x + dt * k3, f1[..., None])
                x = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
                if (i + 1) in obs_idx:
                    out[..., k_out, :] = x
                    k_out += 1
            return out

        rng = np.random.default_rng(7)
        gaps = {}
        for resp, (g, tol) in responses.items():
            f_draw = chol_like @ rng.standard_normal(fine)
            x_draw = integrate_x(f_draw[None], g)[0]
            y = x_draw + np.sqrt(r_var) * rng.standard_normal(x_draw.shape)
            logps = []
            for s in range(2):
                sob = qmc.Sobol(fine, scramble=True, seed=100 + s)
                xi = norm.ppf(np.clip(sob.random(4096), 1e-12, 1 - 1e-12))
                x_s = integrate_x(xi @ chol_like.T, g)
                ll = (
                    -0.5 * np.sum((y[None] - x_s) ** 2, axis=(1, 2)) / r_var
                    - 0.5 * y.size * np.log(2 * np.pi * r_var)
                )
                logps.append(logsumexp(ll) - np.log(ll.shape[0]))
            oracle = float(np.mean(logps))
            y_flat = jnp.asarray(y.T.reshape(-1))
            mll_ekf = float(
                ss.nlfm_mll_ekf(
                    params, jnp.asarray(t_obs), y_flat, response=resp,
                    jitter=jitter, order=order, substeps=6,
                )
            )
            gaps[resp] = mll_ekf - oracle
            assert abs(gaps[resp]) < tol, (resp, gaps[resp], oracle, mll_ekf)
        # The linear case sits at the noise floor; nonlinear bias grows
        # with convexity.
        assert abs(gaps["identity"]) < 0.02
        assert abs(gaps["identity"]) < abs(gaps["softplus"])
        assert abs(gaps["sigmoid"]) < abs(gaps["exp"])

    def test_identity_matches_linear_engine_by_substeps(self):
        G, T = 3, 9
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(
            np.random.default_rng(5).normal(size=(G * T,))
        ) + 1.0
        params = simm.init_params(G)._replace(
            decay=jnp.asarray([0.4, 0.9, 0.6]),
            sensitivity=jnp.asarray([1.0, 0.8, 1.2]),
        )
        v_lin = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=10,
                                    parallel=False))
        errs = [
            abs(v_lin - float(ss.nlfm_mll_ekf(
                params, t, y, response="identity", jitter=1e-4,
                order=10, substeps=sub,
            )))
            for sub in (4, 8)
        ]
        # RK4-vs-expm integration error, vanishing in substeps.
        assert errs[0] < 5e-4 and errs[1] < 5e-6
        assert errs[1] < errs[0]

    def test_identity_predict_matches_linear_smoother(self):
        G, T = 3, 9
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(
            np.random.default_rng(5).normal(size=(G * T,))
        ) + 1.0
        params = simm.init_params(G)._replace(
            decay=jnp.asarray([0.4, 0.9, 0.6]),
            sensitivity=jnp.asarray([1.0, 0.8, 1.2]),
        )
        tt = jnp.linspace(0.0, 13.0, 20)
        lin = ss.lfm_predict_ss(params, t, y, tt, noise_var=1e-3,
                                parallel=False)
        ekf = ss.nlfm_predict_ekf(params, t, y, tt, response="identity",
                                  noise_var=1e-3, substeps=16)
        assert np.abs(np.asarray(lin[0] - ekf[0])).max() < 1e-4  # f mean
        assert np.abs(np.asarray(lin[1] - ekf[1])).max() < 1e-5  # f var
        assert np.abs(np.asarray(lin[2] - ekf[2])).max() < 1e-4  # x mean

    def test_exp_response_kinetics_recovery(self):
        """Train kinetics through the EKF marginal on exp-response
        quadrature data — the dense10k nlfm route's math at smoke scale.
        (Force reconstruction is EKF-limited for strongly nonlinear g;
        kinetics estimation is the engine's job.)"""
        import optax

        from dis_project_tpu.data import synthetic
        from dis_project_tpu.data.dataset import train_arrays

        scfg = synthetic.SyntheticConfig(
            num_genes=5, num_timepoints=30, num_replicates=1,
            noise_std=0.05,
        )
        data = synthetic.generate_ode_nonlinear(
            jax.random.PRNGKey(2), scfg, response="exp"
        )
        _, y, _ = train_arrays(data)
        t = jnp.asarray(data.timepoints)
        raw0 = simm.unconstrain(simm.init_params(5))
        opt = optax.adam(0.02)

        obj = lambda r: -ss.nlfm_mll_ekf(  # noqa: E731
            simm.constrain(r), t, y, response="exp", jitter=1e-4,
            substeps=4,
        )

        @jax.jit
        def fit(raw):
            st = opt.init(raw)

            def step(c, _):
                raw, st = c
                _, g = jax.value_and_grad(obj)(raw)
                u, st = opt.update(g, st)
                return (optax.apply_updates(raw, u), st), None

            (raw, _), _ = jax.lax.scan(step, (raw, st), None, length=300)
            return raw

        p = simm.constrain(fit(raw0))
        for k in ("decay", "sensitivity"):
            corr = np.corrcoef(
                np.asarray(getattr(p, k)), np.asarray(data.params_true[k])
            )[0, 1]
            assert corr > 0.95, (k, corr)
        # Smoothed posterior: gene means track the data, variances >= 0.
        fm, fv, xm, xv = ss.nlfm_predict_ekf(
            p, t, y, t, response="exp", noise_var=1e-3, substeps=4
        )
        gene_corr = np.corrcoef(
            np.asarray(xm).T.ravel(),
            np.asarray(data.gene_expressions[0]).ravel(),
        )[0, 1]
        assert gene_corr > 0.99
        assert float(fv.min()) >= 0.0 and float(xv.min()) >= 0.0

    def test_all_responses_finite_value_and_grad(self):
        G, T = 2, 7
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(1).normal(size=(G * T,)))
        raw = simm.unconstrain(simm.init_params(G))
        # substeps=4 at dt=2: h * rho(F_f) ~ 1.6, inside RK4 stability
        # (substeps=2 is measurably OUTSIDE it here and NaNs — the
        # stability rule in nlfm_mll_ekf's docstring).
        for resp in ("identity", "exp", "softplus", "sigmoid"):
            v, g = jax.value_and_grad(
                lambda r: ss.nlfm_mll_ekf(
                    simm.constrain(r), t, y, response=resp, jitter=1e-4,
                    substeps=4, order=8,
                )
            )(raw)
            assert np.isfinite(float(v)), resp
            assert all(
                np.isfinite(np.asarray(le)).all()
                for le in jax.tree_util.tree_leaves(g)
            ), resp


class TestParallelSmoother:
    """The smoothing semigroup (VERDICT r3 #4): the RTS backward pass as
    a reverse ``associative_scan`` and its temporally-sharded form. Both
    are re-bracketings of the same per-step affine maps, so they must
    match the sequential smoother to roundoff (the composite amplifies
    near-deterministic-direction roundoff slightly; tolerances reflect
    the measured ~1e-8 worst case, far below the brute-force-oracle
    tolerance pinned in ``test_smoother_matches_brute_force_joint``)."""

    @pytest.fixture(scope="class")
    def mesh(self):
        from jax.sharding import Mesh

        return Mesh(np.asarray(jax.devices()).reshape(8), ("t",))

    @pytest.fixture(scope="class")
    def filtered(self):
        params = simm.init_params(3)
        f_aug, p_inf, p0, _ = ss.build_lfm_ssm(
            params.decay, params.sensitivity, params.lengthscale, order=8
        )
        T = 24
        t = jnp.linspace(0.0, 12.0, T)
        h = ss.gene_observation_matrix(8, 3, 1, t.dtype)
        ys = jnp.asarray(
            np.random.default_rng(11).normal(size=(T, 3)) * 0.3
        )
        rv = jnp.full((3,), 1e-2)
        dts = jnp.diff(t, prepend=jnp.zeros((1,), t.dtype))
        a_steps, q_steps = ss.discretize(f_aug, p_inf, dts)
        a_sh, q_sh = ss.discretize(f_aug, p_inf, t[1] - t[0])
        ms, ps, _ = ss.kalman_filter(a_steps, q_steps, h, rv, ys, p0)
        ms_u, ps_u, _ = ss.kalman_filter(a_sh, q_sh, h, rv, ys, p0)
        return (a_steps, q_steps, ms, ps), (a_sh, q_sh, ms_u, ps_u)

    def test_parallel_matches_sequential(self, filtered):
        for a, q, ms, ps in filtered:
            ms1, ps1 = ss.rts_smoother(a, q, ms, ps)
            ms2, ps2 = ss.parallel_rts_smoother(a, q, ms, ps)
            assert np.abs(np.asarray(ms1 - ms2)).max() < 1e-7
            assert np.abs(np.asarray(ps1 - ps2)).max() < 1e-7

    def test_sharded_matches_sequential(self, filtered, mesh):
        for a, q, ms, ps in filtered:
            ms1, ps1 = ss.rts_smoother(a, q, ms, ps)
            ms3, ps3 = ss.sharded_rts_smoother(a, q, ms, ps, mesh, "t")
            assert np.abs(np.asarray(ms1 - ms3)).max() < 1e-7
            assert np.abs(np.asarray(ps1 - ps3)).max() < 1e-7

    def test_sharded_indivisible_fails_loudly(self, filtered, mesh):
        (a, q, ms, ps), _ = filtered
        with pytest.raises(ValueError, match="divide"):
            ss.sharded_rts_smoother(a[:23], q[:23], ms[:23], ps[:23],
                                    mesh, "t")

    def test_predict_parallel_and_sharded_match(self, p53_shaped, mesh):
        """Entry-point parity: `lfm_predict_ss` under the log-depth and
        the temporally-sharded schedules returns the sequential answer
        (union grid of 107 steps, padded to 112 over 8 devices)."""
        t, X, y, var, params, model = p53_shaped
        tt = jnp.linspace(0.0, 13.0, 100)
        base = ss.lfm_predict_ss(params, t, y, tt, noise_var=1e-3,
                                 parallel=False)
        par = ss.lfm_predict_ss(params, t, y, tt, noise_var=1e-3,
                                parallel=True)
        shd = ss.lfm_predict_ss(params, t, y, tt, noise_var=1e-3,
                                shard=(mesh, "t"))
        for got in (par, shd):
            for b, g in zip(base, got):
                assert np.abs(np.asarray(b - g)).max() < 1e-7

    def test_family_predicts_accept_shard(self, mesh):
        """The multi-force and second-order smoothed posteriors ride the
        same sharded driver."""
        from dis_project_tpu.models import multisimm, simm2

        T = 9
        t = jnp.linspace(0.0, 12.0, T)
        tt = jnp.linspace(0.0, 13.0, 15)
        rng = np.random.default_rng(13)

        mp = multisimm.init_params(2, 2)
        y = jnp.asarray(rng.normal(size=(2 * T,)))
        base = ss.multisimm_predict_ss(mp, t, y, tt, noise_var=1e-3,
                                       parallel=False)
        shd = ss.multisimm_predict_ss(mp, t, y, tt, noise_var=1e-3,
                                      shard=(mesh, "t"))
        for b, g in zip(base, shd):
            assert np.abs(np.asarray(b - g)).max() < 1e-7

        p2 = simm2.init_params(2)
        y2 = jnp.asarray(rng.normal(size=(2 * T,)))
        base = ss.lfm2_predict_ss(p2, t, y2, tt, noise_var=1e-3,
                                  parallel=False)
        shd = ss.lfm2_predict_ss(p2, t, y2, tt, noise_var=1e-3,
                                 shard=(mesh, "t"))
        for b, g in zip(base, shd):
            assert np.abs(np.asarray(b - g)).max() < 1e-7


class TestPredict:
    def test_latent_mean_matches_dense(self, p53_shaped):
        """The k_xf cross-covariances are consistent with k_xx, so the
        smoothed force mean must match ``latent_predict``'s to the SDE
        approximation error."""
        t, X, y, var, params, model = p53_shaped
        tt = jnp.linspace(0.0, 13.0, 100)
        test_rows = jnp.stack(
            [tt, -jnp.ones_like(tt), jnp.zeros_like(tt)], axis=1
        )
        post = model.latent_predict(params, test_rows, X, y, var)
        nv = var.reshape(5, t.shape[0]).T + 1e-4
        f_mean, f_var, x_mean, x_var = ss.lfm_predict_ss(
            params, t, y, tt, noise_var=nv
        )
        em = np.asarray(post.mean)
        assert np.corrcoef(em, np.asarray(f_mean))[0, 1] > 0.9999
        assert np.abs(em - np.asarray(f_mean)).max() < 2e-3
        # Variance: the self-consistent model's — same scale as the dense
        # path's quirky-prior variance, strictly positive.
        assert float(f_var.min()) > 0.0
        ev = np.asarray(post.variance())
        assert float(f_var.max()) < 3.0 * ev.max() + 1e-6

    def test_smoother_matches_brute_force_joint(self):
        """Filter+RTS on the union grid vs the EXACT posterior of the
        same discrete SSM, computed by materialising the full joint
        Gaussian over all grid states and conditioning densely.

        Regression for the fixed-ridge bug: the balanced realization's
        Hankel spectrum reaches ~1e-8 rel by order 14, and the old
        additive 1e-9 ridge in the RTS gain solve perturbed posterior
        variances by eps/lambda_min — 2e-2 absolute at order 14, GROWING
        with order. The eigendecomposition pseudo-solve must track the
        brute force to f64 roundoff at every order."""
        decay = jnp.asarray([0.4, 1.2])
        sens = jnp.asarray([1.0, 0.9])
        ell = jnp.asarray(2.0)
        G, T = 2, 9
        t_train = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(np.random.default_rng(3).normal(size=(G * T,)))
        noise = 1e-3
        tt = jnp.linspace(0.0, 13.0, 25)
        params = simm.init_params(G)._replace(
            decay=decay, sensitivity=sens, lengthscale=ell,
            basal=jnp.zeros(G),
        )
        for order in (10, 14):
            f_aug, p_inf, p0, hf = ss.build_lfm_ssm(
                decay, sens, ell, order=order
            )
            m = p0.shape[0]
            f_mean, f_var, _, _ = ss.lfm_predict_ss(
                params, t_train, y, tt, noise_var=noise, order=order
            )

            t_all = jnp.concatenate([t_train, tt])
            idx = jnp.argsort(t_all, stable=True)
            t_sorted = np.asarray(t_all[idx])
            is_train = np.asarray(
                jnp.concatenate(
                    [jnp.ones_like(t_train), jnp.zeros_like(tt)]
                )[idx]
            )
            n_all = t_sorted.shape[0]
            dts = np.diff(t_sorted, prepend=0.0)
            A = [
                np.asarray(jax.scipy.linalg.expm(f_aug * float(dt)))
                for dt in dts
            ]
            Pinf = np.asarray(p_inf)
            Q = [Pinf - a @ Pinf @ a.T for a in A]
            P = []
            prev = np.asarray(p0)
            for i in range(n_all):
                prev = A[i] @ prev @ A[i].T + Q[i]
                prev = 0.5 * (prev + prev.T)
                P.append(prev)
            J = np.zeros((n_all * m, n_all * m))
            for i in range(n_all):
                J[i * m:(i + 1) * m, i * m:(i + 1) * m] = P[i]
                Phi = np.eye(m)
                for j in range(i + 1, n_all):
                    Phi = A[j] @ Phi
                    C = P[i] @ Phi.T
                    J[i * m:(i + 1) * m, j * m:(j + 1) * m] = C
                    J[j * m:(j + 1) * m, i * m:(i + 1) * m] = C.T

            H = np.asarray(
                ss.gene_observation_matrix(order, G, 1, t_train.dtype)
            )
            hfn = np.asarray(hf)
            train_pos = np.nonzero(is_train)[0]
            test_pos = np.nonzero(1 - is_train)[0]
            n_tr = len(train_pos)
            Obs = np.zeros((n_tr * G, n_all * m))
            for k, i in enumerate(train_pos):
                Obs[k * G:(k + 1) * G, i * m:(i + 1) * m] = H
            Fsel = np.zeros((len(test_pos), n_all * m))
            for k, i in enumerate(test_pos):
                Fsel[k, i * m:(i + 1) * m] = hfn

            S = Obs @ J @ Obs.T + noise * np.eye(n_tr * G)
            Kfy = Fsel @ J @ Obs.T
            yv = np.asarray(y).reshape(G, T).T.reshape(-1)
            bf_mean = Kfy @ np.linalg.solve(S, yv)
            bf_var = np.diag(
                Fsel @ J @ Fsel.T - Kfy @ np.linalg.solve(S, Kfy.T)
            )
            assert np.abs(np.asarray(f_mean) - bf_mean).max() < 1e-4, order
            assert np.abs(np.asarray(f_var) - bf_var).max() < 1e-6, order

    def test_gene_posterior_contracts_toward_data(self, p53_shaped):
        """Smoothed gene states at the train times move toward the
        observations relative to the prior mean. (Exact interpolation is
        impossible by construction: at the shared init kinetics all genes
        are driven by ONE latent force through identical ODEs, so their
        posterior trajectories coincide — a model property, not a bug.)"""
        t, X, y, var, params, model = p53_shaped
        f_mean, f_var, x_mean, x_var = ss.lfm_predict_ss(
            params, t, y, t, noise_var=1e-4
        )
        y_gm = np.asarray(y).reshape(5, t.shape[0]).T  # (T, G)
        prior_mean = np.asarray(params.basal / params.decay)[None, :]
        rms_post = np.sqrt(np.mean((np.asarray(x_mean) - y_gm) ** 2))
        rms_prior = np.sqrt(np.mean((prior_mean - y_gm) ** 2))
        assert rms_post < 0.8 * rms_prior
        assert np.isfinite(np.asarray(x_mean)).all()
        assert (np.asarray(x_var) >= 0.0).all()


class TestBridgePredict:
    """interp="bridge" (r5): exact bridge interpolation must reproduce
    the union-grid smoother — same posterior, no union grid. The union
    path is pinned against the brute-force joint-Gaussian oracle, so
    bridge==union is transitively oracle-level parity. Tolerances sit
    above the pseudo-solve's eigh noise floor (~1e-6 relative at
    near-zero variances), not at bitwise."""

    @staticmethod
    def _cmp(u, b, tol, reorder=None):
        for uu, bb in zip(u, b):
            uu, bb = np.asarray(uu), np.asarray(bb)
            if reorder is not None:
                bb = bb[..., reorder] if bb.ndim == uu.ndim == 1 else bb
            err = np.max(np.abs(uu - bb) / (np.abs(uu) + 1e-8))
            assert err < tol, err

    def test_matches_union_all_regions(self):
        """One grid covering every bracket regime: t=0, pre-first-node,
        interior off-grid, exact train hits, the terminal node, and
        extrapolation past it."""
        rng = np.random.default_rng(0)
        G, T = 3, 12
        t = jnp.linspace(0.5, 12.0, T)  # first node > 0
        y = jnp.asarray(rng.normal(size=(G * T,)))
        params = simm.init_params(G)
        tt = jnp.sort(jnp.concatenate([
            jnp.linspace(0.0, 13.0, 31),
            jnp.asarray([0.0, 0.25, t[0], 6.0, float(t[-1]), 12.5]),
        ]))
        for kern in ("rbf", "matern32"):
            u = ss.lfm_predict_ss(params, t, y, tt, noise_var=1e-3,
                                  parallel=False, force_kernel=kern)
            b = ss.lfm_predict_ss(params, t, y, tt, noise_var=1e-3,
                                  parallel=False, force_kernel=kern,
                                  interp="bridge")
            self._cmp(u, b, 1e-5)

    def test_obs_mask_and_per_point_noise(self):
        rng = np.random.default_rng(1)
        G, T = 3, 10
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(rng.normal(size=(G * T,)))
        params = simm.init_params(G)
        tt = jnp.linspace(0.0, 12.5, 29)
        om = jnp.asarray(rng.integers(0, 2, size=(G * T,)),
                         jnp.float64).at[:4].set(1.0)
        nv = jnp.asarray(rng.uniform(1e-3, 1e-2, size=(T, G)))
        u = ss.lfm_predict_ss(params, t, y, tt, noise_var=nv,
                              parallel=False, obs_mask=om)
        b = ss.lfm_predict_ss(params, t, y, tt, noise_var=nv,
                              parallel=False, obs_mask=om, interp="bridge")
        self._cmp(u, b, 1e-5)

    def test_multisimm_and_lfm2_families(self):
        rng = np.random.default_rng(2)
        G, T = 3, 9
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(rng.normal(size=(G * T,)))
        tt = jnp.linspace(0.0, 12.5, 21)
        mp = multisimm.init_params(G, 2)
        u = ss.multisimm_predict_ss(mp, t, y, tt, noise_var=1e-3,
                                    parallel=False)
        b = ss.multisimm_predict_ss(mp, t, y, tt, noise_var=1e-3,
                                    parallel=False, interp="bridge")
        self._cmp(u, b, 1e-5)
        p2 = simm2.init_params(G)
        u = ss.lfm2_predict_ss(p2, t, y, tt, noise_var=1e-3,
                               parallel=False)
        b = ss.lfm2_predict_ss(p2, t, y, tt, noise_var=1e-3,
                               parallel=False, interp="bridge")
        self._cmp(u, b, 1e-5)

    def test_jit_unique_dts_promise(self):
        """Under jit the bucketed discretize needs the TRAIN grid's
        distinct-dt promise; result must match the eager bridge to the
        cross-program eigh noise floor."""
        rng = np.random.default_rng(3)
        G, T = 2, 8
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(rng.normal(size=(G * T,)))
        params = simm.init_params(G)
        tt = jnp.linspace(0.0, 12.5, 17)
        ud = int(np.unique(np.diff(np.asarray(t), prepend=0.0)).size)
        f = jax.jit(functools.partial(
            ss.lfm_predict_ss, noise_var=1e-3, parallel=False,
            unique_dts=ud, interp="bridge",
        ))
        self._cmp(
            ss.lfm_predict_ss(params, t, y, tt, noise_var=1e-3,
                              parallel=False, interp="bridge"),
            f(params, t, y, tt), 1e-4,
        )

    def test_sharded_bridge(self):
        """shard=(mesh, axis) pads the train chain to the axis size with
        masked dt=0 pass-throughs; the bridge on top must agree."""
        rng = np.random.default_rng(4)
        G, T = 2, 10  # not a multiple of the 4-device axis
        t = jnp.linspace(0.0, 12.0, T)
        y = jnp.asarray(rng.normal(size=(G * T,)))
        params = simm.init_params(G)
        tt = jnp.linspace(0.0, 12.5, 13)
        mesh = Mesh(np.array(jax.devices()[:4]), ("t",))
        b = ss.lfm_predict_ss(params, t, y, tt, noise_var=1e-3,
                              parallel=False, interp="bridge")
        bs = ss.lfm_predict_ss(params, t, y, tt, noise_var=1e-3,
                               shard=(mesh, "t"), interp="bridge")
        self._cmp(b, bs, 1e-4)

    def test_unknown_interp_rejected(self):
        params = simm.init_params(2)
        t = jnp.linspace(0.0, 12.0, 5)
        y = jnp.zeros((10,))
        with pytest.raises(ValueError, match="interp"):
            ss.lfm_predict_ss(params, t, y, t, noise_var=1e-3,
                              interp="spline")


class TestF32:
    def test_f32_matches_f64(self, p53_shaped):
        """The balanced realization keeps even order 12 usable in f32
        (the companion form would overflow float32 conditioning)."""
        t, X, y, var, params, model = p53_shaped
        exact = float(model.mll_gridded(params, t, y))
        p32 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float32), params
        )
        t32 = jnp.asarray(np.asarray(t), jnp.float32)
        y32 = jnp.asarray(np.asarray(y), jnp.float32)
        for order in (10, 12):
            for parallel in (False, True):
                val = float(
                    ss.lfm_mll_ss(p32, t32, y32, jitter=1e-4, order=order,
                                  parallel=parallel)
                )
                assert abs(val - exact) < 5e-3 * max(1.0, abs(exact))


class TestTraining:
    def test_adam_descends_and_tracks_dense_trajectory(self, p53_shaped):
        """50 Adam steps on the SS objective: the loss descends and the
        endpoint matches the dense-objective endpoint closely (the two
        objectives differ by ~1e-4, far below the optimization scale)."""
        import optax

        t, X, y, var, params, model = p53_shaped
        raw0 = simm.unconstrain(params)
        opt = optax.adam(0.01)

        def fit(objective):
            @jax.jit
            def run(raw):
                state = opt.init(raw)

                def step(carry, _):
                    raw, state = carry
                    loss, g = jax.value_and_grad(objective)(raw)
                    upd, state = opt.update(g, state)
                    return (optax.apply_updates(raw, upd), state), loss

                (raw, _), hist = jax.lax.scan(
                    step, (raw, state), None, length=50
                )
                return raw, hist

            return run(raw0)

        raw_ss, hist_ss = fit(
            lambda r: -ss.lfm_mll_ss(
                simm.constrain(r), t, y, jitter=1e-4, order=10, parallel=False
            )
        )
        raw_dn, hist_dn = fit(
            lambda r: -model.mll_gridded(simm.constrain(r), t, y)
        )
        assert float(hist_ss[-1]) < float(hist_ss[0])
        assert abs(float(hist_ss[-1]) - float(hist_dn[-1])) < 1e-2
        p_ss = simm.constrain(raw_ss)
        p_dn = simm.constrain(raw_dn)
        for name in ("decay", "sensitivity", "lengthscale"):
            a = np.asarray(getattr(p_ss, name))
            b = np.asarray(getattr(p_dn, name))
            assert np.abs(a - b).max() < 1e-2, name


class TestMissingData:
    """Per-entry observation masking (``obs_mask``): dropouts and
    irregular per-gene sampling. The masking is an EXACT row deletion
    (zero-H-row reduction + the log(2*pi)/2 placeholder correction), so
    the masked state-space MLL must match the dense MLL evaluated on the
    observed ROWS ONLY to the same order-p approximation error as the
    unmasked comparison — and all-ones must be bit-identical to no mask."""

    @pytest.fixture(scope="class")
    def masked_problem(self):
        G, T = 4, 13
        rng = np.random.default_rng(7)
        params = simm.init_params(G)._replace(
            decay=jnp.asarray([0.4, 0.8, 1.2, 0.6]),
            sensitivity=jnp.asarray([1.0, 0.7, 1.3, 0.9]),
            lengthscale=jnp.asarray(1.6),
        )
        t = jnp.linspace(0.0, 12.0, T)
        mean = np.repeat(np.asarray(params.basal / params.decay), T)
        y = jnp.asarray(rng.normal(size=(G * T,)) * 0.5 + mean)
        om = jnp.asarray(rng.uniform(size=(G * T,)) > 0.35, y.dtype)
        return params, t, y, om

    def _dense_subset(self, params, t, y, om):
        """Oracle: the exact dense MLL on the observed rows only (the row
        path takes arbitrary row sets)."""
        G = params.decay.shape[0]
        T = t.shape[0]
        model = simm.ExactSIMM(num_genes=G, jitter=1e-4)
        times = jnp.tile(t, G)
        genes = jnp.repeat(jnp.arange(G, dtype=t.dtype), T)
        X = jnp.stack([times, genes, jnp.ones_like(times)], axis=-1)
        keep = np.asarray(om) > 0
        return float(model.mll(params, X[keep], y[keep]))

    def test_all_ones_mask_is_identity(self, masked_problem):
        params, t, y, _ = masked_problem
        ones = jnp.ones_like(y)
        for parallel in (False, True):
            a = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4,
                                    parallel=parallel))
            b = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4,
                                    parallel=parallel, obs_mask=ones))
            assert a == b, parallel

    def test_matches_dense_subset_oracle(self, masked_problem):
        params, t, y, om = masked_problem
        oracle = self._dense_subset(params, t, y, om)
        val = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=10,
                                  parallel=False, obs_mask=om))
        assert abs(val - oracle) < 3e-4, (val, oracle)
        # Tighter order tightens the match: the deletion itself is exact.
        val12 = float(ss.lfm_mll_ss(params, t, y, jitter=1e-4, order=12,
                                    parallel=False, obs_mask=om))
        assert abs(val12 - oracle) < abs(val - oracle)

    def test_parallel_equals_sequential(self, masked_problem):
        params, t, y, om = masked_problem
        raw = simm.unconstrain(params)

        def mll(r, parallel):
            return ss.lfm_mll_ss(simm.constrain(r), t, y, jitter=1e-4,
                                 parallel=parallel, obs_mask=om)

        v_s, g_s = jax.value_and_grad(lambda r: mll(r, False))(raw)
        v_p, g_p = jax.value_and_grad(lambda r: mll(r, True))(raw)
        assert abs(float(v_s) - float(v_p)) < 1e-10
        for name in raw._fields:
            a = np.asarray(getattr(g_s, name))
            b = np.asarray(getattr(g_p, name))
            assert np.abs(a - b).max() < 1e-9 * (np.abs(a).max() + 1.0)

    def test_nan_at_masked_entries(self, masked_problem):
        """Masked observations may be NaN (how real dropouts arrive):
        value and gradient are finite and identical to a zero-filled y."""
        params, t, y, om = masked_problem
        y_nan = jnp.where(om > 0, y, jnp.nan)
        raw = simm.unconstrain(params)

        def mll(r, yy):
            return ss.lfm_mll_ss(simm.constrain(r), t, yy, jitter=1e-4,
                                 parallel=False, obs_mask=om)

        v_nan, g_nan = jax.value_and_grad(mll)(raw, y_nan)
        v_zero, g_zero = jax.value_and_grad(mll)(raw, jnp.where(om > 0, y, 0.0))
        assert bool(jnp.isfinite(v_nan))
        assert float(v_nan) == float(v_zero)
        for name in raw._fields:
            a = np.asarray(getattr(g_nan, name))
            assert np.isfinite(a).all(), name
            assert (a == np.asarray(getattr(g_zero, name))).all(), name

    def test_nonuniform_grid_masked(self, masked_problem):
        params, _, y, om = masked_problem
        t_irr = jnp.asarray(
            np.sort(np.random.default_rng(2).uniform(0.3, 12.0, 13))
        )
        oracle = self._dense_subset(params, t_irr, y, om)
        val = float(ss.lfm_mll_ss(params, t_irr, y, jitter=1e-4, order=10,
                                  parallel=False, uniform=False,
                                  obs_mask=om))
        assert abs(val - oracle) < 3e-4, (val, oracle)

    def test_family_masks_accepted(self, masked_problem):
        """The R-force and second-order families take obs_mask through the
        same driver: all-ones == none bit-for-bit, masked value finite."""
        from dis_project_tpu.models import multisimm, simm2

        _, t, y, om = masked_problem
        G = 4
        mp = multisimm.init_params(G, 2)
        a = float(ss.multisimm_mll_ss(mp, t, y, jitter=1e-4, parallel=False))
        b = float(ss.multisimm_mll_ss(mp, t, y, jitter=1e-4, parallel=False,
                                      obs_mask=jnp.ones_like(y)))
        assert a == b
        assert bool(jnp.isfinite(jnp.asarray(
            ss.multisimm_mll_ss(mp, t, y, jitter=1e-4, parallel=False,
                                obs_mask=om)
        )))
        p2 = simm2.init_params(G)
        a2 = float(ss.lfm2_mll_ss(p2, t, y, jitter=1e-4, parallel=False))
        b2 = float(ss.lfm2_mll_ss(p2, t, y, jitter=1e-4, parallel=False,
                                  obs_mask=jnp.ones_like(y)))
        assert a2 == b2
        assert bool(jnp.isfinite(jnp.asarray(
            ss.lfm2_mll_ss(p2, t, y, jitter=1e-4, parallel=False,
                           obs_mask=om)
        )))

    def test_sharded_filter_masked(self, masked_problem):
        """obs_mask composes with the temporally-sharded schedule: value
        and gradient match the sequential masked filter exactly."""
        from jax.sharding import Mesh

        params, t, y, om = masked_problem
        mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("t",))
        raw = simm.unconstrain(params)

        def mll(r, shard):
            return ss.lfm_mll_ss(
                simm.constrain(r), t, y, jitter=1e-4,
                parallel=False if shard is None else None,
                shard=shard, obs_mask=om,
            )

        v_ref, g_ref = jax.value_and_grad(lambda r: mll(r, None))(raw)
        v_sh, g_sh = jax.value_and_grad(
            lambda r: mll(r, (mesh, "t"))
        )(raw)
        assert abs(float(v_ref) - float(v_sh)) < 1e-10 * max(
            1.0, abs(float(v_ref))
        )
        for name in raw._fields:
            a = np.asarray(getattr(g_ref, name))
            b = np.asarray(getattr(g_sh, name))
            assert np.abs(a - b).max() < 1e-10 * (np.abs(a).max() + 1.0)
