"""Trainer semantics: convergence, clamp behavior, bijector lifecycle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.data.dataset import P53Data, dataset_3d
from dis_project_tpu.models import simm
from dis_project_tpu.training import trainer as tr
from dis_project_tpu.ops import bijectors as bij


@pytest.fixture(scope="module")
def p53():
    data = P53Data(replicate=0, source="synthetic")
    X, y, var = dataset_3d(data)
    return data, X, y, var


def test_loss_decreases(p53):
    _, X, y, _ = p53
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    res = tr.fit(model, simm.init_params(5), X, y, tr.TrainConfig(num_iters=50))
    assert float(res.history[-1]) < float(res.history[0])
    assert np.all(np.isfinite(np.asarray(res.history)))


def test_clamp_applied_exactly(p53):
    _, X, y, _ = p53
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    res = tr.fit(
        model, simm.init_params(5), X, y, tr.TrainConfig(num_iters=30, fix_params=True)
    )
    assert float(res.params.sensitivity[3]) == 1.0
    assert float(res.params.decay[3]) == 0.8


def test_no_clamp_when_disabled(p53):
    _, X, y, _ = p53
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    res = tr.fit(
        model,
        simm.init_params(5),
        X,
        y,
        tr.TrainConfig(num_iters=30, fix_params=False),
    )
    assert float(res.params.sensitivity[3]) != 1.0
    assert float(res.params.decay[3]) != 0.8


def test_constraints_respected(p53):
    """All positivity/bound constraints hold after training."""
    _, X, y, _ = p53
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    res = tr.fit(model, simm.init_params(5), X, y, tr.TrainConfig(num_iters=40))
    p = res.params
    assert np.all(np.asarray(p.basal) > 0)
    assert np.all(np.asarray(p.sensitivity) > 0)
    assert np.all(np.asarray(p.decay) > 0)
    assert 0.5 < float(p.lengthscale) < 3.5
    assert float(p.obs_stddev) > 0


def test_param_tracking(p53):
    _, X, y, _ = p53
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    res = tr.fit(
        model,
        simm.init_params(5),
        X,
        y,
        tr.TrainConfig(num_iters=10, track_parameters=True),
    )
    assert res.param_trace is not None
    assert res.param_trace.sensitivity.shape == (10, 5)
    assert res.grad_norms.shape == (10,)


def test_gridded_fit_matches_row_fit(p53):
    """Training through the Kronecker/table fast path reproduces the
    row-based trajectory step for step."""
    data, X, y, _ = p53
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    p0 = simm.init_params(5)
    cfg = tr.TrainConfig(num_iters=30)
    rows = tr.fit(model, p0, X, y, cfg)
    grid = tr.fit(
        model, p0, X, y, cfg,
        gridded=(data.timepoints, data.num_replicates),
    )
    np.testing.assert_allclose(
        np.asarray(grid.history), np.asarray(rows.history), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(grid.params.decay), np.asarray(rows.params.decay),
        rtol=1e-9,
    )


def test_shared_kinetics_ablation(p53):
    """Tied B/S/D: one trainable value per kinetic parameter, every gene's
    row uses it, and training still improves the MLL."""
    _, X, y, _ = p53
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4, shared_kinetics=True)
    p0 = simm.init_params(5, shared_kinetics=True)
    assert p0.decay.shape == (1,)
    res = tr.fit(
        model, p0, X, y, tr.TrainConfig(num_iters=40, fix_params=False)
    )
    assert res.params.decay.shape == (1,)
    assert float(res.history[-1]) < float(res.history[0])
    # per-gene model with broadcast params gives the identical MLL
    import numpy as np

    full = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    tied = res.params._replace(
        basal=jnp.broadcast_to(res.params.basal, (5,)),
        sensitivity=jnp.broadcast_to(res.params.sensitivity, (5,)),
        decay=jnp.broadcast_to(res.params.decay, (5,)),
    )
    np.testing.assert_allclose(
        float(model.mll(res.params, X, y)),
        float(full.mll(tied, X, y)),
        rtol=1e-12,
    )


def test_lbfgs_path(p53):
    _, X, y, _ = p53
    model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
    res = tr.fit(
        model,
        simm.init_params(5),
        X,
        y,
        tr.TrainConfig(num_iters=20, optimizer="lbfgs", fix_params=False),
    )
    assert float(res.history[-1]) < float(res.history[0])


class TestFiniteGuard:
    """The NaN-robust training loop (VERDICT r3 item 2).

    The measured failure mode: the quirky ``2l`` kernel family is genuinely
    indefinite in reachable parameter regions, so one optimizer step can land
    on a non-PSD Sigma, NaN the Cholesky, and poison the Adam moments for
    every remaining step.  The guard backtracks to the last good state and
    retries with a halved step scale.
    """

    def _pocket_model(self, lo, hi):
        """ExactSIMM whose MLL is NaN when decay[0] falls in (lo, hi) —
        a deterministic stand-in for the measured indefinite-Sigma region
        (PARITY.md r3 item 2)."""
        import dataclasses

        from dis_project_tpu.models.simm import ExactSIMM

        @dataclasses.dataclass(frozen=True)
        class PocketSIMM(ExactSIMM):
            lo: float = 0.0
            hi: float = 0.0

            def mll(self, params, x, y):
                val = super().mll(params, x, y)
                bad = (params.decay[0] > self.lo) & (params.decay[0] < self.hi)
                # Non-finite loss AND gradient in the pocket (the real event
                # poisons both: the Cholesky of an indefinite Sigma NaNs the
                # whole backward pass).  Division keeps the clean branch's
                # gradient untouched — a where() with a NaN operand would
                # leak NaN through the untaken branch (0 * NaN).
                return val / jnp.where(bad, 0.0, 1.0)

        return PocketSIMM(num_genes=5, jitter=1e-4, lo=lo, hi=hi)

    def test_recovers_from_injected_indefinite_region(self, p53):
        _, X, y, _ = p53
        clean_model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        cfg = tr.TrainConfig(
            num_iters=120, fix_params=False, track_parameters=True
        )
        clean = tr.fit(clean_model, simm.init_params(5), X, y, cfg)
        assert clean.guard_count == 0

        # Pocket centered exactly on the clean trajectory's decay[0] at a
        # mid-run step, narrower than one step's travel, so the run lands
        # inside it and must backtrack-and-hop rather than stall.
        d_mid = float(clean.param_trace.decay[40, 0])
        width = 5e-4
        model = self._pocket_model(d_mid - width, d_mid + width)
        guarded = tr.fit(model, simm.init_params(5), X, y, cfg)
        assert guarded.guard_count >= 1
        # recorded history stays finite (the event is surfaced via
        # guard_flags, not a NaN prefix) and the fit re-converges
        assert np.all(np.isfinite(np.asarray(guarded.history)))
        assert abs(
            float(guarded.history[-1]) - float(clean.history[-1])
        ) < 0.5

        # without the guard the same event poisons every remaining step
        unguarded = tr.fit(
            model, simm.init_params(5), X, y,
            tr.TrainConfig(num_iters=120, fix_params=False, finite_guard=False),
        )
        assert not np.isfinite(float(unguarded.history[-1]))

    def test_equivalent_on_clean_run(self, p53):
        """On a trajectory with no events the guard applies the identical
        update rule; residual differences are compiler-fusion reordering at
        roundoff (the lax.cond changes XLA's fusion choices), which chaotic
        trajectories amplify slowly — so the early history must agree
        tightly and the whole run loosely."""
        _, X, y, _ = p53
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        cfg_on = tr.TrainConfig(num_iters=40)
        cfg_off = tr.TrainConfig(num_iters=40, finite_guard=False)
        on = tr.fit(model, simm.init_params(5), X, y, cfg_on)
        off = tr.fit(model, simm.init_params(5), X, y, cfg_off)
        assert on.guard_count == 0
        np.testing.assert_allclose(
            np.asarray(on.history[:10]), np.asarray(off.history[:10]),
            rtol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(on.history), np.asarray(off.history), rtol=1e-3
        )
        for a, b in zip(jax.tree.leaves(on.params), jax.tree.leaves(off.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3)

    def test_generic_loop_guard(self):
        """The shared family loop recovers from a NaN pocket too (all five
        model families route through generic.fit_loop)."""
        from dis_project_tpu.training import generic

        target = 5.0

        def loss_fn(x):
            val = (x - target) ** 2
            bad = (x > 2.3) & (x < 2.6)
            return jnp.where(bad, jnp.nan, val).sum()

        res = generic.fit_loop(
            loss_fn,
            jnp.zeros(()),
            num_iters=60,
            learning_rate=0.5,
            optimizer="adam",
        )
        assert res.guard_count >= 1
        assert np.all(np.isfinite(np.asarray(res.history)))
        assert abs(float(res.raw) - target) < 0.35

    def test_nonfinite_start_freezes_instead_of_nan_wandering(self):
        """If the INITIAL point is non-finite (the one case where the
        backtrack target itself is bad), the guard must freeze there —
        raw and optimizer state unchanged, count incrementing — instead
        of applying NaN updates and wandering to all-NaN (r4 review)."""
        from dis_project_tpu.training import generic

        def loss_fn(x):
            return jnp.where(x < 100.0, jnp.nan, (x - 100.0) ** 2).sum()

        x0 = jnp.zeros(())  # loss(x0) = NaN, and so is every backtrack
        res = generic.fit_loop(
            loss_fn, x0, num_iters=10, learning_rate=0.5,
            optimizer="adam",
        )
        assert res.guard_count == 10
        assert float(res.raw) == 0.0  # frozen, not NaN
        # The history honestly records the non-finite losses.
        assert not np.isfinite(np.asarray(res.history)).any()

    def test_guard_carry_survives_segmentation(self):
        """Segmented fit_loop (via init_guard threading) reproduces the
        unsegmented guarded trajectory exactly — the escalation ladder
        and backtrack point cross the boundary (r4 review: previously
        the carry re-anchored every segment)."""
        from dis_project_tpu.training import generic

        target = 5.0

        def loss_fn(x):
            val = (x - target) ** 2
            bad = (x > 2.3) & (x < 2.6)
            return jnp.where(bad, jnp.nan, val).sum()

        full = generic.fit_loop(
            loss_fn, jnp.zeros(()), num_iters=60, learning_rate=0.5,
            optimizer="adam",
        )
        # Segment at every 7 steps — boundaries land inside the NaN
        # pocket's recovery phase.
        raw, opt_state, guard = jnp.zeros(()), None, None
        hists = []
        import optax

        opt = optax.adam(0.5)
        raw_c, opt_state = raw, opt.init(raw)
        for seg in (7, 7, 7, 7, 7, 7, 7, 11):
            r = generic.fit_loop(
                loss_fn, raw_c, num_iters=seg, learning_rate=0.5,
                optimizer=opt, init_state=(raw_c, opt_state),
                init_guard=guard,
            )
            raw_c, opt_state, guard = r.raw, r.opt_state, r.guard_state
            hists.append(np.asarray(r.history))
        seg_hist = np.concatenate(hists)
        full_hist = np.asarray(full.history)
        mask = np.isfinite(full_hist)
        assert (np.isfinite(seg_hist) == mask).all()
        np.testing.assert_allclose(
            seg_hist[mask], full_hist[mask], rtol=1e-12
        )
        assert abs(float(raw_c) - float(full.raw)) < 1e-12


def test_bijector_roundtrip():
    p = simm.init_params(5)
    rt = simm.constrain(simm.unconstrain(p))
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(rt)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_softplus_matches_tfp_numerics():
    sp = bij.Softplus()
    x = jnp.asarray([-20.0, -1.0, 0.0, 1.0, 30.0])
    np.testing.assert_allclose(
        np.asarray(sp.forward(x)), np.log1p(np.exp(np.asarray(x))), rtol=1e-12
    )
    y = jnp.asarray([1e-8, 0.05, 0.4, 1.0, 25.0])
    np.testing.assert_allclose(
        np.asarray(sp.forward(sp.inverse(y))), np.asarray(y), rtol=1e-9
    )


def test_sigmoid_bounded():
    sb = bij.SigmoidBounded(0.5, 3.5)
    y = jnp.asarray([0.6, 2.5, 3.4])
    np.testing.assert_allclose(
        np.asarray(sb.forward(sb.inverse(y))), np.asarray(y), rtol=1e-12
    )
    assert float(sb.forward(jnp.asarray(-50.0))) >= 0.5
    assert float(sb.forward(jnp.asarray(50.0))) <= 3.5
