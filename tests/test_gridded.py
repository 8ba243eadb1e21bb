"""Table-based gridded Gram and the gridded MLL path: exactness vs the
generic row-metadata implementation, gradients, and replicate tiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.data.dataset import P53Data, train_arrays
from dis_project_tpu.models import simm
from dis_project_tpu.ops import gram as gram_ops
from dis_project_tpu.ops import lfm_kernels as lfk

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("G,T", [(2, 5), (5, 7), (7, 23)])
def test_fast_gram_matches_block_builder(G, T):
    t = jnp.linspace(0.0, 12.0, T)
    d = jnp.asarray(RNG.uniform(0.2, 1.0, G))
    s = jnp.asarray(RNG.uniform(0.5, 1.5, G))
    for ell in (0.7, 2.5, 3.4):
        ref = lfk.k_xx_block(t, t, d, s, jnp.asarray(ell))
        fast = gram_ops.gram_xx_blocked_fast(t, d, s, jnp.asarray(ell))
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=1e-12)


def test_fast_gram_gradients_match():
    G, T = 4, 9
    t = jnp.linspace(0.0, 12.0, T)
    d = jnp.asarray(RNG.uniform(0.2, 1.0, G))
    s = jnp.asarray(RNG.uniform(0.5, 1.5, G))

    def loss_fast(d, s, l):
        return jnp.sum(jnp.sin(gram_ops.gram_xx_blocked_fast(t, d, s, l)))

    def loss_ref(d, s, l):
        return jnp.sum(jnp.sin(lfk.k_xx_block(t, t, d, s, l)))

    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(d, s, jnp.asarray(2.0))
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(d, s, jnp.asarray(2.0))
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)


def test_hybrid_gram_forward_bitwise_and_param_grads():
    """``gram_xx_blocked_hybrid``: the table forward bit-for-bit, the
    row-algebra backward matching AD-through-the-table on every
    PARAMETER cotangent (the t cotangent is the row algebra's true
    kernel derivative by design — see the op's docstring)."""
    G, T = 5, 13
    t = jnp.linspace(0.0, 12.0, T)
    d = jnp.asarray(RNG.uniform(0.2, 1.0, G))
    s = jnp.asarray(RNG.uniform(0.5, 1.5, G))
    ell = jnp.asarray(2.5)
    kbar = jnp.asarray(RNG.standard_normal((G * T, G * T)))

    k_tab = gram_ops.gram_xx_blocked_fast(t, d, s, ell)
    k_hyb = gram_ops.gram_xx_blocked_hybrid(t, d, s, ell)
    assert bool(jnp.all(k_tab == k_hyb))

    def loss_tab(d, s, l):
        return jnp.sum(kbar * gram_ops.gram_xx_blocked_fast(t, d, s, l))

    def loss_hyb(d, s, l):
        return jnp.sum(kbar * gram_ops.gram_xx_blocked_hybrid(t, d, s, l))

    g_tab = jax.grad(loss_tab, argnums=(0, 1, 2))(d, s, ell)
    g_hyb = jax.grad(loss_hyb, argnums=(0, 1, 2))(d, s, ell)
    for a, b in zip(g_tab, g_hyb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)

    # The t cotangent equals the row build's (same vjp path).
    gt_hyb = jax.grad(
        lambda tt: jnp.sum(kbar * gram_ops.gram_xx_blocked_hybrid(tt, d, s, ell))
    )(t)
    gt_row = jax.grad(
        lambda tt: jnp.sum(kbar * lfk.k_xx_block(tt, tt, d, s, ell))
    )(t)
    np.testing.assert_allclose(np.asarray(gt_hyb), np.asarray(gt_row),
                               rtol=1e-10)


class TestGriddedMLL:
    def test_matches_row_mll_single_replicate(self):
        data = P53Data(replicate=0, source="synthetic")
        X, y, _ = train_arrays(data)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        p = simm.init_params(5)
        a = float(model.mll(p, X, y))
        b = float(model.mll_gridded(p, data.timepoints, y))
        assert b == pytest.approx(a, rel=1e-12)

    def test_matches_row_mll_all_replicates(self):
        data = P53Data(replicate=None, source="synthetic")
        X, y, _ = train_arrays(data)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        p = simm.init_params(5)
        a = float(model.mll(p, X, y))
        b = float(model.mll_gridded(p, data.timepoints, y, replicates=3))
        assert b == pytest.approx(a, rel=1e-12)

    def test_gradients_match_row_mll(self):
        data = P53Data(replicate=0, source="synthetic")
        X, y, _ = train_arrays(data)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        raw = simm.unconstrain(simm.init_params(5))
        g_row = jax.grad(lambda r: -model.mll(simm.constrain(r), X, y))(raw)
        g_grid = jax.grad(
            lambda r: -model.mll_gridded(simm.constrain(r), data.timepoints, y)
        )(raw)
        for a, b in zip(jax.tree.leaves(g_row), jax.tree.leaves(g_grid)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-12)

    def test_replicated_mll_matches_full(self):
        """The Kronecker-diagonalised R-replicate MLL equals the dense
        (RGT)^3 computation exactly — value and gradients."""
        data = P53Data(replicate=None, source="synthetic")
        X, y, _ = train_arrays(data)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        p = simm.init_params(5)
        a = float(model.mll(p, X, y))
        b = float(model.mll_replicated(p, data.timepoints, y, replicates=3))
        assert b == pytest.approx(a, rel=1e-12)

        raw = simm.unconstrain(p)
        g_full = jax.grad(lambda r: -model.mll(simm.constrain(r), X, y))(raw)
        g_rep = jax.grad(
            lambda r: -model.mll_replicated(
                simm.constrain(r), data.timepoints, y, replicates=3
            )
        )(raw)
        for u, v in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_rep)):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-9, atol=1e-12)

    def test_replicated_mll_single_replicate_degenerates(self):
        data = P53Data(replicate=0, source="synthetic")
        X, y, _ = train_arrays(data)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        p = simm.init_params(5)
        a = float(model.mll(p, X, y))
        b = float(model.mll_replicated(p, data.timepoints, y, replicates=1))
        assert b == pytest.approx(a, rel=1e-12)

    def test_shared_kinetics_gridded(self):
        data = P53Data(replicate=0, source="synthetic")
        X, y, _ = train_arrays(data)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4, shared_kinetics=True)
        p = simm.init_params(5, shared_kinetics=True)
        a = float(model.mll(p, X, y))
        b = float(model.mll_gridded(p, data.timepoints, y))
        assert b == pytest.approx(a, rel=1e-12)


class TestUniformGridGuard:
    """gram_xx_blocked_fast must reject concrete irregular grids (its delta
    table is indexed by a - b; VERDICT r1 hazard #5)."""

    def test_irregular_concrete_grid_raises(self):
        t_bad = jnp.asarray([0.0, 1.0, 2.5, 3.0])
        d = jnp.full(2, 0.5)
        s = jnp.ones(2)
        with pytest.raises(ValueError, match="UNIFORM"):
            gram_ops.gram_xx_blocked_fast(t_bad, d, s, jnp.asarray(2.5))

    def test_uniform_concrete_grid_ok(self):
        t = jnp.linspace(0.0, 12.0, 7)
        d = jnp.full(2, 0.5)
        s = jnp.ones(2)
        K = gram_ops.gram_xx_blocked_fast(t, d, s, jnp.asarray(2.5))
        assert K.shape == (14, 14)

    def test_f32_linspace_grid_ok(self):
        # An f32 linspace grid is uniform only to ~|t|*eps per diff (7e-7
        # at t_max=12).  The r2 hardening's fixed rtol=1e-6 falsely
        # rejected it — which broke the dense10k preset's own grid.  The
        # tolerance must scale with the dtype.
        t = jnp.asarray(np.linspace(0.0, 12.0, 200), jnp.float32)
        d = jnp.full(2, jnp.float32(0.5))
        s = jnp.ones(2, jnp.float32)
        K = gram_ops.gram_xx_blocked_fast(t, d, s, jnp.float32(2.5))
        assert K.shape == (400, 400)

    def test_trainer_fallback_uses_same_predicate_as_guard(self):
        # A NEAR-uniform grid (1e-7 wobble on a 2.0 spacing): the old
        # trainer pre-check (rtol=1e-6 on the spacing) accepted it while
        # the op's dtype-aware guard rejects it — training crashed at
        # trace time instead of taking the designed row-path fallback.
        # Both sides now share ops.gram.is_uniform_grid, so fit() must
        # fall back and complete.
        import optax

        from dis_project_tpu.models import simm
        from dis_project_tpu.training import trainer as tr

        t_bad = np.linspace(0.0, 12.0, 7)
        t_bad[3] += 1e-7
        assert not gram_ops.is_uniform_grid(jnp.asarray(t_bad))
        G, T = 2, 7
        X = jnp.asarray(
            np.stack(
                [np.tile(t_bad, G), np.repeat(np.arange(G), T), np.ones(G * T)],
                axis=1,
            )
        )
        y = jnp.asarray(RNG.standard_normal(G * T) * 0.1 + 1.0)
        model = simm.ExactSIMM(num_genes=G, jitter=1e-4)
        cfg = tr.TrainConfig(num_iters=3, fix_params=False)
        result = tr.fit(
            model,
            simm.init_params(G),
            X,
            y,
            cfg,
            gridded=(jnp.asarray(t_bad), 1),
        )
        assert np.all(np.isfinite(np.asarray(result.history)))

    def test_traced_timepoints_still_jit(self):
        # Inside jit the values are unavailable — the op must stay traceable
        # (callers like trainer.fit guard spacing themselves).
        t = jnp.linspace(0.0, 12.0, 7)
        d = jnp.full(2, 0.5)
        s = jnp.ones(2)
        K = jax.jit(
            lambda tt: gram_ops.gram_xx_blocked_fast(tt, d, s, jnp.asarray(2.5))
        )(t)
        assert bool(jnp.all(jnp.isfinite(K)))
