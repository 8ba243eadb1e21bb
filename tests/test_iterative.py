"""Iterative (CG/Lanczos) inference engine: solver exactness, logdet
estimator quality, MLL agreement with the Cholesky path, and unbiasedness
of the stochastic gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_project_tpu.ops import iterative as it
from dis_project_tpu.ops import mll as mll_ops

RNG = np.random.default_rng(11)


def _spd(n, noise=1.0, rank=None):
    """noise*I + low-rank PSD — the LFM Sigma structure."""
    rank = rank or n
    W = RNG.standard_normal((n, rank))
    return jnp.asarray(W @ W.T / rank + noise * np.eye(n))


class TestCG:
    def test_solves_match_dense(self):
        A = _spd(200)
        B = jnp.asarray(RNG.standard_normal((200, 5)))
        X, iters = it.batched_cg(lambda V: A @ V, B)
        np.testing.assert_allclose(
            np.asarray(X), np.asarray(jnp.linalg.solve(A, B)), atol=1e-7
        )
        assert int(iters) < 200

    def test_low_rank_fast_convergence(self):
        """Sigma = I + rank-r PSD must converge in ~r+1 iterations — the
        property that makes CG the large-N LFM engine."""
        A = _spd(500, noise=1.0, rank=10)
        b = jnp.asarray(RNG.standard_normal((500, 1)))
        _, iters = it.batched_cg(lambda V: A @ V, b, tol=1e-8)
        assert int(iters) <= 15


class TestSLQ:
    def test_logdet_estimate(self):
        A = _spd(300, noise=0.5, rank=40)
        ref = float(jnp.linalg.slogdet(A)[1])
        est, _ = it.slq_logdet(
            lambda V: A @ V, 300, jax.random.PRNGKey(0),
            num_probes=32, m=48,
        )
        assert float(est) == pytest.approx(ref, rel=0.05)

    def test_lanczos_eigen_extremes(self):
        """T_m's extreme eigenvalues approximate A's (Lanczos sanity)."""
        A = _spd(150)
        v = jnp.asarray(RNG.standard_normal(150))
        a, b = it.lanczos(lambda V: A @ V, v, 40)
        T = np.diag(np.asarray(a)) + np.diag(np.asarray(b), 1) + np.diag(
            np.asarray(b), -1
        )
        ew_T = np.linalg.eigvalsh(T)
        ew_A = np.linalg.eigvalsh(np.asarray(A))
        assert ew_T.max() == pytest.approx(ew_A.max(), rel=1e-6)
        assert ew_T.min() == pytest.approx(ew_A.min(), rel=0.2)


class TestMLL:
    def test_value_close_to_cholesky(self):
        n = 250
        A = _spd(n, noise=1.0, rank=30)
        y = jnp.asarray(RNG.standard_normal(n))
        exact = float(mll_ops.mvn_logpdf(y, jnp.zeros(n), A))
        est = float(
            it.mvn_logpdf_cg(y, A, jax.random.PRNGKey(1), 32, 48)
        )
        # quadratic term is CG-exact; only the logdet is stochastic
        assert est == pytest.approx(exact, rel=0.02, abs=2.0)

    def test_gradient_unbiased(self):
        """Average the stochastic d_sigma over keys -> exact gradient."""
        n = 60
        A = _spd(n, noise=1.0, rank=10)
        y = jnp.asarray(RNG.standard_normal(n))

        exact_grad = jax.grad(
            lambda s: mll_ops.mvn_logpdf(y, jnp.zeros(n), s)
        )(A)

        def stoch_grad(key):
            return jax.grad(
                lambda s: it.mvn_logpdf_cg(y, s, key, 16, 32)
            )(A)

        grads = jax.vmap(stoch_grad)(
            jax.random.split(jax.random.PRNGKey(2), 48)
        )
        mean_grad = jnp.mean(grads, axis=0)
        # cosine similarity of the averaged estimator with the truth
        a = np.asarray(mean_grad).ravel()
        b = np.asarray(exact_grad).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.99

    def test_model_level_mll_iterative(self):
        """ExactSIMM.mll_iterative tracks ExactSIMM.mll on the p53 problem
        and trains (unbiased gradients drive the loss down)."""
        import optax

        from dis_project_tpu.data.dataset import P53Data, train_arrays
        from dis_project_tpu.models import simm

        data = P53Data(replicate=0, source="synthetic")
        X, y, _ = train_arrays(data)
        model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
        p = simm.init_params(5)
        exact = float(model.mll(p, X, y))
        est = float(
            model.mll_iterative(p, X, y, jax.random.PRNGKey(0), 32, 32)
        )
        assert est == pytest.approx(exact, rel=0.05, abs=1.0)

        raw = simm.unconstrain(p)
        opt = optax.adam(0.01)
        state = opt.init(raw)

        @jax.jit
        def step(raw, state, key):
            l, g = jax.value_and_grad(
                lambda r: -model.mll_iterative(
                    simm.constrain(r), X, y, key, 8, 24
                )
            )(raw)
            upd, state = opt.update(g, state)
            return optax.apply_updates(raw, upd), state, l

        keys = jax.random.split(jax.random.PRNGKey(1), 60)
        for k in keys:
            raw, state, l = step(raw, state, k)
        final_exact = float(-model.mll(simm.constrain(raw), X, y))
        assert final_exact < -exact  # improved over the init loss

    def test_d_y_exact(self):
        """The mean-gradient goes through CG-exact alpha — not stochastic."""
        n = 80
        A = _spd(n, noise=1.0, rank=10)
        y = jnp.asarray(RNG.standard_normal(n))
        g_exact = jax.grad(
            lambda yy: mll_ops.mvn_logpdf(yy, jnp.zeros(n), A)
        )(y)
        g_cg = jax.grad(
            lambda yy: it.mvn_logpdf_cg(yy, A, jax.random.PRNGKey(3), 8, 24)
        )(y)
        np.testing.assert_allclose(np.asarray(g_cg), np.asarray(g_exact),
                                   atol=1e-6)
