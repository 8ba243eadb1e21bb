"""Second-order model family: trainability, posterior recovery of a known
force, and parameter-transform round trips."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dis_project_tpu.models import simm2
from dis_project_tpu.ops import lfm_kernels2 as lfk2


def _sample_problem(key, G=3, T=10, noise=0.05):
    """Exact joint draw from the second-order prior with known params."""
    t = jnp.linspace(0.0, 10.0, T)
    alpha = jnp.asarray([0.4, 0.6, 0.3])[:G]
    omega = jnp.asarray([1.0, 0.8, 1.3])[:G]
    sens = jnp.asarray([1.0, 1.2, 0.9])[:G]
    basal = jnp.asarray([0.05, 0.08, 0.02])[:G]
    ell = jnp.asarray(2.0)

    K = lfk2.k_xx2_block(t, t, alpha, omega, sens, ell)
    n = G * T
    L = jnp.linalg.cholesky(K + 1e-8 * jnp.eye(n))
    mean = jnp.repeat(basal / (alpha**2 + omega**2), T)
    k1, k2 = jax.random.split(key)
    y = mean + L @ jax.random.normal(k1, (n,)) + noise * jax.random.normal(k2, (n,))

    rows = jnp.stack(
        [jnp.tile(t, G), jnp.repeat(jnp.arange(G, dtype=t.dtype), T), jnp.ones(n)],
        axis=-1,
    )
    true = simm2.SIMM2Params(
        basal=basal, sensitivity=sens, alpha=alpha, omega=omega,
        lengthscale=ell, obs_stddev=jnp.asarray(noise),
    )
    return rows, y, true


def test_bijector_round_trip():
    p = simm2.init_params(4)
    back = simm2.constrain(simm2.unconstrain(p))
    for a, b in zip(p, back):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_physical_parameterisation():
    p = simm2.init_params(2)
    np.testing.assert_allclose(np.asarray(simm2.damping(p)), 2 * np.asarray(p.alpha))
    np.testing.assert_allclose(
        np.asarray(simm2.spring(p)),
        np.asarray(p.alpha) ** 2 + np.asarray(p.omega) ** 2,
    )


def test_mll_at_truth_beats_perturbed():
    rows, y, true = _sample_problem(jax.random.PRNGKey(0))
    model = simm2.SecondOrderSIMM(num_genes=3)
    bad = true._replace(omega=true.omega * 2.5, alpha=true.alpha * 3.0)
    assert float(model.mll(true, rows, y)) > float(model.mll(bad, rows, y))


def test_training_improves_mll():
    rows, y, true = _sample_problem(jax.random.PRNGKey(1))
    model = simm2.SecondOrderSIMM(num_genes=3, jitter=1e-6)
    raw = simm2.unconstrain(simm2.init_params(3))

    def loss(raw):
        return -model.mll(simm2.constrain(raw), rows, y)

    opt = optax.adam(0.02)
    state = opt.init(raw)

    @jax.jit
    def step(raw, state):
        l, g = jax.value_and_grad(loss)(raw)
        upd, state = opt.update(g, state)
        return optax.apply_updates(raw, upd), state, l

    l0 = float(loss(raw))
    for _ in range(100):
        raw, state, l = step(raw, state)
    assert np.isfinite(float(l))
    assert float(l) < l0 - 1.0


def test_latent_posterior_interpolates_force():
    """Condition on noiseless outputs generated from a KNOWN force drawn
    from the joint prior; the posterior mean at training times must track
    the true force."""
    G, T = 2, 15
    t = jnp.linspace(0.0, 10.0, T)
    alpha = jnp.asarray([0.4, 0.7])
    omega = jnp.asarray([1.0, 0.8])
    sens = jnp.asarray([1.0, 1.1])
    basal = jnp.zeros(2)
    ell = jnp.asarray(2.0)
    true = simm2.SIMM2Params(
        basal=basal, sensitivity=sens, alpha=alpha, omega=omega,
        lengthscale=ell, obs_stddev=jnp.asarray(1e-3),
    )
    # Joint sample of (x rows, f rows) from the full prior.
    n = G * T
    rows_x = jnp.stack(
        [jnp.tile(t, G), jnp.repeat(jnp.arange(G, dtype=t.dtype), T), jnp.ones(n)],
        axis=-1,
    )
    rows_f = jnp.stack([t, -jnp.ones_like(t), jnp.zeros_like(t)], axis=-1)
    rows_all = jnp.concatenate([rows_x, rows_f])
    K = lfk2.cross_covariance2(rows_all, rows_all, alpha, omega, sens, ell)
    L = jnp.linalg.cholesky(K + 1e-10 * jnp.eye(n + T))
    draw = L @ jax.random.normal(jax.random.PRNGKey(7), (n + T,))
    y, f_true = draw[:n], draw[n:]

    model = simm2.SecondOrderSIMM(num_genes=2, jitter=1e-10)
    post = model.latent_predict(
        true, rows_f, rows_x, y, jnp.full((n,), 1e-8)
    )
    corr = np.corrcoef(np.asarray(post.mean), np.asarray(f_true))[0, 1]
    assert corr > 0.95


def test_output_predict_reproduces_training_data():
    rows, y, true = _sample_problem(jax.random.PRNGKey(2), noise=0.01)
    model = simm2.SecondOrderSIMM(num_genes=3, jitter=1e-8)
    post = model.output_predict(
        true, rows, rows, y, jnp.full((rows.shape[0],), 1e-4)
    )
    resid = np.asarray(post.mean) - np.asarray(y)
    assert np.abs(resid).max() < 0.05


class TestGriddedSecondOrder:
    """The order-2 table Gram and mll_gridded (r2): exact parity with the
    direct complex-erf build, which is what makes dense10k --model simm2
    tractable on the TPU."""

    def _setup(self):
        rng = np.random.default_rng(3)
        G, T = 4, 13
        t = jnp.linspace(0.0, 12.0, T)
        a = jnp.asarray(rng.uniform(0.3, 1.0, G))
        w = jnp.asarray(rng.uniform(0.5, 2.0, G))
        s = jnp.asarray(rng.uniform(0.5, 1.5, G))
        return G, T, t, a, w, s, jnp.asarray(1.5)

    def test_table_gram_matches_block(self):
        G, T, t, a, w, s, l = self._setup()
        Kref = lfk2.k_xx2_block(t, t, a, w, s, l)
        Kfast = lfk2.gram_xx2_blocked_fast(t, a, w, s, l)
        np.testing.assert_allclose(np.asarray(Kfast), np.asarray(Kref),
                                   atol=1e-13)

    def test_table_gram_grad_parity(self):
        G, T, t, a, w, s, l = self._setup()

        def loss(fn):
            return lambda a, w, s, l: jnp.sum(jnp.sin(fn(a, w, s, l)))

        g1 = jax.grad(loss(lambda a, w, s, l: lfk2.k_xx2_block(t, t, a, w, s, l)),
                      (0, 1, 2, 3))(a, w, s, l)
        g2 = jax.grad(loss(lambda a, w, s, l: lfk2.gram_xx2_blocked_fast(t, a, w, s, l)),
                      (0, 1, 2, 3))(a, w, s, l)
        for u, v in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(v), np.asarray(u), atol=1e-11)

    def test_table_gram_rejects_irregular_grid(self):
        G, T, t, a, w, s, l = self._setup()
        t_bad = t.at[3].add(0.5)
        with pytest.raises(ValueError, match="UNIFORM"):
            lfk2.gram_xx2_blocked_fast(t_bad, a, w, s, l)

    def test_mll_gridded_matches_row_path(self):
        from dis_project_tpu.data import synthetic
        from dis_project_tpu.data.dataset import train_arrays

        scfg = synthetic.SyntheticConfig(
            num_genes=5, num_timepoints=11, num_replicates=1, noise_std=0.1
        )
        data = synthetic.generate_ode2(jax.random.PRNGKey(0), scfg, oversample=4)
        X, y, _ = train_arrays(data)
        model = simm2.SecondOrderSIMM(num_genes=5, jitter=1e-6)
        p = simm2.constrain(simm2.unconstrain(simm2.init_params(5)))
        a = float(model.mll(p, jnp.asarray(X), jnp.asarray(y)))
        b = float(model.mll_gridded(p, jnp.asarray(data.timepoints),
                                    jnp.asarray(y)))
        assert b == pytest.approx(a, rel=1e-12)
