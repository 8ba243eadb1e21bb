"""Parallel-prefix ODE integrator vs naive-quadrature oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from dis_project_tpu.ops.odeint import decay_propagated_trapezoid, gene_curves


def _naive_curves(g, basal, sens, decay, t):
    """The synthetic oracle's form: cumtrapz(e^{D u} g) * e^{-D t}."""
    dt = t[1] - t[0]
    integrand = np.exp(decay[:, None] * t[None, :]) * g[None, :]
    steps = 0.5 * dt * (integrand[:, 1:] + integrand[:, :-1])
    cumint = np.concatenate(
        [np.zeros((decay.size, 1)), np.cumsum(steps, axis=1)], axis=1
    )
    return (basal / decay)[:, None] + sens[:, None] * np.exp(
        -decay[:, None] * t[None, :]
    ) * cumint


def test_matches_naive_trapezoid():
    rng = np.random.default_rng(0)
    Q, G = 97, 5
    t = np.linspace(0.0, 12.0, Q)
    g = rng.normal(size=Q)
    basal = rng.uniform(0.02, 0.1, G)
    sens = rng.uniform(0.5, 1.5, G)
    decay = rng.uniform(0.2, 1.0, G)
    want = _naive_curves(g, basal, sens, decay, t)
    got = gene_curves(
        jnp.asarray(g), jnp.asarray(basal), jnp.asarray(sens),
        jnp.asarray(decay), t[1] - t[0],
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9, atol=1e-11)


def test_no_overflow_at_large_decay_times():
    # The naive e^{D u} form overflows f32 at D*t ~ 88; the decay-propagated
    # recurrence never forms a factor > 1.
    Q = 4001  # dt = 0.05: trapezoid error ~ (D dt)^2 / 12 ~ 5e-4 rel
    t = np.linspace(0.0, 200.0, Q)
    g = np.ones(Q)
    decay = np.array([1.5])
    J = decay_propagated_trapezoid(
        jnp.asarray(g, jnp.float32), jnp.asarray(decay, jnp.float32),
        jnp.float32(t[1] - t[0]),
    )
    assert np.isfinite(np.asarray(J)).all()
    # steady state of dJ/dt = 1 - D J is 1/D.
    np.testing.assert_allclose(
        float(J[0, -1]), 1.0 / decay[0], rtol=2e-3
    )


def test_matches_sequential_scan():
    # The associative prefix must agree with the literal sequential
    # recurrence to float tolerance.
    rng = np.random.default_rng(1)
    Q, G = 64, 3
    dt = 0.125
    g = jnp.asarray(rng.normal(size=Q))
    decay = jnp.asarray(rng.uniform(0.2, 1.2, G))
    got = decay_propagated_trapezoid(g, decay, dt)

    a = jnp.exp(-decay * dt)

    def step(J, k):
        J = a * J + 0.5 * dt * (a * g[k - 1] + g[k])
        return J, J

    _, seq = jax.lax.scan(step, jnp.zeros(G), jnp.arange(1, Q))
    want = jnp.concatenate([jnp.zeros((1, G)), seq]).T
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-10, atol=1e-12
    )


def test_batched_leading_axes():
    # Monte-Carlo sample axis broadcasts through.
    rng = np.random.default_rng(2)
    S, Q, G = 4, 33, 2
    g = jnp.asarray(rng.normal(size=(S, Q)))
    decay = jnp.asarray([0.3, 0.9])
    J = decay_propagated_trapezoid(g, decay, 0.25)
    assert J.shape == (S, G, Q)
    single = decay_propagated_trapezoid(g[1], decay, 0.25)
    np.testing.assert_allclose(np.asarray(J[1]), np.asarray(single), rtol=1e-12)
