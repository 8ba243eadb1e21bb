"""Distributed Cholesky / MLL on a virtual 8-device CPU mesh: numerical
parity with the single-device path, correct shardings, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dis_project_tpu.ops import mll as mll_ops
from dis_project_tpu.parallel import dist_cholesky as dc

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("model",))


def _spd(n, dtype=jnp.float64):
    A = RNG.standard_normal((n, n))
    A = A @ A.T + n * np.eye(n)
    return jnp.asarray(A, dtype)


def _shard(mesh, A):
    return jax.device_put(A, NamedSharding(mesh, P("model", None)))


@pytest.mark.parametrize("n,block", [(256, 64), (520, 128), (1024, 256)])
def test_sharded_cholesky_matches_dense(mesh, n, block):
    A = _spd(n)
    As = _shard(mesh, A)
    fn = jax.jit(
        lambda A: dc.sharded_cholesky(A, mesh, "model", block),
    )
    L = fn(As)
    Lref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lref), atol=1e-9)


def test_sharded_cholesky_output_is_sharded(mesh):
    A = _shard(mesh, _spd(512))
    L = jax.jit(lambda A: dc.sharded_cholesky(A, mesh, "model", 128))(A)
    assert not L.sharding.is_fully_replicated
    # row-sharded: each device holds a (64, 512) slice
    shard_shapes = {s.data.shape for s in L.addressable_shards}
    assert shard_shapes == {(64, 512)}


def test_sharded_tri_inv(mesh):
    A = _spd(512)
    L = jnp.linalg.cholesky(A)
    Li = jax.jit(lambda L: dc.sharded_tri_inv(L, mesh, "model", base=128))(
        _shard(mesh, L)
    )
    np.testing.assert_allclose(
        np.asarray(Li @ L), np.eye(512), atol=1e-9
    )


def test_sharded_mvn_logpdf_value_and_grad(mesh):
    n = 384
    A = _spd(n)
    y = jnp.asarray(RNG.standard_normal(n))
    mean = jnp.asarray(RNG.standard_normal(n))

    ref_v, ref_g = jax.value_and_grad(
        lambda m, s: mll_ops.mvn_logpdf(y, m, s), argnums=(0, 1)
    )(mean, A)

    fn = jax.jit(
        jax.value_and_grad(
            lambda m, s: dc.sharded_mvn_logpdf(y, m, s, mesh, "model", 128),
            argnums=(0, 1),
        )
    )
    got_v, got_g = fn(mean, _shard(mesh, A))
    assert float(got_v) == pytest.approx(float(ref_v), rel=1e-12)
    np.testing.assert_allclose(np.asarray(got_g[0]), np.asarray(ref_g[0]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(ref_g[1]), atol=1e-9)


def test_end_to_end_sharded_mll_training_step(mesh):
    """One Adam step on the exact SIMM MLL with the distributed factoriser:
    the large-N dense training path as a single SPMD program."""
    import optax

    from dis_project_tpu.data import synthetic
    from dis_project_tpu.data.dataset import train_arrays
    from dis_project_tpu.models import simm
    from dis_project_tpu.ops import gram as gram_ops

    cfg = synthetic.SyntheticConfig(
        num_genes=8, num_timepoints=16, num_replicates=1, noise_std=0.1
    )
    data = synthetic.sample_prior(jax.random.PRNGKey(0), cfg)
    X, y, _ = train_arrays(data)  # N = 128
    model = simm.ExactSIMM(num_genes=8, jitter=1e-5)
    raw0 = simm.unconstrain(simm.init_params(8))
    opt = optax.adam(0.01)

    def loss(raw):
        p = simm.constrain(raw)
        K = gram_ops.gram(X, p.decay, p.sensitivity, p.lengthscale)
        sigma = mll_ops.add_diagonal(K, model.jitter + p.obs_stddev**2)
        mx = model.mean_function(p, X)
        return -dc.sharded_mvn_logpdf(y, mx, sigma, mesh, "model", 32)

    def loss_ref(raw):
        return -model.mll(simm.constrain(raw), X, y)

    @jax.jit
    def step(raw, state):
        l, g = jax.value_and_grad(loss)(raw)
        upd, state = opt.update(g, state)
        return optax.apply_updates(raw, upd), state, l

    state = opt.init(raw0)
    raw1, state, l1 = step(raw0, state)
    assert float(l1) == pytest.approx(float(loss_ref(raw0)), rel=1e-10)
    # gradient parity => identical first update
    g_ref = jax.grad(loss_ref)(raw0)
    g_dist = jax.grad(loss)(raw0)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dist)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)
