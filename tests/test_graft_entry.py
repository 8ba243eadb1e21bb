"""Driver-facing entry points: the single-chip compile check and the
multi-chip dryrun must work on the virtual-CPU configuration the driver
uses (tests/conftest.py pins JAX_PLATFORMS=cpu with 8 virtual devices)."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft


def test_entry_loss_is_finite_and_jits():
    fn, args = graft.entry()
    loss = float(jax.jit(fn)(*args))
    assert np.isfinite(loss)


def test_entry_example_args_are_p53_shaped():
    """entry() advertises the canonical p53 problem: 35 rows of
    (t, gene, flag) with a matching flat target vector."""
    _, (raw0, X, y) = graft.entry()
    assert X.shape == (35, 3)
    assert y.shape == (35,)
    # flag column is all-expression (the training rows), gene ids in 0..4
    assert np.all(np.asarray(X[:, 2]) == 1.0)
    assert set(np.unique(np.asarray(X[:, 1]))) == {0.0, 1.0, 2.0, 3.0, 4.0}
    # raw params are a pytree of finite leaves
    assert all(np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(raw0))


def test_entry_loss_is_differentiable():
    """The driver compile-checks the forward only; the step must also carry
    finite, nonzero gradients (it is the training loss)."""
    fn, (raw0, X, y) = graft.entry()
    grads = jax.jit(jax.grad(fn))(raw0, X, y)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.all(np.isfinite(l)) for l in leaves)
    assert any(np.any(np.asarray(l) != 0.0) for l in leaves)


def test_provision_devices_fails_loudly_when_oversubscribed():
    """Requesting more devices than the initialised backends expose must
    raise the explanatory RuntimeError, not hang or silently shrink."""
    assert len(jax.devices()) >= 1  # force backend init first
    import pytest

    with pytest.raises(RuntimeError, match="devices"):
        graft._provision_devices(4096)


def test_dryrun_multichip_three_legs(capsys):
    """All four legs (ensemble step, distributed-Cholesky step,
    temporally-sharded Kalman step, data-parallel SVI step) execute on a
    4-device virtual mesh and report finite losses."""
    # Initialise backends FIRST: if this test runs before any other JAX op
    # (selective invocation), _provision_devices(4) would otherwise repin
    # jax_num_cpu_devices from conftest's 8 down to 4 for the whole
    # process and break every 8-device mesh test that follows.
    assert len(jax.devices()) >= 4
    graft.dryrun_multichip(4)
    out = capsys.readouterr().out
    assert "dryrun_multichip ok" in out
    assert "dist_chol_loss=" in out
    assert "ss_seq_parallel_loss=" in out
    assert "dp_svi_loss=" in out
