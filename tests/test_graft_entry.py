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


def test_dryrun_multichip_two_legs(capsys):
    """Both legs (ensemble step + distributed-Cholesky step) execute on a
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
