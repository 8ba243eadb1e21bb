"""Elastic-recovery exercise (SURVEY §5 / VERDICT r2 #8): a training
process is SIGKILLed mid-run between checkpoint segments, and a rerun must
continue from the persisted (raw params, optimizer state, step) and land
BIT-EXACTLY where an uninterrupted run lands.

This goes beyond tests/test_observability.py's in-process resume tests:
the process actually dies (no atexit, no finally), so it exercises the
durability of the orbax checkpoint files themselves.
"""

import json
import os
import signal
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_SCRIPT = r"""
import os, sys, json
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from dis_project_tpu.data.dataset import P53Data, dataset_3d
from dis_project_tpu.models import simm
from dis_project_tpu.training import trainer as tr
from dis_project_tpu.training import checkpoint as ckpt

kill_after = int(sys.argv[1])
directory = sys.argv[2]

if kill_after > 0:
    orig_save = ckpt.save
    state = {"n": 0}

    def save_then_die(*a, **k):
        orig_save(*a, **k)
        state["n"] += 1
        if state["n"] >= kill_after:
            os.kill(os.getpid(), 9)  # SIGKILL: no cleanup of any kind

    ckpt.save = save_then_die

data = P53Data(replicate=0, source="synthetic")
X, y, _ = dataset_3d(data)
model = simm.ExactSIMM(num_genes=5, jitter=1e-4)
cfg = tr.TrainConfig(num_iters=40)
res = tr.fit_checkpointed(
    model, simm.init_params(5), X, y, cfg, directory, checkpoint_every=10
)
out = {
    "steps_run": int(res.history.shape[0]),
    "decay": [float(v) for v in np.asarray(res.params.decay)],
    "sensitivity": [float(v) for v in np.asarray(res.params.sensitivity)],
    "lengthscale": float(np.asarray(res.params.lengthscale)),
}
print("RESULT " + json.dumps(out))
"""


def _run(kill_after, directory):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, str(kill_after), str(directory)],
        capture_output=True,
        env=env,
        timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    result = None
    for line in proc.stdout.decode().splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    return proc, result


def test_sigkill_between_segments_resumes_bit_exactly(tmp_path):
    clean_dir = tmp_path / "clean"
    killed_dir = tmp_path / "killed"

    # Uninterrupted 40-iteration run: the ground truth.
    proc, clean = _run(0, clean_dir)
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    assert clean is not None and clean["steps_run"] == 40

    # Run that SIGKILLs itself right after the SECOND segment checkpoint
    # (step 20 persisted, process dead with no cleanup).
    proc, _ = _run(2, killed_dir)
    assert proc.returncode == -signal.SIGKILL
    # The checkpoint directory survived the kill with step 20 on disk.
    from dis_project_tpu.training import checkpoint as ckpt

    assert ckpt.latest_step(str(killed_dir)) == 20

    # Rerun without the kill: resumes at step 20, trains exactly the
    # remaining 20 steps, and the final parameters are BIT-EXACT equal to
    # the uninterrupted run's (same optimizer moments, same schedule).
    proc, resumed = _run(0, killed_dir)
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    assert resumed is not None and resumed["steps_run"] == 20
    for key in ("decay", "sensitivity"):
        np.testing.assert_array_equal(
            np.asarray(resumed[key]), np.asarray(clean[key]), err_msg=key
        )
    assert resumed["lengthscale"] == clean["lengthscale"]
