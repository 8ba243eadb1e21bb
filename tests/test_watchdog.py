"""The shared first-op watchdog (utils.watchdog) — heartbeat lifecycle."""

import sys
import time

import pytest

from dis_project_tpu.utils.watchdog import first_op_watchdog


def _drain(capsys):
    return capsys.readouterr().err


def test_heartbeat_prints_while_pending(capsys):
    with first_op_watchdog("probe", interval=0.05):
        time.sleep(0.2)
    err = _drain(capsys)
    assert "probe: first device op still pending" in err


def test_no_heartbeat_when_fast(capsys):
    with first_op_watchdog("probe", interval=5):
        pass
    time.sleep(0.05)
    assert _drain(capsys) == ""


def test_stops_after_exception(capsys):
    """The heartbeat must stop when the body raises — a leaked thread would
    print misleading 'still pending' lines for the life of the process."""
    with pytest.raises(RuntimeError):
        with first_op_watchdog("probe", interval=0.05):
            raise RuntimeError("body failed")
    _drain(capsys)
    time.sleep(0.2)
    assert "still pending" not in _drain(capsys)


def test_give_up_exits_process():
    """give_up_s hard-exits with rc 2 at (not one interval after) the bound."""
    import subprocess

    t0 = time.time()
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import time\n"
            "from dis_project_tpu.utils.watchdog import first_op_watchdog\n"
            "with first_op_watchdog('probe', interval=0.2, give_up_s=0.5):\n"
            "    time.sleep(30)\n",
        ],
        capture_output=True,
        text=True,
        timeout=20,
    )
    assert proc.returncode == 2
    assert "giving up after 0s" in proc.stderr or "giving up" in proc.stderr
    assert time.time() - t0 < 15  # exited at the bound, not after sleep(30)
