"""stderr heartbeat for a pending first device op.

A wedged remote-TPU tunnel hangs even a trivial scalar op in a fresh
process (observed during the r2 outage), and a silent hang in an automated
run is indistinguishable from a slow cold compile without a marker. Both
driver-facing surfaces (``__graft_entry__`` and ``bench.py``) share this
helper so the message shape and lifecycle stay in sync.
"""

from __future__ import annotations

import contextlib
import os
import sys
import threading
import time


@contextlib.contextmanager
def first_op_watchdog(prefix: str, interval: float = 120, give_up_s=None):
    """Heartbeat to stderr every ``interval`` s while the body is pending.

    Use around the FIRST device op of a process::

        with first_op_watchdog("bench"):
            float(jnp.ones(()) + 1.0)

    The watchdog stops when the body finishes — including when it raises
    (the heartbeat would otherwise keep printing misleading "still
    pending" lines for the life of the process).

    ``give_up_s``: if set, hard-exit the process (rc 2) once the op has
    been pending that long. A first op is trivial to compile, so past that
    bound the only plausible cause is a dead tunnel, and a clean nonzero
    exit beats an unbounded hang (a blocked XLA call cannot be interrupted
    from Python, hence ``os._exit``). Only set this in processes this
    package owns outright (``bench.py``) — never in library code a driver
    may embed.
    """
    done = threading.Event()
    start = time.monotonic()

    def run():
        while True:
            wait = interval
            if give_up_s is not None:
                remaining = give_up_s - (time.monotonic() - start)
                if remaining <= 0:
                    print(
                        f"{prefix}: giving up after {int(give_up_s)}s — the "
                        "TPU tunnel is unresponsive (a trivial first op "
                        "cannot take this long); rerun when the accelerator "
                        "is healthy",
                        file=sys.stderr,
                        flush=True,
                    )
                    os._exit(2)
                wait = min(interval, remaining)
            if done.wait(wait):
                return
            waited = int(time.monotonic() - start)
            if give_up_s is None or waited < give_up_s:
                print(
                    f"{prefix}: first device op still pending after "
                    f"{waited}s — slow cold compile or an unresponsive "
                    "TPU tunnel",
                    file=sys.stderr,
                    flush=True,
                )

    threading.Thread(target=run, daemon=True).start()
    try:
        yield
    finally:
        done.set()
