"""Liveness heartbeat for long renders driven over the TPU tunnel.

The tunnel to the remote TPU pool occasionally wedges: the client
thread blocks forever inside a device sync with no exception to catch,
so the in-process device-fault retry (integrators/guided.py
_device_retry) never fires. External drivers (the parity campaign,
long bench runs) need a liveness signal they can watch from OUTSIDE
the process: set PPG_HEARTBEAT=<path> and every dispatch-level sync
point touches that file. A watchdog that sees the mtime go stale for
longer than any legitimate compile can kill and relaunch the run.

Plays the role of the reference scheduler's per-worker progress
reporting (libcore/sched.cpp heartbeat/cancel machinery) for the
one-process TPU deployment.
"""

from __future__ import annotations

import os

_path = None
_checked = False


def beat():
    """Touch the PPG_HEARTBEAT file, if configured. Never raises."""
    global _path, _checked
    if not _checked:
        _path = os.environ.get("PPG_HEARTBEAT") or None
        _checked = True
    if _path is None:
        return
    try:
        with open(_path, "a"):
            os.utime(_path, None)
    except OSError:
        pass
