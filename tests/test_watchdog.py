"""Watchdog semantics (utils/watchdog.py): heartbeat, pause, fail-fast.

The fail-fast path calls os._exit, so it is exercised in a subprocess.
"""

import subprocess
import sys

from detr_tpu.utils.watchdog import WEDGED_EXIT_CODE, Watchdog


def _run(body: str) -> subprocess.CompletedProcess:
    prog = (
        "import time, sys\n"
        "from detr_tpu.utils.watchdog import Watchdog\n" + body
    )
    return subprocess.run(
        [sys.executable, "-c", prog], capture_output=True, timeout=60
    )


def test_disabled_watchdog_has_no_thread():
    w = Watchdog(0)
    assert w._thread is None
    w.beat()  # no-op, must not raise
    w.stop()


def test_wedge_exits_with_sentinel_code():
    r = _run(
        "w = Watchdog(0.5, poll_secs=0.1)\n"
        "time.sleep(30)\n"  # never beats: watchdog must kill us first
        "sys.exit(0)\n"
    )
    assert r.returncode == WEDGED_EXIT_CODE
    assert b"dispatch presumed wedged" in r.stderr


def test_heartbeat_keeps_process_alive():
    r = _run(
        "w = Watchdog(0.6, poll_secs=0.1)\n"
        "for _ in range(20):\n"
        "    time.sleep(0.1); w.beat()\n"
        "w.stop(); sys.exit(0)\n"
    )
    assert r.returncode == 0, r.stderr


def test_pause_exempts_long_phase():
    r = _run(
        "w = Watchdog(0.5, poll_secs=0.1)\n"
        "w.beat(); w.pause()\n"
        "time.sleep(1.5)\n"  # longer than the timeout, but paused
        "w.resume(); w.stop(); sys.exit(0)\n"
    )
    assert r.returncode == 0, r.stderr


def test_heartbeat_file_touched_over_time(tmp_path):
    """The liveness-file layer (GIL-held-wedge backstop): the watchdog
    thread touches heartbeat_path every poll, even paused and even with
    the timeout check disabled (timeout_secs=0); train_with_retry.sh
    watches the mtime."""
    import os
    import time

    hb = str(tmp_path / "hb")
    w = Watchdog(0, poll_secs=0.05, heartbeat_path=hb)
    assert w._thread is not None  # thread runs for the heartbeat alone
    assert os.path.exists(hb)  # touched synchronously at init
    m0 = os.stat(hb).st_mtime_ns
    w.pause()  # paused must NOT stop the touches
    deadline = time.time() + 5.0
    while os.stat(hb).st_mtime_ns == m0 and time.time() < deadline:
        time.sleep(0.05)
    assert os.stat(hb).st_mtime_ns > m0
    w.stop()
