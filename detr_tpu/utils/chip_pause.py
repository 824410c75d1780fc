"""Cooperative single-chip arbitration between the trainer and benchmarks.

This host drives ONE real TPU chip through a serializing relay.  A
benchmark that runs while a training loop keeps dispatching steps measures
an interleaved mix, not the device (the round-end ``bench.py`` is executed
by the build driver whenever the round closes — possibly mid-training-run).

Protocol (no signals, no IPC daemon — just a flag file):

  * the benchmark touches :data:`PAUSE_FILE` on entry and removes it on
    exit (``request_chip_pause`` context manager);
  * the trainer polls the file once per step (one ``stat``, ~1 us against
    a ~0.7 s step); when present and FRESH it materializes its in-flight
    dispatch, then idles — beating its watchdog — until the file is gone.

Freshness (mtime within :data:`FRESH_SECS`) makes a crashed benchmark's
leftover file self-expire instead of stalling training forever.

The reference has no analog: its benchmark story is a tqdm rate on a
dedicated GPU (reference detr/train.py:247-253).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

#: Flag-file path shared by every process on the host (env-overridable so
#: tests and multi-tenant hosts can isolate).
PAUSE_FILE = os.environ.get("DETR_CHIP_PAUSE_FILE", "/tmp/detr_chip_pause")

#: A pause file older than this is ignored (benchmark died mid-run).
FRESH_SECS = 3600.0


def pause_requested(path: Optional[str] = None) -> bool:
    """True when a fresh pause file exists — held by ANOTHER process.

    A pause this process itself holds is ignored: ``bench.py --eval-scale``
    runs the production ``run_validation`` (which honors the flag at each
    batch) INSIDE its own ``request_chip_pause`` block — honoring one's own
    flag self-deadlocked the benchmark until its watchdog fired (the
    round-3 "wedged transport?" eval-scale failures were exactly this, not
    the tunnel).  The holder's pid is in the file for this purpose.
    """
    path = path or PAUSE_FILE
    try:
        with open(path) as f:
            holder = f.read().strip()
        age = time.time() - os.stat(path).st_mtime
    except OSError:
        return False
    if holder == str(os.getpid()):
        return False  # our own pause — honoring it would self-deadlock
    return age <= FRESH_SECS  # negative age (future mtime) is honored too


def wait_while_paused(
    watchdog=None, poll_secs: float = 2.0, path: Optional[str] = None
) -> float:
    """Blocks while a fresh pause file exists; returns seconds waited.

    ``watchdog.beat()`` is called every poll so the pause never trips the
    dispatch watchdog (utils/watchdog.py).
    """
    t0 = time.monotonic()
    while pause_requested(path):
        if watchdog is not None:
            watchdog.beat()
        time.sleep(poll_secs)
    return time.monotonic() - t0


@contextlib.contextmanager
def request_chip_pause(path: Optional[str] = None) -> Iterator[None]:
    """Holds the pause file for the duration of the block (benchmark side).

    External supervisors (``timeout`` in collect_checks.sh and
    watch_and_resume.sh) deliver SIGTERM, whose default disposition kills
    the process WITHOUT running ``finally`` blocks — the flag would
    outlive the benchmark and idle a live trainer for up to FRESH_SECS.
    While the flag is held, a SIGTERM handler unlinks it before exiting
    with the conventional 128+15 status.
    """
    import signal
    import threading

    path = path or PAUSE_FILE
    try:
        with open(path, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass  # unwritable path: degrade to no arbitration

    def _on_term(signum, frame):
        try:
            os.unlink(path)
        except OSError:
            pass
        os._exit(143)

    prev_handler = None
    installed = False
    if threading.current_thread() is threading.main_thread():
        try:  # signal.signal is main-thread-only; degrade gracefully
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
            installed = True
        except (ValueError, OSError):
            pass
    try:
        yield
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass
        if installed:
            try:
                signal.signal(signal.SIGTERM, prev_handler)
            except (ValueError, OSError, TypeError):
                pass
