"""Fail-fast watchdog for wedged device dispatches.

Long training runs through a remote-TPU transport can wedge *silently*: a
dispatch is lost in flight, every JAX call afterwards blocks on a futex,
and the host keeps enqueueing work (each queued step pins its batch
buffers, so RSS grows without bound while no step completes — observed in
the round-3 dense run: 29 minutes of zero progress at 22 GB RSS before the
process was killed by hand).

A Python thread cannot interrupt a blocked C extension call, so recovery
is process-level by design: when ``beat()`` has not been called for
``timeout_secs`` the watchdog dumps every thread's traceback (stderr) and
hard-exits with a distinctive code.  The trainer's checkpoint auto-restore
(train/trainer.py) turns that into a clean resume on relaunch — pair it
with a retry loop, e.g.::

    until python -m detr_tpu.train.trainer ...; do
      test $? -eq 42 || break   # only the watchdog code auto-relaunches
      sleep 30
    done

The reference has no analog (NCCL aborts surface as process aborts there;
reference detr/train.py relies on torchrun restarts).
"""

from __future__ import annotations

import faulthandler
import logging
import os
import sys
import threading
import time

logger = logging.getLogger(__name__)

#: Exit code signalling "wedged dispatch, relaunch me" to retry wrappers.
WEDGED_EXIT_CODE = 42


class Watchdog:
    """Hard-exits the process when no ``beat()`` arrives for ``timeout_secs``.

    ``timeout_secs <= 0`` disables the timeout check (the thread still
    runs when ``heartbeat_path`` is set).  ``beat()`` is cheap (one
    monotonic read + store) and thread-safe.  Use ``pause()``/``resume()``
    around phases that legitimately block for a long time with no
    heartbeat (first XLA compile through a cold cache can take >10
    minutes).

    ``heartbeat_path``: a file the watchdog thread touches every poll,
    paused or not.  This is the *second* liveness layer: the in-process
    timeout can only fire if the watchdog thread gets scheduled, and a
    wedged C extension call that blocks while HOLDING THE GIL freezes
    every Python thread including this one (observed: an axon-client
    socket read wedged the whole interpreter for 45 min with
    watchdog_secs=1200 never firing — kernel stacks showed one thread in
    ``poll`` and all others futex-blocked on the GIL).  The file's mtime
    going stale is therefore the externally observable signal that the
    interpreter itself is frozen; scripts/train_with_retry.sh watches it
    and kill -9s the process (checkpoint auto-restore turns that into a
    resume).  XLA compiles and device waits release the GIL, so a healthy
    slow startup keeps touching the file and is never falsely killed.
    """

    def __init__(
        self,
        timeout_secs: float,
        poll_secs: float = 10.0,
        heartbeat_path: str | None = None,
    ):
        self.timeout_secs = float(timeout_secs)
        self.heartbeat_path = heartbeat_path
        self._last = time.monotonic()
        self._paused = False
        self._stopped = False
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None
        if heartbeat_path:
            self._touch()
        if self.timeout_secs > 0 or heartbeat_path:
            self._thread = threading.Thread(
                target=self._run,
                args=(float(poll_secs),),
                daemon=True,
                name="dispatch-watchdog",
            )
            self._thread.start()

    def _touch(self) -> None:
        try:
            with open(self.heartbeat_path, "w") as f:
                f.write(str(time.time()))
        except OSError:
            pass

    def beat(self) -> None:
        with self._lock:
            self._last = time.monotonic()

    def pause(self) -> None:
        with self._lock:
            self._paused = True

    def resume(self) -> None:
        with self._lock:
            self._last = time.monotonic()
            self._paused = False

    def stop(self) -> None:
        with self._lock:
            self._stopped = True

    def _run(self, poll_secs: float) -> None:
        while True:
            time.sleep(poll_secs)
            if self.heartbeat_path:
                self._touch()
            with self._lock:
                if self._stopped:
                    return
                if self._paused:
                    continue
                silent = time.monotonic() - self._last
            if self.timeout_secs <= 0:
                continue
            if silent > self.timeout_secs:
                logger.critical(
                    "watchdog: no heartbeat for %.0fs (limit %.0fs) — "
                    "dispatch presumed wedged; dumping tracebacks and "
                    "exiting %d for the retry wrapper",
                    silent,
                    self.timeout_secs,
                    WEDGED_EXIT_CODE,
                )
                try:
                    faulthandler.dump_traceback(file=sys.stderr)
                    sys.stderr.flush()
                except Exception:
                    pass
                os._exit(WEDGED_EXIT_CODE)


def is_transport_error(exc: BaseException) -> bool:
    """True when an exception is a dead/dropped remote-TPU transport —
    restartable by relaunching the process (checkpoint auto-restore makes
    it a resume), NOT a program bug.

    With op-journal compaction enabled (detr_tpu/__init__.py) a transport
    drop surfaces as ``JaxRuntimeError: UNAVAILABLE: TPU backend
    connection dropped; AXON_JOURNAL_COMPACT is set, so the journal
    cannot be replayed`` instead of the silent hang the heartbeat
    watchdog exists for — so the trainer maps it to the same
    WEDGED_EXIT_CODE path.  INVALID_ARGUMENT / RESOURCE_EXHAUSTED / etc.
    stay fatal: relaunching cannot fix a real program error.
    """
    msg = f"{type(exc).__name__}: {exc}"
    return "UNAVAILABLE" in msg and (
        "connection" in msg or "transport" in msg or "journal" in msg
        or "socket" in msg
    )
