"""Chip-pause arbitration (utils/chip_pause.py): a benchmark's pause file
makes the trainer idle (beating its watchdog) and a stale file self-expires."""

import os
import threading
import time

from detr_tpu.utils import chip_pause as cp


def test_request_and_release(tmp_path):
    path = str(tmp_path / "pause")
    assert not cp.pause_requested(path)
    with cp.request_chip_pause(path):
        # Held and visible to OTHER processes (file exists, fresh, our pid
        # recorded) — but NOT to ourselves: bench.py --eval-scale runs
        # run_validation (which polls the flag) inside its own pause;
        # honoring one's own flag self-deadlocks until the watchdog fires.
        assert os.path.exists(path)
        assert open(path).read() == str(os.getpid())
        assert not cp.pause_requested(path)  # self-hold regression
    assert not cp.pause_requested(path)
    assert not os.path.exists(path)


def test_other_process_pause_is_honored(tmp_path):
    """A flag written by a DIFFERENT pid (any other holder) still pauses."""
    path = str(tmp_path / "pause")
    with open(path, "w") as f:
        f.write(str(os.getpid() + 1))
    assert cp.pause_requested(path)


def test_stale_file_ignored(tmp_path):
    path = str(tmp_path / "pause")
    with open(path, "w") as f:
        f.write("dead-bench")
    old = time.time() - cp.FRESH_SECS - 10
    os.utime(path, (old, old))
    assert not cp.pause_requested(path)


class _Dog:
    def __init__(self):
        self.beats = 0

    def beat(self):
        self.beats += 1


def test_wait_while_paused_blocks_then_returns(tmp_path):
    path = str(tmp_path / "pause")
    with open(path, "w") as f:
        f.write("bench")
    dog = _Dog()

    def release():
        time.sleep(0.5)
        os.unlink(path)

    t = threading.Thread(target=release)
    t.start()
    waited = cp.wait_while_paused(dog, poll_secs=0.05, path=path)
    t.join()
    assert waited >= 0.4
    assert dog.beats >= 5  # watchdog kept alive throughout the pause


def test_wait_no_pause_is_instant(tmp_path):
    waited = cp.wait_while_paused(None, poll_secs=0.05, path=str(tmp_path / "x"))
    assert waited < 0.05


def test_sigterm_while_holding_pause_cleans_flag(tmp_path):
    """External supervisors (`timeout` in collect_checks.sh) SIGTERM a
    wedged benchmark; the default disposition skips `finally`, so the
    handler installed by request_chip_pause must unlink the flag — a
    stale flag idles a live trainer for up to FRESH_SECS."""
    import signal
    import subprocess
    import sys

    path = str(tmp_path / "pause")
    code = (
        "import sys, time\n"
        "from detr_tpu.utils.chip_pause import request_chip_pause\n"
        f"with request_chip_pause({path!r}):\n"
        "    print('held', flush=True)\n"
        "    time.sleep(60)\n"
    )
    p = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert p.stdout.readline().strip() == "held"
    assert os.path.exists(path)
    p.send_signal(signal.SIGTERM)
    assert p.wait(timeout=30) == 143  # conventional 128+SIGTERM
    assert not os.path.exists(path)
