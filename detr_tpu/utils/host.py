"""Host-process introspection: resident-set-size telemetry.

The trainer logs RSS every log step and self-restarts (exit 42 ->
scripts/train_with_retry.sh relaunch -> checkpoint auto-restore) past
``TrainingConfig.host_rss_limit_gb`` — the fail-fast counterpart of the
remote-client journal leak fixed in ``detr_tpu/__init__.py``.  The
reference has no analog (single-host torch runs surface OOM as a kernel
kill with no recovery; reference detr/train.py has no memory telemetry).
"""

from __future__ import annotations


def host_rss_gb() -> float:
    """Resident set size of this process in GB (0.0 if unreadable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / (1024.0 * 1024.0)
    except OSError:
        pass
    return 0.0
