#!/usr/bin/env bash
# Relaunch the trainer on the two failure modes this host actually has:
#   42  — dispatch-watchdog fail-fast (utils/watchdog.py: wedged remote-TPU
#         transport) or RSS-limit self-restart (train/trainer.py,
#         host_rss_limit_gb);
#   137 — SIGKILL, in practice the kernel OOM killer (the round-3 flagship
#         run died exactly this way at 130 GB RSS; the journal-compaction
#         fix in detr_tpu/__init__.py and the RSS self-restart should make
#         this unreachable, but the recovery envelope must still cover it).
# Any other exit — success or a real crash — stops the loop.  Checkpoint
# auto-restore (train/trainer.py) makes each relaunch resume from the last
# saved epoch.
#
# Usage: scripts/train_with_retry.sh <trainer args...>
set -uo pipefail
MAX_RESTARTS="${MAX_RESTARTS:-20}"
n=0
while true; do
  python -m detr_tpu.train.trainer "$@"
  code=$?
  if [ "$code" -ne 42 ] && [ "$code" -ne 137 ]; then
    exit "$code"
  fi
  n=$((n + 1))
  if [ "$n" -gt "$MAX_RESTARTS" ]; then
    echo "train_with_retry: restart limit ($MAX_RESTARTS) hit" >&2
    exit "$code"
  fi
  echo "train_with_retry: exit $code, relaunch #$n in 30s" >&2
  sleep 30
done
