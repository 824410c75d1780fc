#!/usr/bin/env bash
# Relaunch the trainer when the dispatch watchdog fail-fasts (exit 42:
# utils/watchdog.py, wedged remote-TPU transport).  Any other exit code —
# success, a real crash, OOM — stops the loop.  Checkpoint auto-restore
# (train/trainer.py) makes each relaunch resume from the last saved epoch.
#
# Usage: scripts/train_with_retry.sh <trainer args...>
set -uo pipefail
MAX_RESTARTS="${MAX_RESTARTS:-20}"
n=0
while true; do
  python -m detr_tpu.train.trainer "$@"
  code=$?
  if [ "$code" -ne 42 ]; then
    exit "$code"
  fi
  n=$((n + 1))
  if [ "$n" -gt "$MAX_RESTARTS" ]; then
    echo "train_with_retry: watchdog restart limit ($MAX_RESTARTS) hit" >&2
    exit 42
  fi
  echo "train_with_retry: watchdog exit, relaunch #$n in 30s" >&2
  sleep 30
done
