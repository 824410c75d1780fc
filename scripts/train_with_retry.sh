#!/usr/bin/env bash
# Relaunch the trainer on the failure modes this host actually has:
#   42  — dispatch-watchdog fail-fast (utils/watchdog.py: wedged remote-TPU
#         transport) or RSS-limit self-restart (train/trainer.py,
#         host_rss_limit_gb);
#   137 — SIGKILL: the kernel OOM killer (round-3 flagship died this way at
#         130 GB RSS), or THIS script's own liveness kill (below).
# Any other exit — success or a real crash — stops the loop.  Checkpoint
# auto-restore (train/trainer.py) makes each relaunch resume from the last
# saved epoch.
#
# Liveness kill: the in-process watchdog can only fire if its thread gets
# scheduled; a C extension call that wedges while HOLDING THE GIL freezes
# the whole interpreter (observed round-4: an axon-client socket read hung
# the trainer 45 min at startup, kernel stacks showed every thread
# futex-blocked on the GIL, watchdog_secs=1200 never fired).  The watchdog
# thread touches <output-dir>/.heartbeat every ~10 s — paused, compiling,
# or idle — so a stale mtime means the interpreter itself is frozen and
# only an external kill can recover.  This wrapper polls the file and
# kill -9s the trainer when it goes stale (LIVENESS_TIMEOUT, default 600 s
# = 60x the touch period); the next lap relaunches and auto-restores.
# Heartbeats older than the current attempt's start are ignored (leftover
# file from the previous attempt); if no fresh heartbeat appears within
# STARTUP_GRACE the attempt is presumed wedged pre-watchdog (e.g. inside
# jax import/device discovery) and killed too.  Single-process runs only:
# multi-host launches share output dirs and need per-process liveness.
#
# Usage: scripts/train_with_retry.sh <trainer args...>
set -uo pipefail
MAX_RESTARTS="${MAX_RESTARTS:-20}"
LIVENESS_TIMEOUT="${LIVENESS_TIMEOUT:-600}"
STARTUP_GRACE="${STARTUP_GRACE:-900}"

# Recover --output-dir from the pass-through args for the heartbeat path.
outdir=""
prev=""
for a in "$@"; do
  [ "$prev" = "--output-dir" ] && outdir="$a"
  prev="$a"
done
hb="$outdir/.heartbeat"

n=0
while true; do
  python -m detr_tpu.train.trainer "$@" &
  pid=$!
  start=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    if [ -n "$outdir" ] && [ -f "$hb" ]; then
      mtime=$(stat -c %Y "$hb" 2>/dev/null || echo 0)
      if [ "$mtime" -ge "$start" ]; then
        age=$((now - mtime))
        if [ "$age" -gt "$LIVENESS_TIMEOUT" ]; then
          echo "train_with_retry: heartbeat stale ${age}s (> ${LIVENESS_TIMEOUT}) — interpreter frozen, kill -9 $pid" >&2
          kill -9 "$pid" 2>/dev/null
          break
        fi
        continue
      fi
    fi
    # No heartbeat from THIS attempt yet.
    if [ -n "$outdir" ] && [ $((now - start)) -gt "$STARTUP_GRACE" ]; then
      echo "train_with_retry: no heartbeat ${STARTUP_GRACE}s after launch — wedged pre-watchdog, kill -9 $pid" >&2
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"
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
