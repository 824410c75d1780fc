#!/usr/bin/env bash
# Keep PARITY.md's dense learning-proof table current while the flagship
# run progresses: every INTERVAL seconds, re-harvest the run's logs
# into the <!-- HARVEST:proof_r3b --> block and commit when it changed.
# Survives builder-session deaths — the AP curve gets recorded regardless.
#
# Usage: nohup scripts/harvest_loop.sh > /tmp/harvest_loop.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
RUN_DIR="${RUN_DIR:-runs/proof_mid3}"
INTERVAL="${INTERVAL:-900}"
MAX_ITERS="${MAX_ITERS:-120}"

exec 9> /tmp/detr_harvest_loop.lock
flock -n 9 || { echo "harvest_loop already running — exiting"; exit 0; }

for _ in $(seq 1 "$MAX_ITERS"); do
  sleep "$INTERVAL"
  timeout 600 python scripts/harvest_run.py "$RUN_DIR/logs" \
    --parity PARITY.md --key "$(basename "$RUN_DIR")" \
    > /tmp/harvest_last.txt 2>&1 || continue
  if ! git diff --quiet -- PARITY.md; then
    # Pathspec-scoped commit: seed_loop commits artifacts/ concurrently.
    git add -- PARITY.md
    git commit -q -m "docs: refresh dense learning-proof AP table (auto-harvest)" \
      -- PARITY.md || true
    echo "$(date -u +%H:%M:%S) committed refreshed table"
  fi
done
