#!/usr/bin/env bash
# Keep PARITY.md's dense learning-proof table current while the flagship
# run progresses: every INTERVAL seconds, re-harvest runs/proof_r3b/logs
# into the <!-- HARVEST:proof_r3b --> block and commit when it changed.
# Survives builder-session deaths — the AP curve gets recorded regardless.
#
# Usage: nohup scripts/harvest_loop.sh > /tmp/harvest_loop.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
INTERVAL="${INTERVAL:-900}"
MAX_ITERS="${MAX_ITERS:-60}"  # bound lifetime (~15h at the default interval)

for _ in $(seq 1 "$MAX_ITERS"); do
  sleep "$INTERVAL"
  timeout 600 python scripts/harvest_run.py runs/proof_r3b/logs \
    --parity PARITY.md > /tmp/harvest_last.txt 2>&1 || continue
  if ! git diff --quiet -- PARITY.md; then
    git add PARITY.md
    git commit -q -m "docs: refresh dense learning-proof AP table (auto-harvest)" \
      || true
    echo "$(date -u +%H:%M:%S) committed refreshed table"
  fi
done
