#!/usr/bin/env bash
# Keep the committed weights seed (artifacts/proof_weights) tracking the
# live proof run so the AP curve is CUMULATIVE across VM resets even if
# every builder session dies:
#   * every INTERVAL seconds, distill the latest full-state checkpoint to
#     the {params, frozen-BN} artifact (working tree only — the round
#     driver commits uncommitted work at round end, so the freshest seed
#     always survives);
#   * additionally git-commit the artifact when the seed has advanced
#     >= COMMIT_EVERY epochs since the last committed one (bounds repo
#     growth: each seed commit adds ~148 MB of blobs).
#
# Usage: nohup scripts/seed_loop.sh > /tmp/seed_loop.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
RUN_DIR="${RUN_DIR:-runs/proof_mid3}"
INTERVAL="${INTERVAL:-600}"
COMMIT_EVERY="${COMMIT_EVERY:-10}"
MAX_ITERS="${MAX_ITERS:-120}"

# Single-instance guard: watchers respawn this loop with loose pgrep
# matching; two exporters racing on the same orbax dir + git index would
# corrupt both.  flock is authoritative regardless of cmdline spelling.
exec 9> /tmp/detr_seed_loop.lock
flock -n 9 || { echo "seed_loop already running — exiting"; exit 0; }

last_committed="$(git show HEAD:artifacts/proof_weights/EPOCH 2>/dev/null || echo 0)"

for _ in $(seq 1 "$MAX_ITERS"); do
  sleep "$INTERVAL"
  [ -d "$RUN_DIR/checkpoints" ] || continue
  cur="$(cat artifacts/proof_weights/EPOCH 2>/dev/null || echo 0)"
  # Skip the (heavy: full ~585 MB restore on this 1-core host) python job
  # when the run has produced nothing newer than the exported seed —
  # exported checkpoint step == EPOCH - 1 by construction.
  latest_step="$(ls "$RUN_DIR/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)"
  [ -n "$latest_step" ] || continue
  if [ "$latest_step" -lt "$cur" ]; then
    continue
  fi
  timeout 300 python scripts/export_weights.py "$RUN_DIR" artifacts/proof_weights \
    > /tmp/seed_export_last.txt 2>&1 || continue
  new="$(cat artifacts/proof_weights/EPOCH 2>/dev/null || echo 0)"
  if [ "$new" != "$cur" ]; then
    echo "$(date -u +%H:%M:%S) seed advanced: epoch $cur -> $new"
  fi
  # Consistency gate before staging: the artifact's checkpoint step must
  # match its EPOCH sidecar (step + 1 == EPOCH) or a resume would
  # fast-forward the LR schedule to the wrong epoch.
  art_step="$(ls artifacts/proof_weights/checkpoints 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)"
  if [ -z "$art_step" ] || [ $((art_step + 1)) -ne "$new" ]; then
    echo "$(date -u +%H:%M:%S) seed inconsistent (step $art_step vs EPOCH $new) — not committing"
    continue
  fi
  if [ $((new - last_committed)) -ge "$COMMIT_EVERY" ]; then
    # Explicit pathspec: harvest_loop commits PARITY.md concurrently; an
    # unscoped commit here could sweep its staged files (and vice versa).
    git add -- artifacts/proof_weights
    git commit -q -m "artifacts: advance flagship weights seed to epoch $new" \
      -- artifacts/proof_weights || continue
    last_committed="$new"
    echo "$(date -u +%H:%M:%S) committed seed at epoch $new"
  fi
done
