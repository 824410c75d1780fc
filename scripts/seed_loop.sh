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
INTERVAL="${INTERVAL:-600}"
COMMIT_EVERY="${COMMIT_EVERY:-10}"
MAX_ITERS="${MAX_ITERS:-60}"

last_committed="$(git show HEAD:artifacts/proof_weights/EPOCH 2>/dev/null || echo 0)"

for _ in $(seq 1 "$MAX_ITERS"); do
  sleep "$INTERVAL"
  [ -d runs/proof_r3b/checkpoints ] || continue
  cur="$(cat artifacts/proof_weights/EPOCH 2>/dev/null || echo 0)"
  timeout 300 python scripts/export_weights.py runs/proof_r3b artifacts/proof_weights \
    > /tmp/seed_export_last.txt 2>&1 || continue
  new="$(cat artifacts/proof_weights/EPOCH 2>/dev/null || echo 0)"
  if [ "$new" != "$cur" ]; then
    echo "$(date -u +%H:%M:%S) seed advanced: epoch $cur -> $new"
  fi
  if [ $((new - last_committed)) -ge "$COMMIT_EVERY" ]; then
    git add artifacts/proof_weights
    git commit -q -m "artifacts: advance flagship weights seed to epoch $new" || continue
    last_committed="$new"
    echo "$(date -u +%H:%M:%S) committed seed at epoch $new"
  fi
done
