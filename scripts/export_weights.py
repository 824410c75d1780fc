"""Distill a full train-state checkpoint into a {params, frozen} artifact.

A full orbax checkpoint of the flagship run is ~585 MB (fp32 params plus
Adam mu/nu and grad-accum accumulators); the weights + frozen-BN stats
alone are ~170 MB — small enough to commit, which makes the training curve
CUMULATIVE across VM resets: the gitignored ``runs/`` tree (and its
checkpoints) dies with the VM, but a committed weights artifact lets the
next round resume via the reference-style weights-only path
(``--resume-from-checkpoint <artifact> --start-epoch N``; reference
detr/train.py:222-241) instead of restarting the curve from epoch 0.

Usage:
    python scripts/export_weights.py runs/proof_r3b artifacts/proof_weights
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", help="trainer output dir (holds checkpoints/)")
    p.add_argument("out_dir", help="artifact dir (checkpoints/ created inside)")
    p.add_argument("--step", type=int, default=None, help="default: latest")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure host-side copy

    from detr_tpu.train.checkpoint import CheckpointManager

    src = CheckpointManager(args.run_dir)
    step = args.step if args.step is not None else src.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoints under {args.run_dir}")
    payload = src.restore_payload(step)
    dst = CheckpointManager(args.out_dir, max_to_keep=1)
    dst.save_params_only(step, payload["params"], payload["frozen"])
    dst.close()
    src.close()
    epoch = payload.get("extra", {}).get("epoch")
    if epoch is not None:
        # Sidecar for relaunch tooling (watch_and_resume.sh): the epoch to
        # fast-forward the LR schedule to via --start-epoch.  Written via
        # temp-file + rename so a timeout between the orbax save above and
        # this write can never leave a checkpoint/EPOCH pair that disagrees
        # (a stale EPOCH fast-forwards a later resume to the wrong epoch).
        path = os.path.join(args.out_dir, "EPOCH")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(int(epoch) + 1))
        os.rename(tmp, path)
    print(
        f"exported step {step} (epoch {epoch}) -> {args.out_dir}: "
        "params + frozen only"
    )


if __name__ == "__main__":
    main()
