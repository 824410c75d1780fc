"""Diagnose auction-matcher round counts on real mid-training cost matrices.

The round-3 dense learning-proof run slowed from ~0.7s/step (epoch 0) to
~5s/step (epoch 2).  Hypothesis: as the model converges, queries contend
for the same GT (near-tied cost rows), and the auction's data-dependent
while_loops approach their iteration caps (price wars at each epsilon
phase).  This script measures it directly: restore a mid-training
checkpoint, run the real forward on real dense-dataset batches (CPU), and
report the XLA auction's iteration counter per problem.

Usage:
    JAX_PLATFORMS=cpu python scripts/diagnose_matcher.py \
        --ckpt runs/proof_r3b/checkpoints --root datasets/synth3k_dense \
        --batches 2
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="runs/proof_r3b/checkpoints")
    p.add_argument("--root", default="datasets/synth3k_dense")
    p.add_argument("--batches", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--eps-min", type=float, default=1e-3)
    p.add_argument("--random-params", action="store_true",
                   help="skip the checkpoint; epoch-0 (random init) baseline")
    p.add_argument("--save-costs", default="",
                   help="write the per-batch cost tensors to this .npz")
    p.add_argument("--pallas-interpret", action="store_true",
                   help="also run the Pallas kernel (interpret mode) and "
                        "report its round counter")
    args = p.parse_args()

    from detr_tpu.config import DETRConfig, TrainingConfig
    from detr_tpu.data.coco import CocoDataset
    from detr_tpu.data.loader import BucketedLoader
    from detr_tpu.data.transforms import get_train_transforms
    from detr_tpu.matcher.hungarian import compute_cost_matrix
    from detr_tpu.matcher.auction import auction_lap
    from detr_tpu.models import DETR
    from detr_tpu.train.checkpoint import CheckpointManager

    train_config = TrainingConfig()
    ds = CocoDataset(args.root, "train", get_train_transforms(seed=7))
    detr_config = DETRConfig(dtype="float32", num_classes=ds.num_classes)
    model = DETR(detr_config)

    loader = BucketedLoader(
        ds,
        args.batch_size,
        buckets=train_config.shape_buckets,
        max_gt=train_config.max_gt_boxes,
        shuffle=True,
        drop_last=True,
        num_workers=0,
        seed=7,
    )

    it = iter(loader)
    sample = next(it)

    if args.random_params:
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(sample["image"]),
            jnp.asarray(sample["height"]),
            jnp.asarray(sample["width"]),
            True,
        )
        params, frozen = variables["params"], variables.get("frozen", {})
        print("using random init (epoch-0 baseline)", flush=True)
    else:
        mgr = CheckpointManager(os.path.abspath(args.ckpt))
        payload = mgr.restore_payload()
        params, frozen = payload["params"], payload["frozen"]
        print(f"restored checkpoint step={payload['step']}", flush=True)

    fwd = jax.jit(
        lambda img, h, w: model.apply(
            {"params": params, "frozen": frozen}, img, h, w, True
        )
    )
    solve_j = jax.jit(
        jax.vmap(lambda c, v: auction_lap(c, v, eps_min=args.eps_min))
    )

    batch = sample
    for bi in range(args.batches):
        t0 = time.time()
        out = fwd(
            jnp.asarray(batch["image"]),
            jnp.asarray(batch["height"]),
            jnp.asarray(batch["width"]),
        )
        logits = np.asarray(out["pred_logits"][:, -1], np.float32)  # last layer
        boxes = np.asarray(out["pred_boxes"][:, -1], np.float32)
        print(f"batch {bi}: forward {time.time()-t0:.1f}s", flush=True)

        costs = jax.vmap(compute_cost_matrix)(
            jnp.asarray(logits),
            jnp.asarray(boxes),
            jnp.asarray(batch["class_idx"]),
            jnp.asarray(batch["boxes_normalized"]),
            jnp.asarray(batch["gt_valid"]),
        )
        t0 = time.time()
        qog, iters = solve_j(costs, jnp.asarray(batch["gt_valid"]))
        iters = np.asarray(iters)
        gts = np.asarray(batch["gt_valid"]).sum(-1)
        print(
            f"batch {bi}: auction iters per problem = {iters.tolist()} "
            f"(gt counts {gts.tolist()}) solve {time.time()-t0:.2f}s",
            flush=True,
        )

        if args.save_costs:
            np.savez(
                args.save_costs.replace(".npz", f"_b{bi}.npz"),
                costs=np.asarray(costs),
                gt_valid=np.asarray(batch["gt_valid"]),
            )
        if args.pallas_interpret:
            from detr_tpu.matcher.pallas_auction import pallas_auction_lap

            t0 = time.time()
            pq, prounds = pallas_auction_lap(
                costs, jnp.asarray(batch["gt_valid"]),
                eps_min=args.eps_min, interpret=True,
            )
            print(
                f"batch {bi}: PALLAS rounds used = "
                f"{np.asarray(prounds).tolist()} ({time.time()-t0:.1f}s "
                "interpret)",
                flush=True,
            )

        # Contention metric: how many queries are within eps of the best
        # cost for each GT?  >1 means a potential price war.
        c = np.asarray(costs)
        for i in range(c.shape[0]):
            g = int(gts[i])
            if g == 0:
                continue
            sub = c[i][:, :g]
            best = sub.min(axis=0)
            near = (sub <= best[None, :] + args.eps_min).sum(axis=0)
            print(
                f"  problem {i}: queries within eps of best per GT: "
                f"median {np.median(near):.0f} max {near.max()}",
                flush=True,
            )
        batch = next(it)


if __name__ == "__main__":
    main()
