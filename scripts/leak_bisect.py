"""Host-RSS leak bisect for the trainer pipeline (round-4 verdict #1).

The round-3 flagship proof run was OOM-killed at 130 GB anon RSS after ~38
epochs (~9 MB retained per step — suspiciously one uint8 wire batch).  This
harness reproduces the exact host-side pipeline (CocoDataset on the proof
dataset, train transforms, BucketedLoader thread workers, uint8 wire,
prefetch) in isolation stages so the retaining component can be identified:

  stage loader   — iterate host batches and drop them
  stage place    — + jnp.asarray/device_put of every batch (backend default)
  stage step     — + a real jitted tiny-model train step consuming the batch

Run on CPU (--cpu) to exonerate/incriminate pure-host code, then on the TPU
backend to test the axon transfer client.  Prints one CSV line per N steps:
step,rss_mb,delta_mb_per_step.
"""
from __future__ import annotations

import argparse
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["loader", "place", "step"], required=True)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--report-every", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--root", default="datasets/synth3k_dense")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--no-prefetch", action="store_true")
    ap.add_argument("--num-workers", type=int, default=2)
    ap.add_argument(
        "--buckets", default="768x768,512x1024,1024x512",
        help="proof-run buckets by default",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from detr_tpu.data import (
        BucketedLoader,
        CocoDataset,
        get_train_transforms,
        prefetch_to_device,
    )

    buckets = []
    for part in args.buckets.split(","):
        h, w = part.split("x")
        buckets.append((int(h), int(w)))

    ds = CocoDataset(args.root, "train", get_train_transforms(seed=0, normalize=False))
    loader = BucketedLoader(
        ds, args.batch_size, buckets=tuple(buckets), max_gt=100, shuffle=True,
        drop_last=True, num_workers=args.num_workers, seed=0, image_dtype="uint8",
    )

    step_fn = None
    state = None
    if args.stage == "step":
        from detr_tpu.config import DETRConfig, TrainingConfig
        from detr_tpu.train.optimizer import build_optimizer
        from detr_tpu.train.train_step import (
            build_criterion, create_train_state, make_train_step,
        )
        from detr_tpu.models import DETR

        dcfg = DETRConfig(
            num_object_queries=8, num_encoder_layers=1, num_decoder_layers=2,
            num_attention_heads=2, hidden_size=16, ffn_scale_factor=2,
            num_classes=80, dtype="float32" if args.cpu else "bfloat16",
        )
        tcfg = TrainingConfig(
            train_batch_size=args.batch_size,
            cumulative_train_batch_size=2 * args.batch_size,
        )
        model = DETR(dcfg)
        criterion = build_criterion(tcfg, dcfg)
        tx, _ = build_optimizer(tcfg)
        first = None

    def place(b):
        return {k: jnp.asarray(v) for k, v in b.items() if k != "pad_count"}

    def batches():
        while True:  # loop epochs until step budget is hit
            if args.stage == "loader":
                yield from iter(loader)
            elif args.no_prefetch:
                yield from (place(b) for b in loader)
            else:
                yield from prefetch_to_device(loader, place, depth=2)

    t0 = time.time()
    base = None
    last_rss = None
    it = batches()
    pending = None
    print("step,rss_mb,delta_mb_per_step,sec", flush=True)
    for i in range(args.steps):
        b = next(it)
        if args.stage == "step":
            if state is None:
                state = create_train_state(model, tx, jax.random.PRNGKey(0), b)
                step_fn = make_train_step(model, criterion, donate=True)
            state, metrics = step_fn(state, b)
            if pending is not None:
                float(pending)  # dispatch_sync_steps=1 semantics
            pending = metrics["loss"]
        if i % args.report_every == 0:
            cur = rss_mb()
            if base is None:
                base, last_rss, last_i = cur, cur, i
                d = 0.0
            else:
                d = (cur - last_rss) / max(1, i - last_i)
                last_rss, last_i = cur, i
            print(f"{i},{cur:.1f},{d:.3f},{time.time()-t0:.0f}", flush=True)
    gc.collect()
    print(f"final,{rss_mb():.1f},,{time.time()-t0:.0f}", flush=True)
    loader.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
