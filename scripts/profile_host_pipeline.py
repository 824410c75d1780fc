"""Measure host input-pipeline cost per image for both wire formats.

The sustained-throughput equation on a TPU VM is

    chip_rate = min(device_img_per_s, host_img_per_s_per_core * n_cores)

so the number that matters is **seconds of host CPU per image** for the
full production path: JPEG decode -> reference augmentation menu
(data/transforms.py) -> bucket fit -> batch assembly (data/bucketing.py).
This script measures it for

  * the target wire (host resamples to the augmented size, ships uint8
    target pixels — the reference's division of labor, detr/data.py:20-63);
  * the source wire (--device-resize: host ships source-resolution uint8,
    the jitted step resamples on the MXU, ops/device_resize.py) — the
    host never touches target-size pixels;

and for the val path (800/1333 resize, reference detr/data.py:66-83) in
both modes.  Stage-level timings (decode / transform / fit / assemble)
are reported separately so regressions are attributable.

Usage:  python scripts/profile_host_pipeline.py [--images N] [--root DIR]
Prints one JSON line per row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from detr_tpu.config import TrainingConfig  # noqa: E402
from detr_tpu.data.bucketing import (  # noqa: E402
    EVAL_BUCKETS,
    assemble_batch,
    assemble_batch_source,
    derive_source_buckets,
    fit_to_bucket,
    fit_to_bucket_source,
    pick_bucket,
)
from detr_tpu.data.coco import CocoDataset  # noqa: E402
from detr_tpu.data.make_synthetic_coco import generate_split  # noqa: E402
from detr_tpu.data.transforms import (  # noqa: E402
    get_train_transforms,
    get_val_transforms,
)


def _time_pipeline(dataset, n, buckets, source_buckets, max_gt, batch):
    """Returns per-stage second totals over n images."""
    decode = transform = fit = assemble = 0.0
    items: list[tuple[int, tuple]] = []
    for i in range(n):
        t0 = time.perf_counter()
        img = dataset.load_image(i % len(dataset))
        target = dataset.raw_target(i % len(dataset))
        t1 = time.perf_counter()
        img, target = dataset.transform(img, target)
        t2 = time.perf_counter()
        if source_buckets is not None:
            th, tw = target["resize_to"]
            bucket_id = pick_bucket(th, tw, buckets)
            item = fit_to_bucket_source(
                img, target, buckets[bucket_id], source_buckets[bucket_id]
            )
        else:
            h, w = img.shape[:2]
            bucket_id = pick_bucket(h, w, buckets)
            item = fit_to_bucket(img, target, buckets[bucket_id])
        t3 = time.perf_counter()
        decode += t1 - t0
        transform += t2 - t1
        fit += t3 - t2
        items.append((bucket_id, item))
        if len(items) == batch:
            by_bucket = items[0][0]
            group = [it for b, it in items if b == by_bucket][:batch]
            while len(group) < batch:  # top up: assembly cost only
                group.append(group[0])
            t4 = time.perf_counter()
            if source_buckets is not None:
                assemble_batch_source(group, source_buckets[by_bucket], max_gt)
            else:
                assemble_batch(
                    group, buckets[by_bucket], max_gt, image_dtype="uint8"
                )
            assemble += time.perf_counter() - t4
            items = []
    return decode, transform, fit, assemble


def _row(name, n, stages):
    d, t, f, a = stages
    total = d + t + f + a
    return {
        "metric": name,
        "value": round(total / n, 4),
        "unit": "s/img/core",
        "img_per_s": round(n / total, 1),
        "decode_ms": round(1e3 * d / n, 1),
        "transform_ms": round(1e3 * t / n, 1),
        "fit_ms": round(1e3 * f / n, 1),
        "assemble_ms": round(1e3 * a / n, 1),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=120)
    p.add_argument("--root", default="datasets/bench_synth")
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    if not os.path.exists(os.path.join(args.root, "train", "labels.json")):
        generate_split(args.root, "train", 600, seed=5)

    cfg = TrainingConfig()
    buckets = tuple(cfg.shape_buckets)
    rows = []

    for wire in ("target", "source"):
        src = derive_source_buckets(buckets) if wire == "source" else None
        ds = CocoDataset(
            args.root,
            "train",
            get_train_transforms(
                seed=0, normalize=False, emit_source=wire == "source"
            ),
        )
        stages = _time_pipeline(
            ds, args.images, buckets, src, cfg.max_gt_boxes, args.batch
        )
        rows.append(_row(f"host_s_per_img_train_{wire}_wire", args.images, stages))

    for wire in ("target", "source"):
        src = derive_source_buckets(EVAL_BUCKETS) if wire == "source" else None
        ds = CocoDataset(
            args.root,
            "train",  # same on-disk images; bench_synth has no val split
            get_val_transforms(normalize=False, emit_source=wire == "source"),
        )
        stages = _time_pipeline(
            ds, args.images, EVAL_BUCKETS, src, cfg.max_gt_boxes, args.batch
        )
        rows.append(_row(f"host_s_per_img_val_{wire}_wire", args.images, stages))

    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
