"""Visualize trained-model detections on images.

Script equivalent of the reference's ``notebooks/visualize-results.ipynb``
(stripped from the reference snapshot — ``.MISSING_LARGE_BLOBS:1``; its role
per the other notebooks: checkpoint -> inference -> rendered boxes).  Here it
drives the production path instead: ``detr_tpu.serve.InferenceEngine`` for
bucketed fixed-shape inference, then ``detr_tpu.viz.plot_grid`` for the
rendered grid.

Usage:
  python -m examples.visualize_results [--checkpoint runs/detr] \
      [--images img1.jpg img2.jpg ...] [--out /tmp/viz_results]

Without ``--images`` it renders synthetic COCO-like images (random init
unless a checkpoint is given) so the script runs anywhere.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from detr_tpu.config import DETRConfig
from detr_tpu.serve import InferenceEngine
from detr_tpu.viz import plot_grid


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, default=None, help="trainer output dir")
    ap.add_argument("--images", type=str, nargs="*", default=None)
    ap.add_argument("--out", type=str, default="/tmp/viz_results")
    ap.add_argument("--score-threshold", type=float, default=0.5)
    args = ap.parse_args()

    class_names = [f"class_{i}" for i in range(80)]
    engine = InferenceEngine(
        DETRConfig(),
        checkpoint_dir=args.checkpoint,
        class_names=class_names,
        batch_size=4,
        score_threshold=args.score_threshold,
    )

    if args.images:
        images = [np.asarray(Image.open(p).convert("RGB")) for p in args.images]
    else:
        rng = np.random.default_rng(0)
        images = [
            (rng.random((h, w, 3)) * 255).astype(np.uint8)
            for h, w in [(480, 640), (640, 480), (375, 500)]
        ]

    detections = engine.predict(images)

    items = []
    for img, det in zip(images, detections):
        items.append(
            {
                "image": img,
                "boxes": det["boxes"],
                "scores": det["scores"],
                "class_names": det.get("class_names"),
            }
        )
        print(
            f"{img.shape[1]}x{img.shape[0]}: {len(det['scores'])} detections "
            f">= {args.score_threshold}"
        )

    os.makedirs(args.out, exist_ok=True)
    grid = plot_grid(items, box_color="red")
    out_path = os.path.join(args.out, "detections.png")
    Image.fromarray(grid).save(out_path)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
