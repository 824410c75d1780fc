"""Dev harness: visual checks of the data pipeline.

Script equivalent of the reference's ``notebooks/dev-data.ipynb``: run a few
images through each augmentation stage and the bucketed collate, dumping
annotated PNGs and printing batch shapes.

Usage:
  python -m examples.dev_data --coco-root datasets/coco-2017 [--out /tmp/dev_data]
  python -m examples.dev_data --synthetic                      # no dataset
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from detr_tpu.data import (
    BucketedLoader,
    CocoDataset,
    DEFAULT_BUCKETS,
    get_train_transforms,
)
from detr_tpu.viz import plot


def synthetic_dataset(n=8, seed=0):
    rng = np.random.default_rng(seed)

    class DS:
        def __len__(self):
            return n

        def __getitem__(self, i):
            h, w = int(rng.integers(300, 700)), int(rng.integers(300, 700))
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            k = int(rng.integers(1, 6))
            x0 = rng.uniform(0, w - 60, k)
            y0 = rng.uniform(0, h - 60, k)
            boxes = np.stack(
                [x0, y0, x0 + rng.uniform(20, 60, k), y0 + rng.uniform(20, 60, k)], 1
            ).astype(np.float32)
            t = {
                "image_id": i,
                "boxes": boxes,
                "class_idx": rng.integers(0, 3, k),
                "class_id": rng.integers(0, 3, k),
                "iscrowd": np.zeros(k, bool),
            }
            return self.transform(img, t) if self.transform else (img, t)

    ds = DS()
    ds.transform = None
    return ds


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--coco-root", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", type=str, default="/tmp/dev_data")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    transform = get_train_transforms(seed=0)
    if args.synthetic or not args.coco_root:
        ds = synthetic_dataset()
        ds.transform = transform
    else:
        ds = CocoDataset(args.coco_root, "train", transform)

    # per-image augmented dumps
    for i in range(min(4, len(ds))):
        img, t = ds[i]
        rendered = plot(img, t["boxes"], box_color="green")
        Image.fromarray(rendered).save(os.path.join(args.out, f"augmented_{i}.png"))
        print(f"image {i}: shape={img.shape} boxes={len(t['boxes'])}")

    loader = BucketedLoader(
        ds, batch_size=2, buckets=DEFAULT_BUCKETS, max_gt=16, num_workers=0,
        drop_last=False,
    )
    for bi, batch in enumerate(loader):
        print(
            f"batch {bi}: image {batch['image'].shape} "
            f"heights {batch['height'].tolist()} "
            f"valid GT {batch['gt_valid'].sum(axis=1).tolist()}"
        )
        if bi >= 2:
            break
    print("wrote PNGs to", args.out)


if __name__ == "__main__":
    main()
