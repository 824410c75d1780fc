"""Label<->pixel alignment audit over the PRODUCTION data path.

The synthetic datasets paint each GT box in its class's palette color
(data/make_synthetic_coco.py), so image/label correspondence is machine-
checkable END TO END: pull batches through the exact loader stack a proof
run uses, reconstruct the tensor the model sees (prepare_batch_image,
including the device-resize wire), and for every valid GT compare the
median color inside the box against the class palette.

Accuracy ~1.0 = the pipeline delivers learnable classification targets.
Accuracy ~1/num_classes (or ~1/objects-per-image) = a desync — the
round-5 hypothesis for the AP-0 plateau (boxes learn, classes never do).

Usage:
    JAX_PLATFORMS=cpu python scripts/check_label_alignment.py \
        --root datasets/synth3k_dense --batches 6 [--device-resize] \
        [--workers 2] [--photometric]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def audit(args) -> float:
    import jax.numpy as jnp

    from detr_tpu.data import BucketedLoader, CocoDataset, get_train_transforms
    from detr_tpu.data.make_synthetic_coco import class_palette_uint8
    from detr_tpu.data.transforms import _NORM_BIAS, _NORM_SCALE
    from detr_tpu.ops.image_norm import prepare_batch_image

    buckets = tuple(
        tuple(int(x) for x in b.split("x")) for b in args.buckets.split(",")
    )
    ds = CocoDataset(
        args.root,
        "train",
        get_train_transforms(
            seed=args.seed,
            normalize=False,
            emit_source=args.device_resize,
            photometric=args.photometric,
        ),
    )
    loader = BucketedLoader(
        ds,
        args.batch_size,
        buckets=buckets,
        max_gt=100,
        shuffle=True,
        num_workers=args.workers,
        seed=args.seed,
        image_dtype="uint8",
        wire="source" if args.device_resize else "target",
    )
    canvas_map = (
        dict(zip(loader.source_buckets, loader.buckets))
        if args.device_resize
        else None
    )
    pal = class_palette_uint8().astype(np.float32)  # (80, 3)

    n_ok = n_tot = 0
    confusions: list[tuple[int, int]] = []
    it = iter(loader)
    for bi in range(args.batches):
        batch = next(it)
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "pad_count"}
        x = np.asarray(prepare_batch_image(jb, canvas_map))  # (B, H, W, 3) fp32
        rgb = (x + _NORM_BIAS) / _NORM_SCALE  # back to 0..255
        B = rgb.shape[0]
        for b in range(B):
            h, w = int(batch["height"][b]), int(batch["width"][b])
            for g in range(100):
                if not batch["gt_valid"][b, g]:
                    continue
                x0, y0, x1, y1 = batch["boxes_normalized"][b, g] * np.array(
                    [w, h, w, h]
                )
                # central 40% region, >= 2px, to dodge resample halos and
                # partial occlusion by later-painted boxes
                cx0 = x0 + 0.3 * (x1 - x0)
                cx1 = x1 - 0.3 * (x1 - x0)
                cy0 = y0 + 0.3 * (y1 - y0)
                cy1 = y1 - 0.3 * (y1 - y0)
                ix0, ix1 = int(round(cx0)), max(int(round(cx0)) + 1, int(round(cx1)))
                iy0, iy1 = int(round(cy0)), max(int(round(cy0)) + 1, int(round(cy1)))
                patch = rgb[b, iy0:iy1, ix0:ix1].reshape(-1, 3)
                if patch.shape[0] == 0:
                    continue
                med = np.median(patch, axis=0)
                pred = int(np.argmin(np.sum((pal - med) ** 2, axis=1)))
                want = int(batch["class_idx"][b, g])
                n_tot += 1
                if pred == want:
                    n_ok += 1
                elif len(confusions) < 12:
                    confusions.append((want, pred))
    acc = n_ok / max(n_tot, 1)
    wire = "device-resize" if args.device_resize else "target"
    print(
        f"wire={wire} workers={args.workers} photometric={args.photometric}: "
        f"{n_ok}/{n_tot} GT boxes match their class color (acc={acc:.3f})"
    )
    if confusions:
        print(f"  sample confusions (want -> pixel says): {confusions}")
    loader.close()
    return acc


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", default="datasets/synth3k_dense")
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--buckets", default="768x768,512x1024,1024x512")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--device-resize", action="store_true")
    ap.add_argument("--photometric", action="store_true")
    args = ap.parse_args()
    acc = audit(args)
    return 0 if acc > 0.9 else 1


if __name__ == "__main__":
    raise SystemExit(main())
