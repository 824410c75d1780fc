"""Aspect-ratio bucketing + fixed-shape batch assembly.

The TPU-native replacement for the reference's pad-to-max ragged collate
(reference detr/data.py:181-222): XLA compiles one program per input shape,
and the reference's per-batch dynamic padding would recompile every step
(SURVEY §7 hard part #2).  Instead, every augmented image is padded into one
of a small fixed set of (H, W) *buckets* (chosen by best fit, downscaling
only when the image exceeds every bucket), and GT is padded to a static
``max_gt`` with a validity mask — the jitted train step sees at most
``len(buckets)`` shapes, ever.

Batch layout (everything fixed-shape numpy, NHWC):
  image            (B, H, W, 3) fp32, zero padding (reference data.py:199-203)
  height / width   (B,) int32 valid extents (reference data.py:193-194)
  image_id         (B,) int32 (-1 = item carried no dataset id; eval
                   metrics auto-assign from a negative namespace)
  class_idx        (B, G) int32        class_id (B, G) int32
  iscrowd          (B, G) bool         gt_valid (B, G) bool
  boxes            (B, G, 4) fp32 XYXY in pixels (eval metrics)
  boxes_normalized (B, G, 4) fp32 XYXY / (w, h, w, h)
                   (reference data.py:216-219)
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from detr_tpu.data.transforms import resize as _resize

# Buckets covering the reference augmentation envelope (shortest side
# 480-800, longest <= 1333) with moderate pad waste; /32-aligned.
DEFAULT_BUCKETS = ((832, 1344), (1344, 832), (1056, 1056))
# Val transform yields shortest side exactly 800 (longest <= 1333); two
# buckets cover landscape and portrait without downscaling anything.
EVAL_BUCKETS = ((800, 1344), (1344, 800))
EVAL_BUCKET = EVAL_BUCKETS[0]  # back-compat alias

# Device-resize wire (ops/device_resize.py): images ship at SOURCE
# resolution in a per-target-bucket source canvas and the jitted step
# resamples on device.  COCO sources are <= 640 px a side; a target bucket
# only receives targets of its own aspect class (resampling preserves
# aspect), so the canvases can be aspect-fitted: the wide bucket receives
# aspect > 1.32 sources (the square bucket wins the waste comparison below
# that), whose short side is then < 640/1.32 < 512.  Sources that still
# exceed their canvas (non-COCO data) are host-downscaled to fit — a
# documented two-stage-resample approximation on the fallback path only.
DEFAULT_SOURCE_BUCKETS = ((512, 672), (672, 512), (672, 672))
EVAL_SOURCE_BUCKETS = ((512, 672), (672, 512))
_SOURCE_SIDE_CAP = 672  # ceil32(COCO max side 640)


def derive_source_buckets(
    buckets: Sequence[tuple[int, int]],
) -> tuple[tuple[int, int], ...]:
    """Source canvases for a custom target-bucket set: each dim capped at
    the COCO source ceiling.  The canvases must be DISTINCT — the train
    step recovers the target canvas from the source canvas shape at trace
    time (train/train_step.py), so a collision would be ambiguous."""
    if tuple(buckets) == DEFAULT_BUCKETS:
        return DEFAULT_SOURCE_BUCKETS
    if tuple(buckets) == EVAL_BUCKETS:
        return EVAL_SOURCE_BUCKETS
    out = tuple(
        (min(bh, _SOURCE_SIDE_CAP), min(bw, _SOURCE_SIDE_CAP))
        for bh, bw in buckets
    )
    if len(set(out)) != len(out):
        raise ValueError(
            f"derived source canvases collide for buckets {tuple(buckets)}: "
            f"{out} — pass distinct source_buckets explicitly"
        )
    return out


def pick_bucket(h: int, w: int, buckets: Sequence[tuple[int, int]]) -> int:
    """Index of the smallest-waste bucket that fits (h, w); if none fits,

    the bucket needing the least downscale."""
    best_fit, best_waste = -1, None
    for i, (bh, bw) in enumerate(buckets):
        if h <= bh and w <= bw:
            waste = bh * bw - h * w
            if best_waste is None or waste < best_waste:
                best_fit, best_waste = i, waste
    if best_fit >= 0:
        return best_fit
    # downscale case: maximize fitted scale
    scales = [min(bh / h, bw / w) for bh, bw in buckets]
    return int(np.argmax(scales))


def fit_to_bucket(img: np.ndarray, target: dict, bucket: tuple[int, int]):
    """Downscale (aspect-preserving) iff the image exceeds the bucket."""
    h, w = img.shape[:2]
    bh, bw = bucket
    if h <= bh and w <= bw:
        return img, target
    scale = min(bh / h, bw / w)
    return _resize(
        (img if img.dtype == np.uint8 else img.astype(np.float32)),
        target,
        int(h * scale),
        int(w * scale),
    )


def fit_to_bucket_source(
    img: np.ndarray, target: dict, bucket: tuple[int, int],
    source_canvas: tuple[int, int],
):
    """Device-resize-wire fit: shrink the TARGET geometry (free — only the
    ``resize_to`` numbers change) when it exceeds the bucket, and
    host-downscale the SOURCE only when it exceeds the canvas (the
    fallback two-stage-resample path for non-COCO-sized inputs)."""
    th, tw = target["resize_to"]
    bh, bw = bucket
    if th > bh or tw > bw:
        s = min(bh / th, bw / tw)
        target = dict(target, resize_to=(int(th * s), int(tw * s)))
    h, w = img.shape[:2]
    sh, sw = source_canvas
    if h > sh or w > sw:
        s = min(sh / h, sw / w)
        resize_to = target["resize_to"]
        img, target = _resize(img, target, int(h * s), int(w * s))
        target["resize_to"] = resize_to
    return img, target


def assemble_batch_source(
    items: Sequence[tuple[np.ndarray, dict]],
    source_canvas: tuple[int, int],
    max_gt: int = 100,
) -> dict[str, np.ndarray]:
    """Device-resize-wire batch: uint8 images padded into the SOURCE
    canvas plus per-image (src_height, src_width) -> (height, width)
    resample instructions for ops/device_resize.py.  Downstream contracts
    are unchanged: ``height``/``width`` are the POST-resample true extents
    (what the model's padding mask / positional encoding consume),
    ``boxes_normalized`` is scale-invariant (source pixels / source size ==
    target pixels / target size, exactly — the host path's box scaling is
    ``boxes * new/old`` then ``/ new``), ``boxes`` is in target pixels for
    the eval metrics."""
    B = len(items)
    sh, sw = source_canvas
    G = max_gt
    batch = {
        "image": np.zeros((B, sh, sw, 3), np.uint8),
        "src_height": np.zeros((B,), np.int32),
        "src_width": np.zeros((B,), np.int32),
        "height": np.zeros((B,), np.int32),
        "width": np.zeros((B,), np.int32),
        "image_id": np.full((B,), -1, np.int32),
        "class_idx": np.zeros((B, G), np.int32),
        "class_id": np.zeros((B, G), np.int32),
        "iscrowd": np.zeros((B, G), bool),
        "gt_valid": np.zeros((B, G), bool),
        "boxes": np.zeros((B, G, 4), np.float32),
        "boxes_normalized": np.zeros((B, G, 4), np.float32),
    }
    for b, (img, t) in enumerate(items):
        h, w = img.shape[:2]
        th, tw = t["resize_to"]
        assert h <= sh and w <= sw, f"source ({h},{w}) exceeds canvas {source_canvas}"
        assert img.dtype == np.uint8, "device-resize wire is uint8-only"
        batch["image"][b, :h, :w] = img
        batch["src_height"][b] = h
        batch["src_width"][b] = w
        batch["height"][b] = th
        batch["width"][b] = tw
        batch["image_id"][b] = t.get("image_id", -1)
        n = min(len(t["boxes"]), G)
        if len(t["boxes"]) > G:
            import warnings

            warnings.warn(f"dropping {len(t['boxes']) - G} GT boxes beyond max_gt={G}")
        if n:
            norm = t["boxes"][:n] / np.array([w, h, w, h], np.float32)
            batch["boxes_normalized"][b, :n] = norm
            batch["boxes"][b, :n] = norm * np.array([tw, th, tw, th], np.float32)
            batch["class_idx"][b, :n] = t["class_idx"][:n]
            batch["class_id"][b, :n] = t["class_id"][:n]
            batch["iscrowd"][b, :n] = t["iscrowd"][:n]
            batch["gt_valid"][b, :n] = True
    return batch


def assemble_batch(
    items: Sequence[tuple[np.ndarray, dict]],
    bucket: tuple[int, int],
    max_gt: int = 100,
    image_dtype: str = "float32",
) -> dict[str, np.ndarray]:
    """Pad images into the bucket and GT to max_gt (fixed shapes).

    ``image_dtype="uint8"`` keeps un-normalized uint8 images (4x less
    host->device traffic; the jitted step normalizes on device via
    ops/image_norm.py) — requires transforms built with ``normalize=False``.
    """
    B = len(items)
    bh, bw = bucket
    G = max_gt
    batch = {
        "image": np.zeros((B, bh, bw, 3), np.dtype(image_dtype)),
        "height": np.zeros((B,), np.int32),
        "width": np.zeros((B,), np.int32),
        "image_id": np.full((B,), -1, np.int32),
        "class_idx": np.zeros((B, G), np.int32),
        "class_id": np.zeros((B, G), np.int32),
        "iscrowd": np.zeros((B, G), bool),
        "gt_valid": np.zeros((B, G), bool),
        "boxes": np.zeros((B, G, 4), np.float32),
        "boxes_normalized": np.zeros((B, G, 4), np.float32),
    }
    for b, (img, t) in enumerate(items):
        h, w = img.shape[:2]
        assert h <= bh and w <= bw, f"image ({h},{w}) exceeds bucket {bucket}"
        if image_dtype == "uint8":
            assert img.dtype == np.uint8, (
                "uint8 batches need normalize=False transforms; got "
                f"{img.dtype}"
            )
        elif img.dtype == np.uint8:
            # Transform deferred normalization to collate (4x less worker
            # IPC); padding stays exactly 0 like the reference's
            # pad-after-normalize (detr/data.py:199-203).
            from detr_tpu.data.transforms import normalize

            img = normalize(img)
        batch["image"][b, :h, :w] = img
        batch["height"][b] = h
        batch["width"][b] = w
        batch["image_id"][b] = t.get("image_id", -1)  # -1 = no dataset id
        n = min(len(t["boxes"]), G)
        if len(t["boxes"]) > G:
            # COCO's max is 93; only adversarial inputs hit this.
            import warnings

            warnings.warn(f"dropping {len(t['boxes']) - G} GT boxes beyond max_gt={G}")
        if n:
            batch["boxes"][b, :n] = t["boxes"][:n]
            batch["boxes_normalized"][b, :n] = t["boxes"][:n] / np.array(
                [w, h, w, h], np.float32
            )
            batch["class_idx"][b, :n] = t["class_idx"][:n]
            batch["class_id"][b, :n] = t["class_id"][:n]
            batch["iscrowd"][b, :n] = t["iscrowd"][:n]
            batch["gt_valid"][b, :n] = True
    return batch
