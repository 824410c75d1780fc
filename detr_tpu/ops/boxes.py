"""Pure-JAX box geometry.

TPU-native replacement for the torchvision C++/CUDA ops the reference leans on
(``box_area`` at reference detr/utils.py:4, ``generalized_box_iou_loss`` at
reference detr/loss.py:15, and the XYXY<->CXCYWH format converters used at
reference detr/matcher.py:85-89).  Everything here is shape-polymorphic over
leading batch dims, differentiable, and jit/vmap friendly — no asserts, no
data-dependent control flow.  Degenerate/padded boxes are handled with safe
division instead of the reference's runtime asserts (reference
detr/utils.py:87-88); callers mask invalid entries out of reductions.

Computations are fp32 islands regardless of the surrounding compute dtype:
matcher costs and GIoU are precision-sensitive (SURVEY §7 "hard parts" #4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-9


def _f32(x: Array) -> Array:
    return x.astype(jnp.float32)


def box_cxcywh_to_xyxy(boxes: Array) -> Array:
    """(…, 4) [cx, cy, w, h] -> [x0, y0, x1, y1]."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(boxes: Array) -> Array:
    """(…, 4) [x0, y0, x1, y1] -> [cx, cy, w, h]."""
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [0.5 * (x0 + x1), 0.5 * (y0 + y1), x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: Array) -> Array:
    """(…, 4) XYXY -> (…,) area."""
    boxes = _f32(boxes)
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: Array, boxes2: Array) -> tuple[Array, Array]:
    """Pairwise IoU of two XYXY box sets (reference detr/utils.py:57-70).

    Args:
      boxes1: (…, N, 4), boxes2: (…, M, 4) — leading dims broadcast.
    Returns:
      (iou, union), each (…, N, M), fp32.
    """
    boxes1, boxes2 = _f32(boxes1), _f32(boxes2)
    area1 = box_area(boxes1)  # (…, N)
    area2 = box_area(boxes2)  # (…, M)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]  # (…, N, M)

    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, _EPS)
    return iou, union


def generalized_box_iou(boxes1: Array, boxes2: Array) -> Array:
    """Pairwise GIoU (https://giou.stanford.edu/), XYXY inputs.

    Matches reference detr/utils.py:73-97 on valid boxes; padded/degenerate
    boxes produce finite garbage the caller masks out (the reference asserts
    instead, which cannot run under jit).
    Returns (…, N, M) fp32 in (-1, 1].
    """
    boxes1, boxes2 = _f32(boxes1), _f32(boxes2)
    iou, union = box_iou(boxes1, boxes2)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    hull = wh[..., 0] * wh[..., 1]

    return iou - (hull - union) / jnp.maximum(hull, _EPS)


def elementwise_box_iou(boxes1: Array, boxes2: Array) -> tuple[Array, Array]:
    """IoU of aligned box pairs: both (…, 4) -> ((…,), (…,))."""
    boxes1, boxes2 = _f32(boxes1), _f32(boxes2)
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, _EPS), union


def elementwise_generalized_box_iou(boxes1: Array, boxes2: Array) -> Array:
    """GIoU of aligned box pairs (the loss path: reference detr/loss.py:158-162

    uses torchvision's ``generalized_box_iou_loss`` = 1 - this)."""
    boxes1, boxes2 = _f32(boxes1), _f32(boxes2)
    iou, union = elementwise_box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, _EPS)


def top1_accuracy(logits: Array, targets: Array, valid: Array) -> Array:
    """Masked top-1 accuracy in percent (reference detr/utils.py:100-116).

    Args:
      logits: (N, C), targets: (N,), valid: (N,) bool.
    Returns scalar fp32 accuracy over valid rows (0 when none are valid,
    matching the reference's empty-target early-return).
    """
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.where(valid, (pred == targets).astype(jnp.float32), 0.0)
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return 100.0 * jnp.sum(correct) / denom


def clamp_boxes(boxes: Array, height: Array, width: Array) -> Array:
    """Clamp XYXY boxes into [0,w]x[0,h] (reference detr/data.py:55 clamp)."""
    boxes = _f32(boxes)
    h = _f32(height)[..., None]
    w = _f32(width)[..., None]
    x0 = jnp.clip(boxes[..., 0:1], 0.0, w)
    y0 = jnp.clip(boxes[..., 1:2], 0.0, h)
    x1 = jnp.clip(boxes[..., 2:3], 0.0, w)
    y1 = jnp.clip(boxes[..., 3:4], 0.0, h)
    return jnp.concatenate([x0, y0, x1, y1], axis=-1)
