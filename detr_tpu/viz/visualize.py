"""Detection visualization (PIL; no torchvision).

Equivalent of reference detr/visualize.py:
  * ``plot`` (reference visualize.py:24-116) — draw labeled boxes on one
    image (de-normalizing float images), return an RGB ndarray;
  * ``plot_grid`` (reference visualize.py:12-20) — list of per-image dicts
    -> one grid image for tensorboard;
  * ``render_bounding_boxes`` (reference visualize.py:119-161) — PIL-draw
    COCO-format annotations onto a PIL image.

Images are HWC (channels-last, this framework's native layout; the reference
uses CHW tensors).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

from detr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

_COLORS = [
    "red",
    "green",
    "blue",
    "orange",
    "purple",
    "cyan",
    "magenta",
    "yellow",
]


def _denormalize(img: np.ndarray) -> np.ndarray:
    """float normalized HWC -> uint8 (reference visualize.py de-norm step)."""
    if img.dtype == np.uint8:
        return img
    x = img * IMAGENET_STD + IMAGENET_MEAN
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def plot(
    image: np.ndarray,
    boxes: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    scores: Optional[np.ndarray] = None,
    masks: Optional[np.ndarray] = None,
    box_color: str = "red",
    width: int = 2,
    font_size: int = 12,
    mask_color: tuple[int, int, int] = (0, 128, 0),
    mask_alpha: float = 0.65,
) -> np.ndarray:
    """Draw XYXY pixel boxes + labels on one image; returns RGB uint8 HWC.

    ``masks`` is (N, H, W) boolean — overlaid at ``mask_alpha`` like the
    reference's ``draw_segmentation_masks`` call (visualize.py:87-93)."""
    base = _denormalize(np.asarray(image))
    if masks is not None:
        masks = np.asarray(masks).astype(bool)
        union = masks.any(axis=0) if masks.ndim == 3 else masks
        blended = base.astype(np.float32)
        color = np.asarray(mask_color, np.float32)
        blended[union] = (1.0 - mask_alpha) * blended[union] + mask_alpha * color
        base = blended.astype(np.uint8)
    img = Image.fromarray(base)
    draw = ImageDraw.Draw(img)
    if boxes is not None:
        for i, box in enumerate(np.asarray(boxes).reshape(-1, 4)):
            draw.rectangle([float(v) for v in box], outline=box_color, width=width)
            label = ""
            if class_names is not None and i < len(class_names):
                label = str(class_names[i])
            if scores is not None and i < len(scores):
                label = f"{label} {float(scores[i]):.2f}".strip()
            if label:
                draw.text((float(box[0]) + 2, float(box[1]) + 2), label, fill=box_color)
    return np.asarray(img)


def plot_grid(
    batch_items: Sequence[dict],
    max_images: int = 25,
    num_cols: int = 5,
    font_size: int = 12,
    box_color: str = "green",
    fig_scaling: float = 1.0,
) -> np.ndarray:
    """Per-image dicts {image, boxes, class_names?, scores?} -> grid ndarray

    (reference visualize.py:12-20 signature kept for parity)."""
    items = list(batch_items)[:max_images]
    if not items:
        return np.zeros((2, 2, 3), np.uint8)
    rendered = [
        plot(
            it["image"],
            it.get("boxes"),
            it.get("class_names"),
            it.get("scores"),
            it.get("masks"),
            box_color=box_color,
            font_size=font_size,
        )
        for it in items
    ]
    cell_h = max(r.shape[0] for r in rendered)
    cell_w = max(r.shape[1] for r in rendered)
    cols = min(num_cols, len(rendered))
    rows = -(-len(rendered) // cols)
    grid = np.zeros((rows * cell_h, cols * cell_w, 3), np.uint8)
    for i, r in enumerate(rendered):
        y, x = divmod(i, cols)
        grid[y * cell_h : y * cell_h + r.shape[0], x * cell_w : x * cell_w + r.shape[1]] = r
    return grid


def render_bounding_boxes(
    image: Image.Image,
    annotations: Sequence[dict],
    class_id2name: Optional[dict] = None,
    color: str = "red",
    width: int = 2,
) -> Image.Image:
    """Draw COCO-format annotations (XYWH bbox) onto a PIL image

    (reference visualize.py:119-161)."""
    img = image.copy()
    draw = ImageDraw.Draw(img)
    for i, ann in enumerate(annotations):
        x, y, w, h = ann["bbox"]
        c = color or _COLORS[i % len(_COLORS)]
        draw.rectangle([x, y, x + w, y + h], outline=c, width=width)
        if class_id2name and "category_id" in ann:
            draw.text((x + 2, y + 2), str(class_id2name.get(ann["category_id"], "?")), fill=c)
    return img
