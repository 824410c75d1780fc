"""Model-output -> detection post-processing.

Equivalent of the reference ``PostProcess`` (detr/utils.py:119-155): softmax
over class logits, drop the no-object column, per-query best class + score,
cxcywh -> xyxy, scale to original image size, optional score threshold.

Split TPU-natively into (a) a jittable fixed-shape array stage
(:func:`postprocess_predictions`) and (b) a host stage (:class:`PostProcess`)
that applies the score threshold and emits the reference's per-image dict
format {scores, labels, boxes, class_names}.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from detr_tpu.ops.boxes import box_cxcywh_to_xyxy

Array = jax.Array


@jax.jit
def postprocess_predictions(
    pred_logits: Array,
    pred_boxes: Array,
    image_heights: Array,
    image_widths: Array,
) -> dict[str, Array]:
    """Fixed-shape detection arrays from final-layer outputs.

    Args:
      pred_logits: (B, Q, C+1); pred_boxes (B, Q, 4) normalized cxcywh;
      image_heights/widths: (B,) valid pixel extents.
    Returns {scores (B, Q), labels (B, Q), boxes (B, Q, 4) XYXY pixels}.
    """
    probs = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    # exclude the no-object column (reference utils.py:141)
    obj_probs = probs[..., :-1]
    scores = jnp.max(obj_probs, axis=-1)
    labels = jnp.argmax(obj_probs, axis=-1).astype(jnp.int32)

    boxes = box_cxcywh_to_xyxy(pred_boxes.astype(jnp.float32))
    scale = jnp.stack(
        [image_widths, image_heights, image_widths, image_heights], axis=-1
    ).astype(jnp.float32)
    boxes = boxes * scale[:, None, :]
    return {"scores": scores, "labels": labels, "boxes": boxes}


class PostProcess:
    """Host-side wrapper matching reference detr/utils.py:119-155 output."""

    def __init__(self, class_names: Optional[Sequence[str]] = None):
        self.class_names = list(class_names) if class_names is not None else None

    def __call__(
        self,
        pred_logits,
        pred_boxes,
        image_heights,
        image_widths,
        score_threshold: float = 0.0,
    ) -> list[dict]:
        out = postprocess_predictions(
            jnp.asarray(pred_logits),
            jnp.asarray(pred_boxes),
            jnp.asarray(image_heights),
            jnp.asarray(image_widths),
        )
        scores = np.asarray(out["scores"])
        labels = np.asarray(out["labels"])
        boxes = np.asarray(out["boxes"])

        results = []
        for s, l, b in zip(scores, labels, boxes):
            keep = s >= score_threshold
            item = {"scores": s[keep], "labels": l[keep], "boxes": b[keep]}
            if self.class_names is not None:
                item["class_names"] = [self.class_names[i] for i in l[keep]]
            results.append(item)
        return results
