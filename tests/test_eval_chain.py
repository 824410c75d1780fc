"""End-to-end eval-chain oracle: a perfect predictor must score AP ~1.0.

The production validation path — on-disk COCO layout -> ``CocoDataset`` ->
val transforms -> fixed-shape eval loader -> ``run_validation`` ->
``PostProcess`` -> ``DetectionMetrics``/COCOeval (reference
detr/train.py:358-458 composed with detr/utils.py:119-155 + utils.py:9-54) —
is exercised elsewhere only with models that detect nothing (AP 0) or with
unit oracles per stage.  A broken link that never raises (class-index map
off by one, resized-vs-original coordinate mismatch, image-id collision)
would keep AP pinned at 0 for every real training run while every stage's
own test stays green.  This test closes that hole: an eval step that emits
each image's ground truth as its predictions (one-hot logits on the GT
class, boxes re-encoded to the model's normalized-cxcywh output space) must
come back from the full chain with AP ~1.0 — any systematic mismatch
anywhere in the chain drives it toward 0.
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from detr_tpu.data import CocoDataset, get_val_transforms, make_eval_loader
from detr_tpu.data.make_synthetic_coco import generate_split
from detr_tpu.ops.boxes import box_xyxy_to_cxcywh
from detr_tpu.train.trainer import run_validation

NUM_CLASSES = 80


def _perfect_eval_step(params, frozen, batch):
    """Predicts exactly the batch's own GT, in the model's output format:
    (B, layers, Q, C+1) logits and (B, layers, Q, 4) normalized cxcywh."""
    boxes = np.asarray(batch["boxes"])  # (B, G, 4) XYXY, resized coords
    valid = np.asarray(batch["gt_valid"])
    cls = np.asarray(batch["class_idx"])
    h = np.asarray(batch["height"]).astype(np.float32)
    w = np.asarray(batch["width"]).astype(np.float32)
    B, G, _ = boxes.shape

    logits = np.full((B, G, NUM_CLASSES + 1), -10.0, np.float32)
    pred = np.tile(
        np.array([0.5, 0.5, 0.01, 0.01], np.float32), (B, G, 1)
    )
    for b in range(B):
        scale = np.array([w[b], h[b], w[b], h[b]], np.float32)
        for q in range(G):
            if valid[b, q]:
                logits[b, q, cls[b, q]] = 10.0
                pred[b, q] = np.asarray(
                    box_xyxy_to_cxcywh(jnp.asarray(boxes[b, q] / scale))
                )
            else:
                logits[b, q, NUM_CLASSES] = 10.0  # confident no-object
    outputs = {
        "pred_logits": jnp.asarray(logits)[:, None],
        "pred_boxes": jnp.asarray(pred)[:, None],
    }
    return outputs, {"loss": jnp.float32(0.0)}


def test_run_validation_perfect_predictor_reaches_ap1(tmp_path):
    root = str(tmp_path / "coco")
    generate_split(root, "validation", 10, seed=3)
    dataset = CocoDataset(root, "validation", get_val_transforms())
    assert dataset.num_classes == NUM_CLASSES
    loader = make_eval_loader(
        dataset, batch_size=4, max_gt=25, num_workers=0
    )

    state = SimpleNamespace(params={}, frozen={})
    metrics = run_validation(
        (_perfect_eval_step, state), loader, dataset.class_names
    )

    # Perfect predictions through the whole chain: AP at every IoU
    # threshold, including 0.95 (boxes roundtrip through fp32
    # normalize/denormalize only).
    assert metrics["AP50"] > 0.999, metrics["AP50"]
    assert metrics["AP"] > 0.99, metrics["AP"]
    # Per-class APs for classes present in the 10 images must be perfect
    # too — a class-index shift would park them at 0 while pooled AP could
    # stay high under a different aggregation bug.
    seen = {
        int(c)
        for i in range(len(dataset))
        for c in np.atleast_1d(dataset[i][1]["class_idx"])
    }
    assert seen, "synthetic val split unexpectedly empty of GT"
    for c in seen:
        name = dataset.class_names[c]
        assert metrics[f"AP-per-class/{name}"] > 0.99, (c, name)
