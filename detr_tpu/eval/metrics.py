"""DetectionMetrics: the reference's torchmetrics wrapper, re-homed.

Same interface and output keys as reference detr/utils.py:9-54
(update(preds, batch) / compute() / reset(), AP / AP50 / AP75 /
AP-large / AP-medium / AP-small + per-class "AP-per-class/<name>"), backed by
the from-scratch numpy COCO evaluator instead of
torchmetrics+pycocotools.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from detr_tpu.eval.coco_eval import CocoEvaluator


class DetectionMetrics:
    def __init__(self, class_names: Sequence[str]):
        self.class_names = list(class_names)
        self.evaluator = CocoEvaluator(len(self.class_names), self.class_names)
        self._n_auto = 0

    def update(self, preds: List[dict], batch: dict) -> None:
        """preds: per-image dicts {boxes XYXY, scores, labels} (PostProcess

        output); batch: fixed-shape arrays with boxes / class_idx / iscrowd /
        gt_valid / image_id (bucketed-loader format).  A trailing
        ``pad_count`` > 0 marks repeated padding items to skip."""
        B = len(preds)
        pad = int(batch.get("pad_count", 0))
        for i in range(B - pad):
            valid = np.asarray(batch["gt_valid"][i])
            image_id = int(np.asarray(batch["image_id"][i]))
            if image_id < 0:
                # -1 sentinel = "no dataset id" (bucketing.assemble_batch
                # default).  Auto ids live in a negative namespace so a
                # legitimate id (COCO ids are non-negative, synthetic sets
                # may start at 0) can never collide with them.
                self._n_auto += 1
                image_id = -self._n_auto - 1
            self.evaluator.add_image(
                image_id=image_id,
                det_boxes=np.asarray(preds[i]["boxes"]),
                det_scores=np.asarray(preds[i]["scores"]),
                det_labels=np.asarray(preds[i]["labels"]),
                gt_boxes=np.asarray(batch["boxes"][i])[valid],
                gt_labels=np.asarray(batch["class_idx"][i])[valid],
                gt_iscrowd=np.asarray(batch["iscrowd"][i])[valid],
            )

    def compute(self) -> dict:
        out = self.evaluator.compute()
        metrics = {
            "AP": out["AP"],
            "AP50": out["AP50"],
            "AP75": out["AP75"],
            "AP-large": out["AP-large"],
            "AP-medium": out["AP-medium"],
            "AP-small": out["AP-small"],
        }
        per_class = out["per_class"]
        for name, ap in zip(self.class_names, per_class):
            # classes never seen get 0 like the reference's zero-filled
            # tensor (detr/utils.py:47-48)
            metrics[f"AP-per-class/{name}"] = float(ap) if ap > -1 else 0.0
        return metrics

    def reset(self) -> None:
        self.evaluator.reset()
        self._n_auto = 0
