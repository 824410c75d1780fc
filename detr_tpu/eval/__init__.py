from detr_tpu.eval.coco_eval import CocoEvaluator
from detr_tpu.eval.metrics import DetectionMetrics
from detr_tpu.eval.postprocess import PostProcess, postprocess_predictions

__all__ = [
    "PostProcess",
    "postprocess_predictions",
    "CocoEvaluator",
    "DetectionMetrics",
]
