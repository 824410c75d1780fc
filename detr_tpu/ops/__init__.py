from detr_tpu.ops.boxes import (
    box_area,
    box_cxcywh_to_xyxy,
    box_iou,
    box_xyxy_to_cxcywh,
    elementwise_box_iou,
    elementwise_generalized_box_iou,
    generalized_box_iou,
)
from detr_tpu.ops.position_encoding import (
    batch_positional_encoding,
    positional_encoding,
    sine_position_embedding,
)

__all__ = [
    "box_area",
    "box_cxcywh_to_xyxy",
    "box_xyxy_to_cxcywh",
    "box_iou",
    "elementwise_box_iou",
    "elementwise_generalized_box_iou",
    "generalized_box_iou",
    "positional_encoding",
    "batch_positional_encoding",
    "sine_position_embedding",
]
