from detr_tpu.data.bucketing import (
    DEFAULT_BUCKETS,
    EVAL_BUCKET,
    EVAL_BUCKETS,
    assemble_batch,
    fit_to_bucket,
    pick_bucket,
)
from detr_tpu.data.coco import CocoDataset
from detr_tpu.data.loader import BucketedLoader, make_eval_loader
from detr_tpu.data.prefetch import prefetch_to_device
from detr_tpu.data.synthetic import SyntheticCocoDataset, synthetic_batch
from detr_tpu.data.transforms import get_train_transforms, get_val_transforms

__all__ = [
    "synthetic_batch",
    "SyntheticCocoDataset",
    "CocoDataset",
    "BucketedLoader",
    "make_eval_loader",
    "prefetch_to_device",
    "get_train_transforms",
    "get_val_transforms",
    "DEFAULT_BUCKETS",
    "EVAL_BUCKET",
    "EVAL_BUCKETS",
    "assemble_batch",
    "pick_bucket",
    "fit_to_bucket",
]
