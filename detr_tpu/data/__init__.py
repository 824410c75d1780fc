from detr_tpu.data.synthetic import synthetic_batch, SyntheticCocoDataset

__all__ = ["synthetic_batch", "SyntheticCocoDataset"]
