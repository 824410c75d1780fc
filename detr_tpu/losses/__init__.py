from detr_tpu.losses.criterion import SetCriterion, total_loss

__all__ = ["SetCriterion", "total_loss"]
