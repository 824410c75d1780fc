from detr_tpu.utils.logging import MetricLogger, format_loss_for_logging

__all__ = ["MetricLogger", "format_loss_for_logging"]
