from detr_tpu.utils.logging import MetricLogger, format_loss_for_logging
from detr_tpu.utils.profiling import StepTimer, enable_debug, trace

__all__ = [
    "MetricLogger",
    "format_loss_for_logging",
    "StepTimer",
    "enable_debug",
    "trace",
]
