"""detr_tpu — a TPU-native (JAX / XLA / Pallas / pjit) object-detection framework.

Re-designed from scratch with the full capabilities of the PyTorch reference
``anenbergb/DETR-object-detection`` (see SURVEY.md): DETR with a frozen-BN
ResNet-50/101 backbone, a pre-LayerNorm transformer encoder-decoder with learned
object queries, an on-device batched Hungarian matcher, the set-prediction loss
(weighted CE + L1 + GIoU with per-decoder-layer auxiliary supervision), a
fixed-shape aspect-ratio-bucketed COCO input pipeline, and a pjit data-parallel
trainer with bf16, gradient accumulation, warmup/hold/cosine LR, checkpointing,
COCO mAP eval and visualization.

Everything on the training hot path is fixed-shape and jit-compiled: raggedness
lives only in the host input pipeline and is encoded on device as padded arrays
plus validity masks.
"""

from detr_tpu.config import DETRConfig, TrainingConfig

__version__ = "0.1.0"

__all__ = ["DETRConfig", "TrainingConfig", "__version__"]
