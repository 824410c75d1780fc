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

import os as _os

# Remote-TPU transport: the PJRT client keeps an op journal (every host->
# device transfer payload included) so it can transparently replay after a
# transport drop.  Long training runs transfer a fresh batch every step, so
# the journal IS an unbounded host leak — measured 13.5 MB/step (exactly one
# uint8 wire batch) on the round-3 flagship run, which the kernel OOM-killed
# at 130 GB RSS after 38 epochs.  Journal COMPACTION frees replayed-past
# entries and holds RSS flat; the cost is that a transport drop can no
# longer be replayed transparently — which this framework never relies on:
# the dispatch watchdog (utils/watchdog.py) fail-fasts such runs (exit 42)
# and checkpoint auto-restore (train/trainer.py) resumes them.  Opt back
# into replay-at-the-cost-of-RSS with DETR_TPU_JOURNAL_REPLAY=1.
if _os.environ.get("DETR_TPU_JOURNAL_REPLAY") != "1":
    _os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")

from detr_tpu.config import DETRConfig, TrainingConfig

__version__ = "0.1.0"

__all__ = ["DETRConfig", "TrainingConfig", "__version__"]
