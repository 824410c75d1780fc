"""Typed configuration dataclasses.

Capability parity with the reference's two config dataclasses
(``DETRConfig`` at reference detr/model.py:13-28 and ``TrainingConfig`` at
reference detr/train.py:30-103), extended with TPU-native fields (mesh shape,
shape buckets, Pallas toggles, donation).  Field names follow the reference
wherever a field has a reference counterpart so users can migrate configs 1:1.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple, Union


@dataclass
class DETRConfig:
    """Model hyperparameters (reference detr/model.py:13-28).

    Defaults reproduce DETR-R50: 100 queries, 6+6 transformer layers, 8 heads,
    d_model 256, FFN 2048 (256*8), dropout 0.1, 80 COCO classes (+1 no-object).
    """

    backbone: str = "resnet50"  # "resnet50" | "resnet101"
    # Dilated C5 variant (DETR-DC5): stride-16 final stage via dilation, 2x tokens.
    dilation: bool = False
    temperature: int = 10000  # positional-encoding frequency temperature
    num_object_queries: int = 100
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_attention_heads: int = 8
    hidden_size: int = 256
    ffn_scale_factor: int = 8  # FFN width = hidden_size * 8 = 2048
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    box_embedding_mlp_num_layers: int = 3
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-5
    num_classes: int = 80

    # --- TPU-native fields (no reference counterpart) ---
    # Compute dtype for the jitted forward/backward (params stay fp32).
    dtype: str = "bfloat16"
    # Padding-mask semantics. The reference's mask builder
    # (detr/model.py:96-114) only marks the bottom-right *corner*
    # (rows >= h AND cols >= w) — a bug vs official DETR, which masks the full
    # L-shaped pad region. "full" fixes the bug (our default); "corner"
    # reproduces the reference bit-for-bit for golden parity tests.
    padding_mask_mode: str = "full"  # "full" | "corner"
    # Use the fused Pallas masked-flash-attention kernels (fwd + bwd, with
    # in-kernel hash-mask dropout) for every attention without an explicit
    # (L, S) attention_mask — encoder/decoder self- and cross-attention,
    # train and eval.  "auto" (default): on for real TPU backends, off on
    # CPU (where the kernel would run in the slow interpreter — tests opt in
    # explicitly).  True forces the kernel everywhere; False never uses it.
    use_pallas_attention: Union[bool, str] = "auto"
    # Load pretrained backbone weights from this .npz (converted from
    # torchvision via models/convert.py); None → random init.
    backbone_weights: Optional[str] = None
    # Rematerialize encoder/decoder layers in the backward pass
    # (jax.checkpoint): trades ~30% extra FLOPs for O(num_layers) less
    # activation HBM — lets bigger batches/DC5 fit on one chip.
    remat: bool = False

    @property
    def head_size(self) -> int:
        assert self.hidden_size % self.num_attention_heads == 0
        return self.hidden_size // self.num_attention_heads

    @property
    def ffn_hidden_size(self) -> int:
        return self.hidden_size * self.ffn_scale_factor

    @property
    def backbone_stride(self) -> int:
        """Total stride of the extracted feature map (reference model.py:435)."""
        return 16 if self.dilation else 32

    @property
    def backbone_channels(self) -> int:
        return 2048

    def replace(self, **kw) -> "DETRConfig":
        return dataclasses.replace(self, **kw)


@dataclass
class TrainingConfig:
    """Trainer hyperparameters (reference detr/train.py:30-103).

    Every reference field is preserved; TPU-native fields are grouped at the
    bottom.
    """

    output_dir: str = "runs/detr"
    start_epoch: int = 0
    resume_from_checkpoint: Optional[str] = None

    coco_dataset_root: str = "datasets/coco-2017"

    # Effective batch 64 via gradient accumulation (reference train.py:40-42,116)
    cumulative_train_batch_size: int = 64
    train_batch_size: int = 5
    val_batch_size: int = 25

    epochs: int = 100
    limit_train_iters: int = 0
    limit_val_iters: int = 0

    # Warmup -> hold -> cosine schedule, stepped once per epoch
    # (reference train.py:48-64,187-204).
    lr: float = 3e-4
    lr_backbone: float = 3e-5  # backbone always 10x lower
    lr_warmup_epochs: int = 5
    lr_warmup_decay: float = 0.01
    lr_hold_max_epochs: int = 35
    lr_min: float = 3e-6

    weight_decay: float = 1e-4
    # Declared by the reference (train.py:68) but never wired into its
    # optimizer. None (default) reproduces that: every param decays at
    # ``weight_decay``. Setting a float actually applies that rate to
    # LayerNorm params instead (see train/optimizer.py).
    norm_weight_decay: Optional[float] = None
    gradient_max_norm: float = 1.0

    # "bf16" (reference train.py:75 autocast equivalent: fp32 params, bf16
    # compute with fp32 islands) or "no" (fp32 everywhere). The trainer maps
    # this onto DETRConfig.dtype.
    mixed_precision: str = "bf16"  # "bf16" | "no"

    checkpoint_total_limit: int = 3
    checkpoint_epochs: int = 1
    # Log GT/prediction image grids only on eval epochs that are multiples of
    # this (the reference declares it at train.py:79 but never reads it).
    save_image_epochs: int = 1
    # Declared by the reference (train.py:33) and dead there too — checkpoints
    # are written into output_dir unconditionally; kept for config parity.
    overwrite_output_dir: bool = True
    seed: int = 0
    log_frequency: int = 100

    num_workers: int = 2

    # eval
    # Declared by the reference (train.py:86-87) and dead there too (its
    # SanitizeBoundingBoxes runs on torchvision defaults); kept for config
    # parity only.
    box_min_size: float = 5.0
    box_min_area: float = 50.0
    eval_epochs: int = 10

    # Matcher cost weights (reference train.py:90-96)
    set_cost_class: float = 1.0
    set_cost_bbox: float = 5.0
    set_cost_giou: float = 2.0

    # Loss coefficients (reference train.py:98-103)
    label_ce_loss_coef: float = 1.0
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    eos_coef: float = 0.1

    # --- TPU-native fields (no reference counterpart) ---
    # Data-parallel mesh size (number of chips along the "data" axis). 0 means
    # "all visible devices".
    num_devices: int = 0
    # Tensor (model) parallelism: size of the mesh's "model" axis.  >1
    # shards attention heads and FFN hidden Megatron-style over adjacent
    # chips (parallel/tp.py); num_attention_heads must divide by it.
    # Single-process meshes only (DP spans hosts, TP stays within one).
    model_parallel: int = 1
    # Aspect-ratio buckets as (height, width) pairs the jitted step compiles
    # for; images are padded to the smallest bucket that fits (SURVEY §7.5).
    # The defaults COVER the reference train-augmentation envelope (shortest
    # side 480-800, longest <= 1333, detr/data.py:20-63): an 800x1067
    # augmented sample must land in a bucket at full resolution, not be
    # silently downscaled below the resolution the reference trains at.
    # Speed/resolution can be traded explicitly via --shape-buckets.
    shape_buckets: Tuple[Tuple[int, int], ...] = (
        (832, 1344),
        (1344, 832),
        (1056, 1056),
    )
    # Eval compiles for this fixed shape plus its transpose (portrait images
    # keep full resolution); shortest side 800, max side 1333 rounded to /32
    # — reference val transform detr/data.py:66-83.
    eval_shape: Tuple[int, int] = (800, 1344)
    # Val-resize envelope (reference detr/data.py:66-83 hardcodes 800/1333).
    # Dialable for resolution-curriculum phases (PARITY.md root-cause #4:
    # token count gates classifier escape speed from a from-scratch trunk),
    # where honest AP must be measured at the scale the phase trains at.
    val_min_size: int = 800
    val_max_size: int = 1333
    # Maximum number of GT boxes per image after padding (COCO max is 93;
    # boxes beyond this are dropped with a warning).
    max_gt_boxes: int = 100
    # Donate the train-state buffers to the jitted step (halves HBM).
    donate_state: bool = True
    # Device batches kept ready ahead of the step by the background
    # prefetcher (data/prefetch.py); 0 disables the prefetch thread.
    prefetch_depth: int = 2
    # Ship augmented images to the chip as uint8 and normalize inside the
    # jitted step (4x less host->device bandwidth; ops/image_norm.py).
    # False reverts to host-side fp32 normalization.
    device_normalize: bool = True
    # Device-resize wire (ops/device_resize.py): ship SOURCE-resolution
    # uint8 pixels (~2.5-4x fewer host->device bytes than the padded
    # augmented-target canvas) and resample on the MXU inside the jitted
    # step; also removes the host resample (~45% of the augmentation
    # chain).  Source canvases derive from shape_buckets
    # (data/bucketing.derive_source_buckets) unless source_buckets is set.
    device_resize: bool = False
    source_buckets: Optional[tuple] = None
    # From-scratch-trunk frozen-BN stat refresh period in epochs (0 = off,
    # reference parity: the reference only ever trains from ImageNet
    # weights whose stats match the weights, reference detr/model.py:432).
    # A random-init trunk calibrated ONCE at startup drifts away from its
    # frozen stats as the conv weights train: measured at mid-scale epoch
    # 35, layer4 activations reached |~3.4e4| and the projected residual
    # stream |~6.3e5| — the encoder layers' O(1) contributions become
    # numerically invisible (especially in bf16) and gradient norms sit at
    # 25-60 against clip 1.0, throttling learning ~50x.  Recalibrating
    # every N epochs (models/resnet.calibrate_frozen_bn on the startup
    # sample batch) keeps activations O(1); stats stay constant WITHIN an
    # epoch, preserving frozen-BN step semantics.
    bn_recalibrate_epochs: int = 0
    # Train-time photometric distort (reference detr/data.py:36).  True =
    # reference parity.  False drops it — required for learning-proof runs
    # on the synthetic color-coded dataset, where the distort's p=0.5
    # channel permutation + hue rotation relabel ~44.5% of crops to a
    # wrong class's color signature (data/transforms.py TrainTransform
    # docstring; tests/test_transforms.py palette-confusion test).
    photometric_distort: bool = True
    # Final epsilon for the on-device auction matcher during training
    # (looser than the 1e-4 parity default: ~25% fewer solver rounds; the
    # matching slack bound 2*eps*G is negligible vs loss magnitudes).
    matcher_eps_min: float = 1e-3
    # Materialize the previous step's loss every N steps.  Bounds the
    # host's async dispatch run-ahead to ~2 steps: without it, a stalled
    # device lets the loop enqueue the whole epoch (each queued step pins
    # its batch buffers — observed 22 GB RSS on a wedged transport) and a
    # hang surfaces only at the next log line.  The fetch overlaps the
    # in-flight step, so steady-state throughput is unaffected.  0 = off.
    dispatch_sync_steps: int = 1
    # Fail-fast when no step/eval/checkpoint completes for this long
    # (utils/watchdog.py exits WEDGED_EXIT_CODE=42 so a retry wrapper can
    # relaunch; checkpoint auto-restore resumes the run).  Must exceed the
    # longest legitimate gap — a cold-cache XLA compile of the fused step
    # through the relay (~13 min observed).  0 disables.
    watchdog_secs: float = 1200.0
    # Host-RSS self-restart threshold (GB).  Defense in depth behind the
    # journal-compaction fix (detr_tpu/__init__.py): if ANY host-side
    # retention regresses, the trainer exits WEDGED_EXIT_CODE=42 at the
    # next epoch boundary past the limit (checkpointed — zero lost work)
    # or immediately at 1.25x the limit (auto-restore loses at most the
    # current epoch), instead of growing until the kernel OOM-kills it at
    # exit 137 — the one long-run failure the round-3 flagship run died
    # to.  0 disables.
    host_rss_limit_gb: float = 64.0

    @property
    def gradient_accumulation_steps(self) -> int:
        return max(1, self.cumulative_train_batch_size // self.train_batch_size)

    def replace(self, **kw) -> "TrainingConfig":
        return dataclasses.replace(self, **kw)
