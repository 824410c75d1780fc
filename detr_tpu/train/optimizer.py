"""Optimizer assembly: AdamW with two LR groups + clip + accumulation.

Reproduces the reference's optimizer semantics (detr/train.py:172-204,
116-123, 265-267):
  * AdamW (torch defaults: betas 0.9/0.999, eps 1e-8), weight decay 1e-4
    applied to every trainable param (the reference declares
    ``norm_weight_decay`` but never wires it — we honor it when set);
  * two parameter groups — backbone convs at ``lr_backbone`` (10x lower),
    everything else at ``lr`` — implemented with ``optax.multi_transform``
    over a top-level "backbone"/"rest" label tree;
  * global-norm gradient clipping at ``gradient_max_norm``;
  * gradient accumulation via ``optax.MultiSteps`` (HF Accelerate's
    ``accumulate`` equivalent).  Documented divergence: the reference's
    ``clip_grad_norm_`` runs on the partially-accumulated gradient every
    micro-step (an Accelerate quirk); we clip the final averaged gradient —
    the standard behavior the clipping is meant to have.

The frozen-BN statistics live in a separate variable collection and never
reach the optimizer (reference parity: FrozenBatchNorm2d has no trainable
params).
"""

from __future__ import annotations

from typing import Callable, Optional

import optax

from detr_tpu.config import TrainingConfig
from detr_tpu.train.schedule import make_lr_schedule


def backbone_label_fn(params) -> dict:
    """Label tree: top-level 'backbone' subtree vs the rest

    (reference detr/train.py:172-182 splits param groups on the name
    containing "backbone")."""
    return {k: ("backbone" if k == "backbone" else "rest") for k in params}


def build_optimizer(
    config: TrainingConfig,
    steps_per_epoch: int,
    *,
    start_epoch: int = 0,
    norm_mask_fn: Optional[Callable] = None,
) -> tuple[optax.GradientTransformation, dict[str, Callable]]:
    """Returns (tx, schedules) where schedules maps group name -> lr schedule
    (for logging parity with reference train.py:269-275).

    ``start_epoch`` offsets the schedule like the reference's scheduler
    fast-forward on weights-only resume (detr/train.py:238-241)."""

    offset = start_epoch * steps_per_epoch

    def sched(base_lr):
        base = make_lr_schedule(
            base_lr,
            epochs=config.epochs,
            steps_per_epoch=steps_per_epoch,
            warmup_epochs=config.lr_warmup_epochs,
            warmup_decay=config.lr_warmup_decay,
            hold_epochs=config.lr_hold_max_epochs,
            # torch CosineAnnealingLR uses one absolute eta_min for every
            # param group (reference train.py:199) — including the backbone.
            lr_min=config.lr_min,
        )
        if offset == 0:
            return base
        return lambda step: base(step + offset)

    schedules = {
        "backbone": sched(config.lr_backbone),
        "rest": sched(config.lr),
    }

    def adamw(schedule):
        return optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=config.weight_decay,
        )

    tx = optax.chain(
        optax.clip_by_global_norm(config.gradient_max_norm),
        optax.multi_transform(
            {"backbone": adamw(schedules["backbone"]), "rest": adamw(schedules["rest"])},
            backbone_label_fn,
        ),
    )

    accum = config.gradient_accumulation_steps
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedules
