"""Learning-rate schedule: linear warmup -> hold -> cosine, stepped per epoch.

Reproduces the reference's ``SequentialLR`` of LinearLR -> constant LambdaLR
-> CosineAnnealingLR (reference detr/train.py:187-204), including the
per-*epoch* stepping (reference detr/train.py:288): within an epoch the LR is
constant.

``make_epoch_lr_schedule`` is the primary form (epoch -> lr), evaluated on
the host once per epoch by the trainer, which injects the value into the
optimizer state (see train/optimizer.py) — exactly the torch
``scheduler.step()``-per-epoch mechanism.  ``make_lr_schedule`` is the
step-indexed view (epoch = step // steps_per_epoch) kept for analysis/tests.

torch semantics reproduced exactly:
  * LinearLR(start_factor=warmup_decay, total_iters=W):
      factor(e) = start + (1 - start) * min(e, W) / W
  * constant phase: factor 1.0 for ``hold`` epochs;
  * CosineAnnealingLR(T_max=cooldown, eta_min):
      lr(t) = eta_min + (base - eta_min) * (1 + cos(pi * t / T_max)) / 2
    with t = epochs into the cosine phase.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_epoch_lr_schedule(
    base_lr: float,
    *,
    epochs: int,
    warmup_epochs: int = 5,
    warmup_decay: float = 0.01,
    hold_epochs: int = 35,
    lr_min: float = 3e-6,
):
    """Returns epoch (int) -> lr (fp32 scalar)."""
    cooldown = max(epochs - warmup_epochs - hold_epochs, 1)

    def schedule(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)

        # warmup factor (torch LinearLR)
        w = jnp.minimum(epoch, warmup_epochs) / max(warmup_epochs, 1)
        warmup_lr = base_lr * (warmup_decay + (1.0 - warmup_decay) * w)

        # cosine (torch CosineAnnealingLR), t clipped into [0, cooldown]
        t = jnp.clip(epoch - warmup_epochs - hold_epochs, 0.0, cooldown)
        cos_lr = lr_min + (base_lr - lr_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / cooldown)
        )

        in_warmup = epoch < warmup_epochs
        in_hold = epoch < warmup_epochs + hold_epochs
        return jnp.where(in_warmup, warmup_lr, jnp.where(in_hold, base_lr, cos_lr))

    return schedule


def make_lr_schedule(
    base_lr: float,
    *,
    epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 5,
    warmup_decay: float = 0.01,
    hold_epochs: int = 35,
    lr_min: float = 3e-6,
):
    """Step-indexed view: step (int) -> lr; the epoch index is
    ``step // steps_per_epoch``."""
    epoch_schedule = make_epoch_lr_schedule(
        base_lr,
        epochs=epochs,
        warmup_epochs=warmup_epochs,
        warmup_decay=warmup_decay,
        hold_epochs=hold_epochs,
        lr_min=lr_min,
    )

    def schedule(step):
        return epoch_schedule(
            jnp.asarray(step, jnp.float32) // max(steps_per_epoch, 1)
        )

    return schedule
