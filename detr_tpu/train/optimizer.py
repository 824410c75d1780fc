"""Optimizer assembly: AdamW with two LR groups + clip + accumulation.

Reproduces the reference's optimizer semantics (detr/train.py:172-204,
116-123, 265-267):
  * AdamW (torch defaults: betas 0.9/0.999, eps 1e-8), weight decay 1e-4
    applied to every trainable param.  The reference declares
    ``norm_weight_decay`` (train.py:68) but never wires it; we keep the field
    for config parity and, when it is set to a float, actually apply that
    decay rate to LayerNorm params (``None``, the default, reproduces the
    reference: one rate for everything);
  * two parameter groups — backbone convs at ``lr_backbone`` (10x lower),
    everything else at ``lr`` — implemented with ``optax.multi_transform``
    over a top-level "backbone"/"rest" label tree;
  * global-norm gradient clipping at ``gradient_max_norm``;
  * gradient accumulation via ``optax.MultiSteps`` (HF Accelerate's
    ``accumulate`` equivalent).  Documented divergence: the reference's
    ``clip_grad_norm_`` runs on the partially-accumulated gradient every
    micro-step (an Accelerate quirk); we clip the final averaged gradient —
    the standard behavior the clipping is meant to have.

Learning-rate mechanism — ``optax.inject_hyperparams``: the two group LRs
live *in the optimizer state* (hyperparams ``backbone_lr`` / ``rest_lr``) and
the trainer sets them once per epoch from the epoch schedule via
``set_learning_rates`` — exactly the torch ``scheduler.step()``-per-epoch
mechanism the reference uses (train.py:288).  This decouples the schedule
from both the (bucket-dependent, approximate) steps-per-epoch count and the
gradient-accumulation inner step count: the LR applied on an optimizer
update is, by construction, the last value the trainer injected, and
``get_learning_rates`` reads the *applied* LR back for logging.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from optax import tree_utils as otu

from detr_tpu.config import TrainingConfig
from detr_tpu.train.schedule import make_epoch_lr_schedule

# inject_hyperparams names; ``set_learning_rates``/``tree_set`` key on these.
LR_HYPERPARAMS = ("backbone_lr", "rest_lr")


def backbone_label_fn(params) -> dict:
    """Label tree: top-level 'backbone' subtree vs the rest

    (reference detr/train.py:172-182 splits param groups on the name
    containing "backbone")."""
    return {k: ("backbone" if k == "backbone" else "rest") for k in params}


def _is_norm_path(path) -> bool:
    """True for params living under a LayerNorm module (named ``norm*``)."""
    for entry in path:
        key = getattr(entry, "key", None)
        if isinstance(key, str) and key.startswith("norm"):
            return True
    return False


def _add_decayed_weights_by_path(
    wd_default: float, wd_norm: float
) -> optax.GradientTransformation:
    """``optax.add_decayed_weights`` with a per-leaf rate: LayerNorm params

    (path component named ``norm*``) decay at ``wd_norm``, everything else at
    ``wd_default``.  Implemented path-wise (no mask trees) so it composes
    cleanly inside ``optax.multi_transform``'s masked subtrees."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("add_decayed_weights_by_path requires params")

        def f(path, u, p):
            wd = wd_norm if _is_norm_path(path) else wd_default
            return u + wd * p

        return jax.tree_util.tree_map_with_path(f, updates, params), state

    return optax.GradientTransformation(init_fn, update_fn)


def set_learning_rates(opt_state, lrs: dict[str, float]):
    """Injects per-group LRs into the optimizer state.

    ``lrs`` maps group name ("backbone"/"rest") -> lr value.  Call once per
    epoch (torch ``scheduler.step()`` equivalent, reference train.py:288).
    Values are cast to f32 arrays so the jitted step's input signature stays
    stable across epochs (no weak-type recompiles)."""
    return otu.tree_set(
        opt_state,
        **{f"{group}_lr": jnp.asarray(lr, jnp.float32) for group, lr in lrs.items()},
    )


def get_learning_rates(opt_state) -> dict[str, float]:
    """Reads the *applied* per-group LRs back out of the optimizer state."""
    return {
        group: float(otu.tree_get(opt_state, f"{group}_lr"))
        for group in ("backbone", "rest")
    }


def build_optimizer(
    config: TrainingConfig,
    *,
    start_epoch: int = 0,
) -> tuple[optax.GradientTransformation, dict[str, Callable]]:
    """Returns (tx, schedules) where schedules maps group name ("backbone" /
    "rest") -> epoch-indexed LR schedule.  The LRs are optimizer-state
    hyperparams initialized at ``schedules[g](start_epoch)``; the trainer
    refreshes them each epoch with ``set_learning_rates`` (the reference's
    per-epoch ``scheduler.step()``, including the fast-forward on
    weights-only resume, detr/train.py:238-241,288)."""

    schedules = {
        group: make_epoch_lr_schedule(
            base_lr,
            epochs=config.epochs,
            warmup_epochs=config.lr_warmup_epochs,
            warmup_decay=config.lr_warmup_decay,
            hold_epochs=config.lr_hold_max_epochs,
            # torch CosineAnnealingLR uses one absolute eta_min for every
            # param group (reference train.py:199) — including the backbone.
            lr_min=config.lr_min,
        )
        for group, base_lr in (("backbone", config.lr_backbone), ("rest", config.lr))
    }

    wd_norm = config.norm_weight_decay

    def adamw_core(lr):
        if wd_norm is None or wd_norm == config.weight_decay:
            return optax.adamw(
                learning_rate=lr,
                b1=0.9,
                b2=0.999,
                eps=1e-8,
                weight_decay=config.weight_decay,
            )
        # Same chain optax.adamw is made of, with the path-wise decay rates.
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            _add_decayed_weights_by_path(config.weight_decay, wd_norm),
            optax.scale_by_learning_rate(lr),
        )

    # Distinct hyperparam names per group so tree_set can address each.
    def backbone_factory(backbone_lr):
        return adamw_core(backbone_lr)

    def rest_factory(rest_lr):
        return adamw_core(rest_lr)

    group_tx = {
        "backbone": optax.inject_hyperparams(backbone_factory)(
            backbone_lr=float(schedules["backbone"](start_epoch))
        ),
        "rest": optax.inject_hyperparams(rest_factory)(
            rest_lr=float(schedules["rest"](start_epoch))
        ),
    }

    # gradient_max_norm <= 0 disables clipping (clip_by_global_norm(0)
    # would zero every gradient, which is never what a disable means).
    clip = (
        optax.clip_by_global_norm(config.gradient_max_norm)
        if config.gradient_max_norm > 0
        else optax.identity()
    )
    tx = optax.chain(
        clip,
        optax.multi_transform(group_tx, backbone_label_fn),
    )

    accum = config.gradient_accumulation_steps
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedules
