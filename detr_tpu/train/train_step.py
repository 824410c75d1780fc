"""The fused, jitted train step: forward + on-device match + loss + backward.

Equivalent of the reference's inner loop body (detr/train.py:258-267) with
every piece on device and fixed-shape: the model forward, the Hungarian
match (the reference's per-step host sync, gone), the set loss, the backward
pass, clipping, and the optimizer update compile into one XLA program.

Parallelism: the step is written for a ``jax.sharding.Mesh`` with a ``data``
axis — batch arrays sharded on ``data``, params/optimizer state replicated —
and compiles identically for 1 chip (trivial mesh) or a pod slice; XLA emits
the gradient all-reduce over ICI (SURVEY §2.3).  Mixed precision follows the
reference's bf16 autocast (train.py:75): params fp32, compute bf16, loss and
matcher in fp32 islands.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from detr_tpu.config import DETRConfig, TrainingConfig
from detr_tpu.losses.criterion import SetCriterion, total_loss
from detr_tpu.matcher.hungarian import HungarianMatcher
from detr_tpu.models.detr import DETR
from detr_tpu.ops.image_norm import prepare_batch_image, prepare_image

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    frozen: Any  # frozen-BN statistics (non-trainable collection)
    opt_state: Any
    rng: Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(
    model: DETR,
    tx: optax.GradientTransformation,
    rng: Array,
    sample_batch: dict[str, Array],
    canvas_map: Optional[dict] = None,
) -> TrainState:
    variables = model.init(
        rng,
        prepare_batch_image(
            {k: jnp.asarray(v) for k, v in sample_batch.items()},
            canvas_map,
        ),
        sample_batch["height"],
        sample_batch["width"],
    )
    params = variables["params"]
    frozen = variables.get("frozen", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        frozen=frozen,
        opt_state=tx.init(params),
        rng=rng,
        tx=tx,
    )


def create_train_state_abstract(
    model: DETR,
    tx: optax.GradientTransformation,
    rng: Array,
    sample_batch: dict[str, Array],
    canvas_map: Optional[dict] = None,
) -> TrainState:
    """Shape-only TrainState (every leaf a ShapeDtypeStruct): the restore
    template for the trainer's fast-resume path.

    A crash-relaunch that will immediately overwrite the state from a
    checkpoint has no use for a real init: ``create_train_state`` pays a
    full init compile + execution on device (minutes through a remote-TPU
    relay) and the from-scratch path pays a backbone forward for frozen-BN
    calibration on top — all dead work when orbax restores into the
    template anyway (StandardRestore accepts abstract leaves).  The
    reference has no analog: its resume also re-inits then loads
    (detr/train.py:169-236), but a local CUDA init is cheap."""
    return jax.eval_shape(
        lambda: create_train_state(model, tx, rng, sample_batch, canvas_map)
    )


def build_criterion(train_config: TrainingConfig, detr_config: DETRConfig) -> SetCriterion:
    """Matcher + criterion wiring (reference detr/train.py:206-216)."""
    matcher = HungarianMatcher(
        cost_class=train_config.set_cost_class,
        cost_bbox=train_config.set_cost_bbox,
        cost_giou=train_config.set_cost_giou,
        eps_min=train_config.matcher_eps_min,
    )
    return SetCriterion(
        num_classes=detr_config.num_classes,
        matcher=matcher,
        weight_label_ce=train_config.label_ce_loss_coef,
        weight_bbox_l1=train_config.bbox_loss_coef,
        weight_bbox_giou=train_config.giou_loss_coef,
        eos_coef=train_config.eos_coef,
    )


def _targets_of_batch(batch: dict[str, Array]) -> dict[str, Array]:
    targets = {
        "class_idx": batch["class_idx"],
        "boxes_normalized": batch["boxes_normalized"],
        "gt_valid": batch["gt_valid"],
    }
    if "image_valid" in batch:  # final short eval batches carry loader padding
        targets["image_valid"] = batch["image_valid"]
    return targets


def make_train_step(
    model: DETR,
    criterion: SetCriterion,
    donate: bool = True,
    canvas_map: Optional[dict] = None,
) -> Callable[[TrainState, dict[str, Array]], tuple[TrainState, dict[str, Array]]]:
    """Builds the jitted train step.

    Returns step(state, batch) -> (new_state, metrics) where metrics carries
    the reference's full loss dict plus the scalar total loss and gradient
    norm.  The state is donated (its HBM buffers are reused for the output).
    ``canvas_map`` enables the device-resize wire (ops/image_norm.py
    ``prepare_batch_image``).
    """

    def loss_fn(params, frozen, batch, dropout_rng):
        # Wire decode: uint8 device-normalize, fp32 passthrough, or
        # device-resize (source-resolution uint8 resampled on the MXU to
        # each image's augmented size) — all fused into the stem by XLA.
        image = prepare_batch_image(batch, canvas_map)
        outputs = model.apply(
            {"params": params, "frozen": frozen},
            image,
            batch["height"],
            batch["width"],
            False,  # deterministic=False: training mode
            rngs={"dropout": dropout_rng},
        )
        loss_dict = criterion(outputs, _targets_of_batch(batch))
        return total_loss(loss_dict), loss_dict

    def step(state: TrainState, batch: dict[str, Array]):
        rng, dropout_rng = jax.random.split(state.rng)
        (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.frozen, batch, dropout_rng
        )
        new_state = state.apply_gradients(grads).replace(rng=rng)
        metrics = dict(loss_dict)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model: DETR,
    criterion: Optional[SetCriterion] = None,
    canvas_map: Optional[dict] = None,
) -> Callable[..., tuple[dict[str, Array], dict[str, Array]]]:
    """Jitted inference step: outputs (+ loss dict when criterion given),

    mirroring the validation forward (reference detr/train.py:386-388)."""

    @partial(jax.jit, static_argnames=())
    def step(params, frozen, batch):
        image = prepare_batch_image(batch, canvas_map)
        outputs = model.apply(
            {"params": params, "frozen": frozen},
            image,
            batch["height"],
            batch["width"],
        )
        loss_dict = (
            criterion(outputs, _targets_of_batch(batch))
            if criterion is not None and "gt_valid" in batch
            else {}
        )
        return outputs, loss_dict

    return step
