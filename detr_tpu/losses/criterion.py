"""Set-prediction criterion as a pure, fixed-shape, jit-able function.

Equivalent of the reference ``SetCriterion`` (detr/loss.py:18-231): for every
decoder layer, Hungarian-match predictions to ground truth, then emit
  * weighted cross-entropy over C+1 classes with no-object weight
    ``eos_coef`` (reference detr/loss.py:53-55,90) — unmatched queries target
    the no-object class C (reference detr/loss.py:82-85);
  * L1 loss on cxcywh boxes and GIoU loss on xyxy boxes, each summed over
    matched pairs and divided by the total number of GT boxes (reference
    detr/loss.py:142-164);
  * cardinality error — L1 between the number of non-no-object argmaxes and
    the number of GT boxes, diagnostic only (reference detr/loss.py:97-121);
  * class error (last layer only) — 100 - top-1 accuracy over matched
    queries (reference detr/loss.py:92-94).
Keys follow the reference exactly: ``loss_label_ce{,_i}``,
``loss_l1_bbox{,_i}``, ``loss_giou{,_i}``, ``cardinality_error{,_i}`` for
aux layers i < L-1 and unsuffixed for the final layer, plus ``class_error``
(reference detr/loss.py:213-230).

TPU-native re-design (SURVEY §7.4): no ragged lists or per-image loops — GT
comes padded to a static G_max with a validity mask; matched pairs are
gathered with ``take_along_axis`` using the dense ``query_of_gt`` encoding
from the on-device matcher; the per-layer loop is a ``vmap`` over the stacked
decoder-layer axis.  Everything computes in fp32 islands.

Deliberate divergence (documented, SURVEY §7 known quirks): the reference
normalizes box losses by the *per-local-batch* GT count (detr/loss.py:142);
official DETR all-reduces it across data-parallel workers.  Under a single
jit over a GSPMD mesh the sum below is already global (the trainer always
gets the global-normalizer behavior); ``shard_map`` callers pass
``axis_name`` and every cross-image reduction — not just the box
normalizer — is psum'd explicitly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from detr_tpu.matcher.hungarian import HungarianMatcher
from detr_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    elementwise_generalized_box_iou,
)

Array = jax.Array


def total_loss(loss_dict: dict[str, Array]) -> Array:
    """Sum of every entry whose key starts with "loss" (reference train.py:262)."""
    return sum(v for k, v in loss_dict.items() if k.startswith("loss"))


@dataclass(frozen=True)
class SetCriterion:
    num_classes: int
    matcher: HungarianMatcher
    weight_label_ce: float = 1.0
    weight_bbox_l1: float = 5.0
    weight_bbox_giou: float = 2.0
    eos_coef: float = 0.1

    def __call__(
        self,
        outputs: dict[str, Array],
        targets: dict[str, Array],
        axis_name: Optional[str] = None,
    ) -> dict[str, Array]:
        """Args:
          outputs: {"pred_logits": (B, L, Q, C+1), "pred_boxes": (B, L, Q, 4)}
            — stacked over decoder layers like the reference model output
            (reference detr/model.py:92-94).
          targets: {"class_idx": (B, G) int, "boxes_normalized": (B, G, 4)
            fp32 XYXY in [0, 1], "gt_valid": (B, G) bool, optional
            "image_valid": (B,) bool — False rows are loader padding (the
            repeated items that fill the final short eval batch) and are
            excluded from every loss term}.
          axis_name: optional mesh axis for shard_map callers — psums
            EVERY cross-image reduction (box normalizer, CE and cardinality
            numerators+denominators, class-error counts) so per-shard and
            global values agree.  Under plain jit reductions are already
            global; leave None.

        Returns a dict of fp32 scalars with reference-parity keys.
        """
        logits = outputs["pred_logits"].astype(jnp.float32)  # (B, L, Q, C+1)
        boxes = outputs["pred_boxes"].astype(jnp.float32)  # (B, L, Q, 4)
        B, L, Q, _ = logits.shape

        class_idx = targets["class_idx"].astype(jnp.int32)  # (B, G)
        gt_boxes = targets["boxes_normalized"].astype(jnp.float32)  # (B, G, 4)
        gt_valid = targets["gt_valid"].astype(bool)  # (B, G)
        image_valid = targets.get("image_valid")
        if image_valid is None:
            image_valid = jnp.ones((B,), bool)
        else:
            image_valid = image_valid.astype(bool)  # (B,)
        gt_valid = gt_valid & image_valid[:, None]
        G = class_idx.shape[-1]

        # One matcher invocation for all layers (vmapped inside).
        qog = self.matcher(
            logits,
            boxes,
            jnp.broadcast_to(class_idx[:, None], (B, L, G)),
            jnp.broadcast_to(gt_boxes[:, None], (B, L, G, 4)),
            jnp.broadcast_to(gt_valid[:, None], (B, L, G)),
        )  # (B, L, G) int32, -1 on padding

        # Total GT count; >= 1 (reference detr/loss.py:142).
        num_boxes = jnp.sum(gt_valid.astype(jnp.float32))
        if axis_name is not None:
            num_boxes = jax.lax.psum(num_boxes, axis_name)
        num_boxes = jnp.maximum(num_boxes, 1.0)

        per_layer = jax.vmap(
            lambda lg, bx, q: self._layer_losses(
                lg, bx, q, class_idx, gt_boxes, gt_valid, num_boxes,
                image_valid, axis_name,
            ),
            in_axes=(1, 1, 1),
        )(logits, boxes, qog)
        # per_layer: dict of (L,) arrays

        losses: dict[str, Array] = {}
        for i in range(L):
            sfx = f"_{i}" if i < L - 1 else ""
            losses[f"loss_label_ce{sfx}"] = per_layer["label_ce"][i]
            losses[f"cardinality_error{sfx}"] = per_layer["cardinality"][i]
            losses[f"loss_l1_bbox{sfx}"] = per_layer["l1_bbox"][i]
            losses[f"loss_giou{sfx}"] = per_layer["giou"][i]
        # Class error is last-layer-only in the reference (detr/loss.py:220
        # condition) — computing it per layer inside the vmap would be 5
        # wasted (B, G, C+1) gathers per step.
        losses["class_error"] = self._class_error(
            logits[:, -1], qog[:, -1], class_idx, gt_valid, axis_name
        )
        losses.update(
            self._liftoff_diagnostics(
                logits[:, -1], boxes[:, -1], qog[:, -1],
                class_idx, gt_boxes, gt_valid, image_valid, axis_name,
            )
        )
        return losses

    def _liftoff_diagnostics(
        self, logits, boxes, qog, class_idx, gt_boxes, gt_valid,
        image_valid, axis_name=None,
    ) -> dict[str, Array]:
        """Last-layer ``diag_*`` curves (NOT summed into the loss: keys
        don't start with "loss") that separate "classifier collapsed to
        no-object, liftoff pending" from "can never lift off" — the
        distinction the round-3 AP-0.000 postmortem lacked.  No reference
        analog (detr/loss.py logs only the aggregate CE):

          * diag_matched_ce / diag_noobj_ce — unweighted mean NLL over
            matched queries vs no-object-target queries.  Collapse =
            matched CE stuck near -log(softmax at uniform) while no-object
            CE ~ 0; liftoff = matched CE falling.
          * diag_nonbg_frac — fraction of queries whose argmax is a real
            class.  0.0 forever = collapsed classifier; should approach
            (mean GT count)/Q as detection starts.
          * diag_matched_giou — mean GIoU of matched pairs.  Rising GIoU
            with AP still 0 = boxes learn but classification gates AP;
            flat ~0 = the box path is the problem.
        """

        def _greduce(x):
            return jax.lax.psum(x, axis_name) if axis_name is not None else x

        B, Q, C1 = logits.shape
        G = class_idx.shape[-1]
        no_object = self.num_classes
        # Matched-query map (same scatter as _layer_losses).
        target_classes = jnp.full((B, Q), no_object, jnp.int32)
        scatter_q = jnp.where(gt_valid & (qog >= 0), qog, Q)
        batch_arange = jnp.arange(B)[:, None]
        target_classes = target_classes.at[
            jnp.broadcast_to(batch_arange, (B, G)), scatter_q
        ].set(class_idx, mode="drop")
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
        img_w = image_valid[:, None].astype(jnp.float32)
        matched_q = (target_classes != no_object).astype(jnp.float32) * img_w
        noobj_q = (target_classes == no_object).astype(jnp.float32) * img_w
        matched_ce = _greduce(jnp.sum(matched_q * nll)) / jnp.maximum(
            _greduce(jnp.sum(matched_q)), 1.0
        )
        noobj_ce = _greduce(jnp.sum(noobj_q * nll)) / jnp.maximum(
            _greduce(jnp.sum(noobj_q)), 1.0
        )
        nonbg = (jnp.argmax(logits, axis=-1) != no_object).astype(jnp.float32)
        nonbg_frac = _greduce(jnp.sum(nonbg * img_w)) / jnp.maximum(
            _greduce(jnp.sum(jnp.broadcast_to(img_w, (B, Q)))), 1.0
        )
        pair_valid = gt_valid & (qog >= 0)
        src_boxes = jnp.take_along_axis(
            boxes, jnp.clip(qog, 0)[..., None], axis=1
        )
        giou = elementwise_generalized_box_iou(
            box_cxcywh_to_xyxy(src_boxes), gt_boxes
        )
        matched_giou = _greduce(
            jnp.sum(jnp.where(pair_valid, giou, 0.0))
        ) / jnp.maximum(_greduce(jnp.sum(pair_valid.astype(jnp.float32))), 1.0)
        return {
            "diag_matched_ce": matched_ce,
            "diag_noobj_ce": noobj_ce,
            "diag_nonbg_frac": nonbg_frac,
            "diag_matched_giou": matched_giou,
        }

    # ----- single-layer losses (B, Q, *) -> scalars -----

    def _layer_losses(
        self, logits, boxes, qog, class_idx, gt_boxes, gt_valid, num_boxes,
        image_valid, axis_name=None,
    ):
        def _greduce(x):
            # Cross-shard reduction for shard_map callers; identity under
            # plain jit where the sums above are already global.
            return jax.lax.psum(x, axis_name) if axis_name is not None else x

        B, Q, C1 = logits.shape
        G = class_idx.shape[-1]
        no_object = self.num_classes

        # Scatter matched GT classes into a (B, Q) target map; everything
        # else is no-object (reference detr/loss.py:78-85).
        target_classes = jnp.full((B, Q), no_object, jnp.int32)
        scatter_q = jnp.where(gt_valid & (qog >= 0), qog, Q)  # ragged -> dropped
        batch_arange = jnp.arange(B)[:, None]
        target_classes = target_classes.at[
            jnp.broadcast_to(batch_arange, (B, G)), scatter_q
        ].set(class_idx, mode="drop")

        # Weighted CE == torch F.cross_entropy(..., weight): the mean is
        # weighted by the per-target class weight (reference detr/loss.py:90).
        class_weight = jnp.ones((C1,), jnp.float32).at[no_object].set(self.eos_coef)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, target_classes[..., None], axis=-1)[..., 0]
        w = class_weight[target_classes] * image_valid[:, None].astype(jnp.float32)
        ce_num = _greduce(jnp.sum(w * nll))
        ce_den = _greduce(jnp.sum(w))
        # ce_den == 0 only when EVERY image (globally) is loader padding —
        # return 0 then instead of NaN-poisoning the gradients.
        loss_ce = self.weight_label_ce * ce_num / jnp.maximum(ce_den, 1e-6)

        # Cardinality error (reference detr/loss.py:97-121), mean over the
        # non-padded images only.
        pred_class = jnp.argmax(logits, axis=-1)
        card_pred = jnp.sum((pred_class != no_object).astype(jnp.float32), axis=1)
        n_gt = jnp.sum(gt_valid.astype(jnp.float32), axis=1)
        img_w = image_valid.astype(jnp.float32)
        cardinality = _greduce(jnp.sum(img_w * jnp.abs(card_pred - n_gt))) / (
            jnp.maximum(_greduce(jnp.sum(img_w)), 1.0)
        )

        # Box losses over matched pairs (reference detr/loss.py:123-164).
        pair_valid = gt_valid & (qog >= 0)
        gather_q = jnp.clip(qog, 0)
        src_boxes = jnp.take_along_axis(boxes, gather_q[..., None], axis=1)  # (B,G,4)
        tgt_cxcywh = box_xyxy_to_cxcywh(gt_boxes)
        l1 = _greduce(jnp.sum(
            jnp.where(pair_valid[..., None], jnp.abs(src_boxes - tgt_cxcywh), 0.0)
        ))
        loss_l1 = self.weight_bbox_l1 * l1 / num_boxes

        giou = elementwise_generalized_box_iou(
            box_cxcywh_to_xyxy(src_boxes), gt_boxes
        )  # (B, G)
        loss_giou = (
            self.weight_bbox_giou
            * _greduce(jnp.sum(jnp.where(pair_valid, 1.0 - giou, 0.0)))
            / num_boxes
        )

        return {
            "label_ce": loss_ce,
            "cardinality": cardinality,
            "l1_bbox": loss_l1,
            "giou": loss_giou,
        }

    def _class_error(self, logits, qog, class_idx, gt_valid, axis_name=None):
        """Class error over matched queries of the LAST layer (reference
        detr/loss.py:92-94, detr/utils.py:100-116): 100 - top-1 accuracy;
        100 when no GT exists anywhere (matching the reference's
        empty-target early return via the max(den, 1) guard)."""
        pair_valid = gt_valid & (qog >= 0)
        gather_q = jnp.clip(qog, 0)
        matched = jnp.take_along_axis(logits, gather_q[..., None], axis=1)
        pred = jnp.argmax(matched, axis=-1)  # (B, G)
        correct = jnp.where(
            pair_valid, (pred == class_idx).astype(jnp.float32), 0.0
        )
        num = jnp.sum(correct)
        den = jnp.sum(pair_valid.astype(jnp.float32))
        if axis_name is not None:
            num = jax.lax.psum(num, axis_name)
            den = jax.lax.psum(den, axis_name)
        return 100.0 - 100.0 * num / jnp.maximum(den, 1.0)
