"""Batched on-device Hungarian matcher.

Equivalent of the reference ``HungarianMatcher`` (detr/matcher.py:17-99) with
the per-image Python loop + CPU scipy solve replaced by a fixed-shape cost
matrix and the vmapped on-device auction solver — the whole match runs inside
the jitted train step with no host sync.

Cost semantics match reference detr/matcher.py:66-93 exactly (fp32):
  cost = cost_bbox * cdist_L1(pred_cxcywh, gt_cxcywh)
       + cost_class * (-softmax(logits)[:, gt_class])
       + cost_giou * (-GIoU(pred_xyxy, gt_xyxy))
with default weights (5, 1, 2) from reference detr/train.py:90-96.

Output encoding differs by design: instead of ragged per-image
(pred_idx, gt_idx) tensor pairs, we return a dense (…, G_max) int32 array
``query_of_gt`` (assigned query per GT slot, -1 on padding) plus the validity
mask — the fixed-shape form the set loss consumes with gather/scatter.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from detr_tpu.matcher.auction import auction_lap
from detr_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
)

Array = jax.Array


def compute_cost_matrix(
    pred_logits: Array,
    pred_boxes: Array,
    gt_labels: Array,
    gt_boxes: Array,
    gt_valid: Array,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
) -> Array:
    """Single-image matching cost (reference detr/matcher.py:66-93), fp32.

    Args:
      pred_logits: (Q, C+1) raw class logits.
      pred_boxes: (Q, 4) normalized cxcywh.
      gt_labels: (G, ) int class indices (arbitrary on padding).
      gt_boxes: (G, 4) normalized XYXY (the reference feeds
        ``boxes_normalized`` — XYXY / (w, h, w, h), detr/data.py:216-219).
      gt_valid: (G,) bool padding mask.

    Returns (Q, G) fp32; invalid columns are zeroed (the solver ignores them).
    """
    pred_logits = pred_logits.astype(jnp.float32)
    pred_boxes = pred_boxes.astype(jnp.float32)
    gt_boxes = gt_boxes.astype(jnp.float32)

    probs = jax.nn.softmax(pred_logits, axis=-1)  # (Q, C+1)
    safe_labels = jnp.where(gt_valid, gt_labels, 0)
    c_class = -probs[:, safe_labels]  # (Q, G)

    gt_cxcywh = box_xyxy_to_cxcywh(gt_boxes)
    c_bbox = jnp.sum(
        jnp.abs(pred_boxes[:, None, :] - gt_cxcywh[None, :, :]), axis=-1
    )  # L1 cdist

    c_giou = -generalized_box_iou(box_cxcywh_to_xyxy(pred_boxes), gt_boxes)

    cost = cost_bbox * c_bbox + cost_class * c_class + cost_giou * c_giou
    return jnp.where(gt_valid[None, :], cost, 0.0)


def _use_pallas_default() -> bool:
    # The VMEM-resident kernel targets real TPUs; interpret-mode on CPU is
    # only for tests.  Platforms named "tpu" or the axon tunnel count.
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return plat in ("tpu", "axon")


@partial(
    jax.jit,
    static_argnames=("cost_class", "cost_bbox", "cost_giou", "impl", "eps_min"),
)
def match_batch(
    pred_logits: Array,
    pred_boxes: Array,
    gt_labels: Array,
    gt_boxes: Array,
    gt_valid: Array,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
    impl: str = "auto",
    eps_min: float = 1e-4,
) -> Array:
    """Batched cost + solve over arbitrary leading batch dims.

    Args: leading dims (…) broadcast across all args —
      pred_logits (…, Q, C+1), pred_boxes (…, Q, 4), gt_labels (…, G),
      gt_boxes (…, G, 4), gt_valid (…, G).
      impl: "pallas" (VMEM-resident TPU kernel), "xla" (lax.while_loop
        reference), or "auto" (pallas on TPU, xla elsewhere).
    Returns query_of_gt (…, G) int32, gradients stopped.
    """
    batch_shape = pred_logits.shape[:-2]
    Q, C1 = pred_logits.shape[-2:]
    G = gt_labels.shape[-1]

    flat = lambda x, s: x.reshape((-1,) + s)  # noqa: E731
    pl = flat(pred_logits, (Q, C1))
    pb = flat(pred_boxes, (Q, 4))
    gl = flat(gt_labels, (G,))
    gb = flat(gt_boxes, (G, 4))
    gv = flat(gt_valid, (G,))

    costs = jax.vmap(
        partial(
            compute_cost_matrix,
            cost_class=cost_class,
            cost_bbox=cost_bbox,
            cost_giou=cost_giou,
        )
    )(pl, pb, gl, gb, gv)
    # Cut tangents *before* the solver: the matching is non-differentiable
    # (reference wraps it in no_grad, detr/matcher.py:40), and the Pallas
    # kernel has no JVP rule — without this, jax.grad fails to linearize.
    costs = jax.lax.stop_gradient(costs)

    if impl == "auto":
        impl = "pallas" if _use_pallas_default() else "xla"
    if impl == "pallas":
        from detr_tpu.matcher.pallas_auction import pallas_auction_lap

        qog, _ = pallas_auction_lap(costs, gv, eps_min=eps_min)
    elif impl == "xla":
        qog = jax.vmap(lambda c, v: auction_lap(c, v, eps_min=eps_min)[0])(costs, gv)
    else:
        raise ValueError(f"unknown matcher impl: {impl!r}")
    return jax.lax.stop_gradient(qog.reshape(batch_shape + (G,)))


@dataclass(frozen=True)
class HungarianMatcher:
    """Configured matcher (reference detr/matcher.py:25-38 constructor).

    ``eps_min`` is the auction's final epsilon: total assignment cost is
    within 2 * eps_min per GT of optimal.  1e-4 gives scipy-level parity;
    the trainer uses a looser value (TrainingConfig.matcher_eps_min) since
    training is insensitive to 1e-3-scale matching slack and it cuts
    ~25% of solver rounds."""

    cost_class: float = 1.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    eps_min: float = 1e-4

    def __post_init__(self):
        assert (
            self.cost_class != 0 or self.cost_bbox != 0 or self.cost_giou != 0
        ), "all costs can't be 0"

    def __call__(self, pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid):
        return match_batch(
            pred_logits,
            pred_boxes,
            gt_labels,
            gt_boxes,
            gt_valid,
            cost_class=self.cost_class,
            cost_bbox=self.cost_bbox,
            cost_giou=self.cost_giou,
            eps_min=self.eps_min,
        )


def scipy_match_batch(
    pred_logits,
    pred_boxes,
    gt_labels,
    gt_boxes,
    gt_valid,
    cost_class: float = 1.0,
    cost_bbox: float = 5.0,
    cost_giou: float = 2.0,
) -> np.ndarray:
    """Host-side exact reference solver (scipy Jonker-Volgenant), same dense

    output encoding as :func:`match_batch`.  Used for parity tests and as an
    offline debugging tool — never on the train hot path."""
    from scipy.optimize import linear_sum_assignment

    cost_fn = jax.jit(
        jax.vmap(
            partial(
                compute_cost_matrix,
                cost_class=cost_class,
                cost_bbox=cost_bbox,
                cost_giou=cost_giou,
            )
        )
    )
    batch_shape = np.asarray(pred_logits).shape[:-2]
    G = np.asarray(gt_labels).shape[-1]
    Q = np.asarray(pred_logits).shape[-2]
    C1 = np.asarray(pred_logits).shape[-1]

    pl = np.asarray(pred_logits, np.float32).reshape(-1, Q, C1)
    pb = np.asarray(pred_boxes, np.float32).reshape(-1, Q, 4)
    gl = np.asarray(gt_labels).reshape(-1, G)
    gb = np.asarray(gt_boxes, np.float32).reshape(-1, G, 4)
    gv = np.asarray(gt_valid).reshape(-1, G)

    costs = np.asarray(cost_fn(pl, pb, gl, gb, gv))
    out = np.full((len(costs), G), -1, np.int32)
    for i in range(len(costs)):
        n = int(gv[i].sum())
        if n == 0:
            continue
        valid_cols = np.flatnonzero(gv[i])
        rows, cols = linear_sum_assignment(costs[i][:, valid_cols])
        out[i, valid_cols[cols]] = rows
    return out.reshape(batch_shape + (G,))
