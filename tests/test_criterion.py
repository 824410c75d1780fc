"""SetCriterion tests: fixed-shape JAX loss vs an independent ragged numpy

re-derivation of the reference semantics (detr/loss.py:18-231), with the
assignment held fixed so the loss math is tested independently of the matcher
(which has its own scipy-parity tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detr_tpu.losses import SetCriterion, total_loss
from detr_tpu.matcher import HungarianMatcher, scipy_match_batch


def make_problem(rng, B=3, L=2, Q=12, G=6, C=5, n_valid=(4, 0, 6)):
    logits = rng.normal(size=(B, L, Q, C + 1)).astype(np.float32)
    boxes_cxcywh = rng.uniform(0.25, 0.6, size=(B, L, Q, 4)).astype(np.float32)
    class_idx = rng.integers(0, C, size=(B, G)).astype(np.int32)
    x0 = rng.uniform(0, 0.5, size=(B, G, 1))
    y0 = rng.uniform(0, 0.5, size=(B, G, 1))
    gt = np.concatenate(
        [x0, y0, x0 + rng.uniform(0.1, 0.4, (B, G, 1)), y0 + rng.uniform(0.1, 0.4, (B, G, 1))],
        axis=-1,
    ).astype(np.float32)
    valid = np.zeros((B, G), bool)
    for b, n in enumerate(n_valid):
        valid[b, :n] = True
    outputs = {"pred_logits": logits, "pred_boxes": boxes_cxcywh}
    targets = {"class_idx": class_idx, "boxes_normalized": gt, "gt_valid": valid}
    return outputs, targets


def np_reference_losses(outputs, targets, qog, num_classes, eos=0.1, w_ce=1.0, w_l1=5.0, w_giou=2.0):
    """Ragged numpy implementation of reference detr/loss.py semantics."""
    logits = outputs["pred_logits"]
    boxes = outputs["pred_boxes"]
    B, L, Q, C1 = logits.shape
    valid = targets["gt_valid"]

    def xyxy_to_cxcywh(b):
        return np.stack(
            [(b[..., 0] + b[..., 2]) / 2, (b[..., 1] + b[..., 3]) / 2,
             b[..., 2] - b[..., 0], b[..., 3] - b[..., 1]], axis=-1)

    def cxcywh_to_xyxy(b):
        return np.stack(
            [b[..., 0] - b[..., 2] / 2, b[..., 1] - b[..., 3] / 2,
             b[..., 0] + b[..., 2] / 2, b[..., 1] + b[..., 3] / 2], axis=-1)

    def giou_pair(a, b):
        ax0, ay0, ax1, ay1 = a
        bx0, by0, bx1, by1 = b
        inter = max(0, min(ax1, bx1) - max(ax0, bx0)) * max(0, min(ay1, by1) - max(ay0, by0))
        area_a = (ax1 - ax0) * (ay1 - ay0)
        area_b = (bx1 - bx0) * (by1 - by0)
        union = area_a + area_b - inter
        hull = (max(ax1, bx1) - min(ax0, bx0)) * (max(ay1, by1) - min(ay0, by0))
        return inter / union - (hull - union) / hull

    total_gt = max(int(valid.sum()), 1)
    losses = {}
    for i in range(L):
        sfx = f"_{i}" if i < L - 1 else ""
        lg = logits[:, i]
        bx = boxes[:, i]

        # CE with class weights, torch weighted-mean semantics
        weight = np.ones(C1)
        weight[-1] = eos
        tclass = np.full((B, Q), num_classes, np.int64)
        for b in range(B):
            for g in range(valid[b].sum()):
                tclass[b, qog[b, i, g]] = targets["class_idx"][b, g]
        lp = lg - lg.max(-1, keepdims=True)
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        nll = -lp.reshape(-1, C1)[np.arange(B * Q), tclass.reshape(-1)]
        wt = weight[tclass.reshape(-1)]
        losses[f"loss_label_ce{sfx}"] = w_ce * (wt * nll).sum() / wt.sum()

        # cardinality
        card_err = 0.0
        for b in range(B):
            card = (lg[b].argmax(-1) != num_classes).sum()
            card_err += abs(card - valid[b].sum())
        losses[f"cardinality_error{sfx}"] = card_err / B

        # boxes
        l1 = 0.0
        gl = 0.0
        for b in range(B):
            for g in range(valid[b].sum()):
                src = bx[b, qog[b, i, g]]
                tgt = targets["boxes_normalized"][b, g]
                l1 += np.abs(src - xyxy_to_cxcywh(tgt)).sum()
                gl += 1.0 - giou_pair(cxcywh_to_xyxy(src), tgt)
        losses[f"loss_l1_bbox{sfx}"] = w_l1 * l1 / total_gt
        losses[f"loss_giou{sfx}"] = w_giou * gl / total_gt

        if i == L - 1:
            correct, count = 0, 0
            for b in range(B):
                for g in range(valid[b].sum()):
                    count += 1
                    if lg[b, qog[b, i, g]].argmax() == targets["class_idx"][b, g]:
                        correct += 1
            acc = 100.0 * correct / count if count else 0.0
            losses["class_error"] = 100.0 - acc
    return losses


class FixedMatcher:
    def __init__(self, qog):
        self.qog = jnp.asarray(qog)

    def __call__(self, *args, **kwargs):
        return self.qog


@pytest.fixture
def problem(rng):
    outputs, targets = make_problem(rng)
    qog = scipy_match_batch(
        outputs["pred_logits"],
        outputs["pred_boxes"],
        np.broadcast_to(targets["class_idx"][:, None], (3, 2, 6)),
        np.broadcast_to(targets["boxes_normalized"][:, None], (3, 2, 6, 4)),
        np.broadcast_to(targets["gt_valid"][:, None], (3, 2, 6)),
    )
    return outputs, targets, qog


def test_losses_match_ragged_reference(problem):
    outputs, targets, qog = problem
    crit = SetCriterion(num_classes=5, matcher=FixedMatcher(qog))
    ours = crit(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        {k: jnp.asarray(v) for k, v in targets.items()},
    )
    ref = np_reference_losses(outputs, targets, qog, num_classes=5)
    # Reference-parity keys exactly, plus our diag_* liftoff diagnostics
    # (criterion.py::_liftoff_diagnostics — excluded from total_loss).
    assert {k for k in ours if not k.startswith("diag_")} == set(ref)
    for k in ref:
        assert float(ours[k]) == pytest.approx(ref[k], rel=1e-4, abs=1e-5), k


def test_loss_keys_structure(problem):
    outputs, targets, qog = problem
    crit = SetCriterion(num_classes=5, matcher=FixedMatcher(qog))
    out = crit(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        {k: jnp.asarray(v) for k, v in targets.items()},
    )
    # L=2: aux layer 0 suffixed, final unsuffixed (reference loss.py:219)
    for base in ("loss_label_ce", "loss_l1_bbox", "loss_giou", "cardinality_error"):
        assert base in out and f"{base}_0" in out
    assert "class_error" in out
    t = total_loss(out)
    # total only sums "loss*" entries: 2 layers x 3 losses
    manual = sum(float(v) for k, v in out.items() if k.startswith("loss"))
    assert float(t) == pytest.approx(manual)
    assert not np.isnan(manual)


def test_gradients_flow_through_loss_only(problem, rng):
    outputs, targets, qog = problem
    crit = SetCriterion(num_classes=5, matcher=FixedMatcher(qog))
    jt = {k: jnp.asarray(v) for k, v in targets.items()}

    def f(logits, boxes):
        return total_loss(crit({"pred_logits": logits, "pred_boxes": boxes}, jt))

    glog, gbox = jax.grad(f, argnums=(0, 1))(
        jnp.asarray(outputs["pred_logits"]), jnp.asarray(outputs["pred_boxes"])
    )
    assert np.isfinite(np.asarray(glog)).all()
    assert np.abs(np.asarray(glog)).sum() > 0
    assert np.abs(np.asarray(gbox)).sum() > 0


def test_end_to_end_with_real_matcher(problem):
    # Full path with the auction matcher: finite losses, sane ranges.
    outputs, targets, _ = problem
    crit = SetCriterion(num_classes=5, matcher=HungarianMatcher())
    out = crit(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        {k: jnp.asarray(v) for k, v in targets.items()},
    )
    for k, v in out.items():
        assert np.isfinite(float(v)), k
    assert float(out["loss_giou"]) >= 0.0
    assert 0.0 <= float(out["class_error"]) <= 100.0


def test_empty_batch_no_nans(rng):
    outputs, targets = make_problem(rng, n_valid=(0, 0, 0))
    crit = SetCriterion(num_classes=5, matcher=HungarianMatcher())
    out = crit(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        {k: jnp.asarray(v) for k, v in targets.items()},
    )
    assert float(out["loss_l1_bbox"]) == 0.0
    assert float(out["loss_giou"]) == 0.0
    assert float(out["class_error"]) == 100.0
    assert np.isfinite(float(total_loss(out)))


def test_image_valid_excludes_padded_images(rng):
    """Loss on [A, B, pad] with image_valid=[1,1,0] == loss on [A, B]:

    the loader's final-short-batch padding (repeated items) must not bias
    any loss term (reference semantics: loss over the true images only)."""
    outputs, targets = make_problem(rng, B=3, L=2, Q=12, G=6, C=5, n_valid=(4, 2, 6))
    matcher = HungarianMatcher(eps_min=1e-4)
    crit = SetCriterion(num_classes=5, matcher=matcher)

    padded = crit(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        {
            **{k: jnp.asarray(v) for k, v in targets.items()},
            "image_valid": jnp.asarray([True, True, False]),
        },
    )
    unpadded = crit(
        {k: jnp.asarray(v[:2]) for k, v in outputs.items()},
        {k: jnp.asarray(v[:2]) for k, v in targets.items()},
    )
    assert set(padded) == set(unpadded)
    for k in unpadded:
        assert float(padded[k]) == pytest.approx(float(unpadded[k]), rel=1e-4, abs=1e-5), k


def test_criterion_shard_map_axis_name_matches_jit():
    """The axis_name contract: under shard_map over a data axis, EVERY loss
    key must equal the plain-jit (global-batch) value — box normalizer, CE
    and cardinality numerators+denominators, and class-error counts are all
    psum'd.  Includes a shard whose single row is loader padding
    (image_valid False): its local denominators are zero, which must not
    NaN the global values."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    rng = np.random.default_rng(11)
    B = 8
    outputs, targets = make_problem(
        rng, B=B, L=2, Q=12, G=6, C=5, n_valid=(4, 0, 6, 2, 1, 3, 5, 2)
    )
    targets = dict(targets)
    # row 1 has no GT; row 4 is loader padding — shard 4 becomes all-padding
    targets["image_valid"] = np.array(
        [True, True, True, True, False, True, True, True]
    )

    crit = SetCriterion(num_classes=5, matcher=HungarianMatcher())
    outs_j = {k: jnp.asarray(v) for k, v in outputs.items()}
    tgts_j = {k: jnp.asarray(v) for k, v in targets.items()}

    ref = jax.jit(lambda o, t: crit(o, t))(outs_j, tgts_j)

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("d",))
    sharded = shard_map(
        lambda o, t: crit(o, t, axis_name="d"),
        mesh=mesh,
        in_specs=(P("d"), P("d")),
        out_specs=P(),  # psum'd scalars are replicated
        # the auction's while_loop carry starts from unvarying constants,
        # which the strict varying-manual-axes checker rejects; replication
        # of the outputs is guaranteed by the psums themselves
        check_rep=False,
    )
    got = sharded(outs_j, tgts_j)

    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            float(got[k]), float(ref[k]), rtol=2e-5, atol=2e-5, err_msg=k
        )


def test_liftoff_diagnostics(rng):
    """diag_* semantics (criterion.py::_liftoff_diagnostics): construct
    logits where every matched query confidently predicts its GT class and
    every other query confidently predicts no-object — matched/no-object CE
    must both be ~0, nonbg_frac must equal (total GT)/(B*Q), and
    matched_giou must be ~1 when pred boxes equal GT boxes."""
    B, L, Q, G, C = 2, 2, 8, 4, 5
    n_valid = (3, 2)
    class_idx = rng.integers(0, C, size=(B, G)).astype(np.int32)
    x0 = rng.uniform(0, 0.4, size=(B, G, 1))
    y0 = rng.uniform(0, 0.4, size=(B, G, 1))
    gt = np.concatenate(
        [x0, y0, x0 + 0.3, y0 + 0.3], axis=-1
    ).astype(np.float32)
    valid = np.zeros((B, G), bool)
    for b, n in enumerate(n_valid):
        valid[b, :n] = True
    # identity-ish match: GT g -> query g
    qog = np.where(valid, np.arange(G)[None], -1)[:, None].repeat(L, 1)

    logits = np.zeros((B, L, Q, C + 1), np.float32)
    logits[..., C] = 20.0  # default: confident no-object
    boxes = np.full((B, L, Q, 4), 0.5, np.float32)
    cxcywh = np.stack(
        [(gt[..., 0] + gt[..., 2]) / 2, (gt[..., 1] + gt[..., 3]) / 2,
         gt[..., 2] - gt[..., 0], gt[..., 3] - gt[..., 1]], axis=-1)
    for b in range(B):
        for g in range(n_valid[b]):
            logits[b, :, g, C] = 0.0
            logits[b, :, g, class_idx[b, g]] = 20.0
            boxes[b, :, g] = cxcywh[b, g]

    crit = SetCriterion(num_classes=C, matcher=FixedMatcher(qog))
    out = crit(
        {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)},
        {"class_idx": jnp.asarray(class_idx),
         "boxes_normalized": jnp.asarray(gt),
         "gt_valid": jnp.asarray(valid)},
    )
    assert float(out["diag_matched_ce"]) < 1e-3
    assert float(out["diag_noobj_ce"]) < 1e-3
    assert float(out["diag_nonbg_frac"]) == pytest.approx(
        sum(n_valid) / (B * Q)
    )
    assert float(out["diag_matched_giou"]) == pytest.approx(1.0, abs=1e-5)
    # diagnostics never enter the optimized loss
    assert float(total_loss(out)) == pytest.approx(
        sum(float(v) for k, v in out.items() if k.startswith("loss"))
    )


def test_liftoff_diagnostics_collapsed(rng):
    """A collapsed classifier (everything confidently no-object) shows the
    signature the diagnostics exist to detect: matched CE high, no-object
    CE ~0, nonbg_frac == 0."""
    outputs, targets = make_problem(rng)
    logits = np.zeros_like(outputs["pred_logits"])
    logits[..., -1] = 20.0
    outputs["pred_logits"] = logits
    B, L, Q, _ = outputs["pred_logits"].shape
    G = targets["class_idx"].shape[-1]
    qog = scipy_match_batch(
        outputs["pred_logits"], outputs["pred_boxes"],
        np.broadcast_to(targets["class_idx"][:, None], (B, L, G)),
        np.broadcast_to(targets["boxes_normalized"][:, None], (B, L, G, 4)),
        np.broadcast_to(targets["gt_valid"][:, None], (B, L, G)),
    )
    crit = SetCriterion(num_classes=5, matcher=FixedMatcher(qog))
    out = crit(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        {k: jnp.asarray(v) for k, v in targets.items()},
    )
    assert float(out["diag_matched_ce"]) > 10.0
    assert float(out["diag_noobj_ce"]) < 1e-3
    assert float(out["diag_nonbg_frac"]) == 0.0
