"""Unit tests for detr_tpu.ops.boxes against independent numpy references.

Mirrors the reference's box-op semantics (detr/utils.py:57-97,
torchvision format converters used at detr/matcher.py:85-89) on random valid
boxes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from detr_tpu.ops import boxes as B


def random_xyxy(rng, n, scale=1.0):
    x0 = rng.uniform(0, 0.8, (n, 1)) * scale
    y0 = rng.uniform(0, 0.8, (n, 1)) * scale
    w = rng.uniform(0.05, 0.2, (n, 1)) * scale
    h = rng.uniform(0.05, 0.2, (n, 1)) * scale
    return np.concatenate([x0, y0, x0 + w, y0 + h], axis=1).astype(np.float32)


def np_box_area(b):
    return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])


def np_pairwise_iou(b1, b2):
    a1, a2 = np_box_area(b1), np_box_area(b2)
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = a1[:, None] + a2[None, :] - inter
    return inter / union, union


def np_pairwise_giou(b1, b2):
    iou, union = np_pairwise_iou(b1, b2)
    lt = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rb = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / hull


def test_format_roundtrip(rng):
    b = random_xyxy(rng, 64)
    back = B.box_cxcywh_to_xyxy(B.box_xyxy_to_cxcywh(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(back), b, atol=1e-6)


def test_cxcywh_to_xyxy_known():
    box = jnp.array([[0.5, 0.5, 0.2, 0.4]])
    out = np.asarray(B.box_cxcywh_to_xyxy(box))
    np.testing.assert_allclose(out, [[0.4, 0.3, 0.6, 0.7]], atol=1e-7)


def test_box_area(rng):
    b = random_xyxy(rng, 32)
    np.testing.assert_allclose(
        np.asarray(B.box_area(jnp.asarray(b))), np_box_area(b), rtol=1e-6
    )


def test_pairwise_iou_matches_numpy(rng):
    b1, b2 = random_xyxy(rng, 20), random_xyxy(rng, 13)
    iou, union = B.box_iou(jnp.asarray(b1), jnp.asarray(b2))
    ref_iou, ref_union = np_pairwise_iou(b1, b2)
    np.testing.assert_allclose(np.asarray(iou), ref_iou, atol=1e-5)
    np.testing.assert_allclose(np.asarray(union), ref_union, rtol=1e-5)


def test_pairwise_giou_matches_numpy(rng):
    b1, b2 = random_xyxy(rng, 20), random_xyxy(rng, 13)
    giou = np.asarray(B.generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(giou, np_pairwise_giou(b1, b2), atol=1e-5)
    assert (giou <= 1.0 + 1e-6).all() and (giou >= -1.0 - 1e-6).all()


def test_giou_identity_and_disjoint():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    far = jnp.array([[10.0, 10.0, 11.0, 11.0]])
    self_giou = float(B.generalized_box_iou(a, a)[0, 0])
    assert self_giou == pytest.approx(1.0, abs=1e-6)
    # Disjoint boxes: IoU 0, GIoU -> -1 as separation grows
    assert float(B.generalized_box_iou(a, far)[0, 0]) < -0.9


def test_elementwise_matches_pairwise_diagonal(rng):
    b1, b2 = random_xyxy(rng, 16), random_xyxy(rng, 16)
    pair = np.asarray(B.generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    elem = np.asarray(
        B.elementwise_generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2))
    )
    np.testing.assert_allclose(elem, np.diag(pair), atol=1e-6)


def test_leading_batch_dims(rng):
    b1 = np.stack([random_xyxy(rng, 7) for _ in range(3)])
    b2 = np.stack([random_xyxy(rng, 5) for _ in range(3)])
    giou = np.asarray(B.generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    assert giou.shape == (3, 7, 5)
    for i in range(3):
        np.testing.assert_allclose(giou[i], np_pairwise_giou(b1[i], b2[i]), atol=1e-5)


def test_degenerate_boxes_are_finite():
    zeros = jnp.zeros((4, 4))
    giou = np.asarray(B.generalized_box_iou(zeros, zeros))
    assert np.isfinite(giou).all()


def test_top1_accuracy_masked():
    logits = jnp.array([[5.0, 0.0], [0.0, 5.0], [5.0, 0.0]])
    targets = jnp.array([0, 1, 1])
    valid = jnp.array([True, True, True])
    assert float(B.top1_accuracy(logits, targets, valid)) == pytest.approx(200 / 3)
    valid = jnp.array([True, True, False])
    assert float(B.top1_accuracy(logits, targets, valid)) == pytest.approx(100.0)
    none = jnp.zeros(3, dtype=bool)
    assert float(B.top1_accuracy(logits, targets, none)) == 0.0


def test_clamp_boxes():
    boxes = jnp.array([[-5.0, -5.0, 50.0, 200.0]])
    out = np.asarray(B.clamp_boxes(boxes, jnp.array(100), jnp.array(40)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 40.0, 100.0]])
