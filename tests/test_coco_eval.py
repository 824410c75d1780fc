"""COCO mAP evaluator tests: hand-computable cases following the COCOeval

protocol (101-pt interpolation, 10 IoU thresholds, crowd/area ignore)."""

import numpy as np
import pytest

from detr_tpu.eval import CocoEvaluator, DetectionMetrics, PostProcess


def single_image_eval(det_boxes, det_scores, det_labels, gt_boxes, gt_labels,
                      iscrowd=None, num_classes=1):
    ev = CocoEvaluator(num_classes)
    ev.add_image(1, np.array(det_boxes, float), np.array(det_scores, float),
                 np.array(det_labels), np.array(gt_boxes, float),
                 np.array(gt_labels), None if iscrowd is None else np.array(iscrowd))
    return ev.compute()


def test_perfect_detection():
    out = single_image_eval(
        [[10, 10, 50, 50]], [0.9], [0], [[10, 10, 50, 50]], [0]
    )
    assert out["AP"] == pytest.approx(1.0)
    assert out["AP50"] == pytest.approx(1.0)
    assert out["AP75"] == pytest.approx(1.0)


def test_iou_060_matches_three_thresholds():
    # det vs gt IoU = 0.6 -> TP at t in {0.5, 0.55, 0.6} only
    out = single_image_eval(
        [[0, 0, 10, 6]], [0.9], [0], [[0, 0, 10, 10]], [0]
    )
    assert out["AP"] == pytest.approx(0.3, abs=1e-6)
    assert out["AP50"] == pytest.approx(1.0)
    assert out["AP75"] == pytest.approx(0.0)


def test_high_scoring_fp_halves_ap():
    out = single_image_eval(
        [[200, 200, 220, 220], [10, 10, 50, 50]],
        [0.95, 0.9],
        [0, 0],
        [[10, 10, 50, 50]],
        [0],
    )
    assert out["AP"] == pytest.approx(0.5, abs=1e-6)


def test_partial_recall():
    # 2 GTs, 1 perfect det -> recall 0.5 at precision 1 -> AP = 51/101
    out = single_image_eval(
        [[10, 10, 50, 50]],
        [0.9],
        [0],
        [[10, 10, 50, 50], [100, 100, 140, 140]],
        [0, 0],
    )
    assert out["AP"] == pytest.approx(51 / 101, abs=1e-6)


def test_crowd_gt_ignores_matching_det():
    # det overlapping a crowd GT is neither TP nor FP; the other det is TP
    out = single_image_eval(
        [[10, 10, 50, 50], [100, 100, 150, 150]],
        [0.9, 0.8],
        [0, 0],
        [[10, 10, 50, 50], [95, 95, 160, 160]],
        [0, 0],
        iscrowd=[False, True],
    )
    assert out["AP"] == pytest.approx(1.0)


def test_class_without_gt_excluded():
    ev = CocoEvaluator(2)
    ev.add_image(
        1,
        np.array([[10.0, 10, 50, 50]]),
        np.array([0.9]),
        np.array([0]),
        np.array([[10.0, 10, 50, 50]]),
        np.array([0]),
    )
    out = ev.compute()
    assert out["AP"] == pytest.approx(1.0)  # class 1 has no GT -> excluded
    assert out["per_class"][1] == -1.0


def test_area_ranges():
    # one small GT (20x20=400 < 1024), one large GT (200x200)
    out = single_image_eval(
        [[0, 0, 20, 20], [300, 300, 500, 500]],
        [0.9, 0.8],
        [0, 0],
        [[0, 0, 20, 20], [300, 300, 500, 500]],
        [0, 0],
    )
    assert out["AP-small"] == pytest.approx(1.0)
    assert out["AP-large"] == pytest.approx(1.0)
    assert out["AP-medium"] == -1.0


def test_duplicate_detections_second_is_fp():
    # two dets on the same GT: best-score matches, duplicate is FP
    out = single_image_eval(
        [[10, 10, 50, 50], [11, 11, 51, 51]],
        [0.9, 0.8],
        [0, 0],
        [[10, 10, 50, 50]],
        [0],
    )
    # rank1 TP (rc 1, pr 1), rank2 FP -> interp precision still 1 at all recalls
    assert out["AP50"] == pytest.approx(1.0)


def test_multi_image_accumulation():
    ev = CocoEvaluator(1)
    ev.add_image(1, np.array([[0.0, 0, 10, 10]]), np.array([0.9]), np.array([0]),
                 np.array([[0.0, 0, 10, 10]]), np.array([0]))
    ev.add_image(2, np.zeros((0, 4)), np.zeros(0), np.zeros(0, int),
                 np.array([[0.0, 0, 10, 10]]), np.array([0]))
    out = ev.compute()
    # 2 GTs, 1 TP -> AP = 51/101
    assert out["AP"] == pytest.approx(51 / 101, abs=1e-6)


def test_detection_metrics_wrapper():
    m = DetectionMetrics(["cat", "dog"])
    preds = [
        {
            "boxes": np.array([[10.0, 10, 50, 50]]),
            "scores": np.array([0.9]),
            "labels": np.array([0]),
        }
    ]
    batch = {
        "image_id": np.array([5]),
        "boxes": np.array([[[10.0, 10, 50, 50]] + [[0, 0, 0, 0]] * 4]),
        "class_idx": np.zeros((1, 5), int),
        "iscrowd": np.zeros((1, 5), bool),
        "gt_valid": np.array([[True, False, False, False, False]]),
    }
    m.update(preds, batch)
    out = m.compute()
    assert out["AP"] == pytest.approx(1.0)
    assert out["AP-per-class/cat"] == pytest.approx(1.0)
    assert out["AP-per-class/dog"] == 0.0
    m.reset()


def test_postprocess(rng):
    B, Q, C = 2, 5, 3
    logits = rng.normal(size=(B, Q, C + 1)).astype(np.float32)
    boxes = np.tile([0.5, 0.5, 0.2, 0.2], (B, Q, 1)).astype(np.float32)
    pp = PostProcess(["a", "b", "c"])
    res = pp(logits, boxes, np.array([100, 200]), np.array([100, 400]))
    assert len(res) == 2
    # cxcywh (0.5,0.5,0.2,0.2) on 100x100 -> xyxy (40,40,60,60)
    np.testing.assert_allclose(res[0]["boxes"][0], [40, 40, 60, 60], atol=1e-4)
    np.testing.assert_allclose(res[1]["boxes"][0], [160, 80, 240, 120], atol=1e-3)
    assert (res[0]["labels"] < C).all()  # no-object column excluded
    # score threshold filters
    res_t = pp(logits, boxes, np.array([100, 200]), np.array([100, 400]),
               score_threshold=2.0)
    assert len(res_t[0]["scores"]) == 0


def test_native_kernel_matches_numpy(rng):
    """The C++ matching kernel (native/cocoeval.cc) agrees with the numpy

    fallback on random inputs (skipped when no C++ toolchain)."""
    from detr_tpu.eval import _native

    if _native.load() is None:
        pytest.skip("no C++ toolchain")

    from detr_tpu.eval.coco_eval import IOU_THRESHOLDS, _iou_matrix

    for trial in range(20):
        D, G = int(rng.integers(0, 12)) + 1, int(rng.integers(1, 8))
        dets = np.sort(rng.uniform(0, 100, (D, 2, 2)), axis=1).reshape(D, 4)[:, [0, 2, 1, 3]]
        gts = np.sort(rng.uniform(0, 100, (G, 2, 2)), axis=1).reshape(G, 4)[:, [0, 2, 1, 3]]
        crowd = rng.random(G) < 0.3
        ignore = crowd | (rng.random(G) < 0.2)
        # sort real-first like the evaluator
        order = np.argsort(ignore, kind="mergesort")
        gts, crowd, ignore = gts[order], crowd[order], ignore[order]

        ious = _iou_matrix(dets, gts, crowd)
        n_ious = _native.iou_matrix(dets, gts, crowd)
        np.testing.assert_allclose(n_ious, ious, atol=1e-12)

        m_nat, mi_nat = _native.match_detections(ious, crowd, ignore, IOU_THRESHOLDS)

        # numpy reference (mirrors coco_eval fallback)
        T, Dn, Gn = len(IOU_THRESHOLDS), D, G
        m_ref = np.zeros((T, Dn), bool)
        mi_ref = np.zeros((T, Dn), bool)
        for ti, t in enumerate(IOU_THRESHOLDS):
            taken = np.zeros(Gn, bool)
            for d in range(Dn):
                best_iou = min(t, 1 - 1e-10)
                best_g = -1
                for g in range(Gn):
                    if taken[g] and not crowd[g]:
                        continue
                    if best_g > -1 and not ignore[best_g] and ignore[g]:
                        break
                    if ious[d, g] < best_iou:
                        continue
                    best_iou = ious[d, g]
                    best_g = g
                if best_g >= 0:
                    m_ref[ti, d] = True
                    mi_ref[ti, d] = ignore[best_g]
                    taken[best_g] = True
        np.testing.assert_array_equal(m_nat, m_ref)
        np.testing.assert_array_equal(mi_nat, mi_ref)


def test_batched_native_compute_matches_per_image_path(rng):
    """The batched native evaluate (one evaluate_blocks call per class,
    native/cocoeval.cc) must agree EXACTLY with the per-image fallback on
    randomized content covering crowds, area edges, empty images, and a
    >MAX_DETS same-class overflow (skipped when no C++ toolchain)."""
    from detr_tpu.eval import _native
    from detr_tpu.eval.coco_eval import CocoEvaluator

    if _native.load() is None:
        pytest.skip("no C++ toolchain")

    C = 7

    def boxes(n, scale=300.0):
        b = np.sort(rng.uniform(0, scale, (n, 2, 2)), axis=1)
        return b.reshape(n, 4)[:, [0, 2, 1, 3]].astype(np.float64)

    ev = CocoEvaluator(num_classes=C)
    for i in range(40):
        ng = int(rng.integers(0, 10))
        nd = int(rng.integers(0, 14))
        if i == 3:
            nd = 130  # same-class maxDets overflow
            dl = np.zeros(nd, np.int64)
        else:
            dl = rng.integers(0, C, nd)
        ev.add_image(
            i, boxes(nd), np.round(rng.random(nd), 1), dl,
            boxes(ng), rng.integers(0, C, ng), rng.random(ng) < 0.25,
        )

    batched = ev.compute()
    # force the per-image fallback
    orig = CocoEvaluator._class_precisions_batched
    CocoEvaluator._class_precisions_batched = lambda self, p, c: None
    try:
        fallback = ev.compute()
    finally:
        CocoEvaluator._class_precisions_batched = orig

    for k in ("AP", "AP50", "AP75", "AP-small", "AP-medium", "AP-large"):
        assert batched[k] == pytest.approx(fallback[k], abs=1e-12), k
    np.testing.assert_allclose(
        batched["per_class"], fallback["per_class"], atol=1e-12
    )
