"""InferenceEngine: fixed-shape serving path (detr_tpu/serve/engine.py)."""

import numpy as np
import pytest

from detr_tpu.config import DETRConfig
from detr_tpu.serve import InferenceEngine

TINY = DETRConfig(
    num_object_queries=8,
    num_encoder_layers=1,
    num_decoder_layers=2,
    num_attention_heads=2,
    hidden_size=16,
    ffn_scale_factor=2,
    num_classes=3,
    dtype="float32",
)

BUCKETS = ((64, 96), (96, 64))


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine(
        TINY,
        class_names=["a", "b", "c"],
        batch_size=2,
        buckets=BUCKETS,
        min_size=64,
        max_size=96,
    )


def _img(rng, h, w):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


def test_predict_shapes_and_order(engine):
    rng = np.random.default_rng(0)
    # Mixed aspect ratios and sizes, more than one batch per bucket.
    images = [
        _img(rng, 100, 150),
        _img(rng, 150, 100),
        _img(rng, 30, 45),
        _img(rng, 200, 300),
        _img(rng, 64, 96),
    ]
    results = engine.predict(images)
    assert len(results) == len(images)
    Q = TINY.num_object_queries
    for img, det in zip(images, results):
        assert set(det) >= {"scores", "labels", "boxes", "class_names"}
        n = len(det["scores"])
        assert n <= Q and det["boxes"].shape == (n, 4)
        assert all(name in ("a", "b", "c") for name in det["class_names"])
        # Boxes come back in ORIGINAL pixel coordinates.
        oh, ow = img.shape[:2]
        assert (det["boxes"][:, [0, 2]] <= ow + 1e-3).all()
        assert (det["boxes"][:, [1, 3]] <= oh + 1e-3).all()
        assert (det["boxes"] >= -1e-3).all()


def test_batching_equivalence(engine):
    """A batched call returns exactly the per-image results (padded rows
    must not leak into real outputs)."""
    rng = np.random.default_rng(1)
    images = [_img(rng, 80, 120), _img(rng, 90, 60), _img(rng, 120, 80)]
    batched = engine.predict(images)
    for img, det in zip(images, batched):
        single = engine.predict([img])[0]
        np.testing.assert_allclose(single["scores"], det["scores"], rtol=1e-5)
        np.testing.assert_array_equal(single["labels"], det["labels"])
        np.testing.assert_allclose(single["boxes"], det["boxes"], rtol=1e-4, atol=1e-3)


def test_score_threshold():
    eng = InferenceEngine(
        TINY,
        batch_size=1,
        buckets=BUCKETS,
        min_size=64,
        max_size=96,
        score_threshold=1.1,  # impossible: softmax scores < 1
    )
    det = eng.predict([np.zeros((70, 70, 3), np.uint8)])[0]
    assert len(det["scores"]) == 0 and det["boxes"].shape == (0, 4)


def test_checkpoint_roundtrip(tmp_path):
    """Engine restores trainer-written weights (weights-only serving load)."""
    import jax

    from detr_tpu.train import build_optimizer, create_train_state
    from detr_tpu.train.checkpoint import CheckpointManager
    from detr_tpu.config import TrainingConfig
    from detr_tpu.models import DETR

    model = DETR(TINY)
    tx, _ = build_optimizer(
        TrainingConfig(cumulative_train_batch_size=1, train_batch_size=1)
    )
    batch = {
        "image": np.zeros((1, 64, 96, 3), np.float32),
        "height": np.array([64], np.int32),
        "width": np.array([96], np.int32),
    }
    state = create_train_state(model, tx, jax.random.PRNGKey(7), batch)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(0, state)
    mgr.close()

    eng = InferenceEngine(
        TINY, checkpoint_dir=str(tmp_path), batch_size=1, buckets=BUCKETS,
        min_size=64, max_size=96,
    )
    leaves_ckpt = jax.tree.leaves(state.params)
    leaves_eng = jax.tree.leaves(eng._params)
    assert all(
        np.allclose(a, b) for a, b in zip(leaves_ckpt, leaves_eng)
    )
    det = eng.predict([np.zeros((70, 70, 3), np.uint8)])[0]
    assert "scores" in det


def test_unit_scale_float_rejected(engine):
    """[0, 1]-scaled float input would normalize to ~-2 everywhere and
    return confident nonsense; the engine must fail loudly instead."""
    rng = np.random.default_rng(1)
    img01 = rng.random((64, 96, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="0-255"):
        engine.predict([img01])
    # The same image on the 0-255 scale is accepted.
    results = engine.predict([img01 * 255.0])
    assert len(results) == 1


def test_dark_float_images_accepted(engine):
    """Legitimately dark 0-255-scale floats must stay servable: an
    all-black frame (identical on both scales) and a near-black frame with
    max pixel 2.0/255 are real camera-feed requests, not client bugs."""
    black = np.zeros((64, 96, 3), np.float32)
    dark = np.full((64, 96, 3), 2.0, np.float32)
    results = engine.predict([black, dark])
    assert len(results) == 2
    assert all("scores" in r for r in results)
