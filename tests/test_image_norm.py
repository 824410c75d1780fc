"""uint8 wire format: on-device normalization parity (ops/image_norm.py).

The trainer ships augmented images to the chip as uint8 (4x less H2D
bandwidth) and the jitted step normalizes on device; these pin that the
device path is numerically identical to the host-normalized fp32 path,
including the reference's pad-after-normalize zero convention
(reference detr/data.py:199-203).
"""

import numpy as np

from detr_tpu.data.bucketing import assemble_batch
from detr_tpu.ops.image_norm import device_normalize_image, prepare_image


def _items(rng, n=3, bucket=(64, 96)):
    items = []
    for _ in range(n):
        h = int(rng.integers(32, bucket[0] + 1))
        w = int(rng.integers(32, bucket[1] + 1))
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        t = {
            "boxes": np.zeros((0, 4), np.float32),
            "class_idx": np.zeros((0,), np.int32),
            "class_id": np.zeros((0,), np.int32),
            "iscrowd": np.zeros((0,), bool),
        }
        items.append((img, t))
    return items


def test_device_normalize_matches_host_path():
    rng = np.random.default_rng(0)
    items = _items(rng)
    host = assemble_batch(items, (64, 96), max_gt=4)  # fp32, host-normalized
    wire = assemble_batch(items, (64, 96), max_gt=4, image_dtype="uint8")
    assert wire["image"].dtype == np.uint8
    assert host["image"].dtype == np.float32

    dev = np.asarray(
        device_normalize_image(
            wire["image"], wire["height"], wire["width"]
        )
    )
    # Same fp32 formula (x*scale - bias) on both sides.
    np.testing.assert_allclose(dev, host["image"], atol=1e-6)


def test_device_normalize_zeroes_padding():
    rng = np.random.default_rng(1)
    items = _items(rng, n=2)
    wire = assemble_batch(items, (64, 96), max_gt=4, image_dtype="uint8")
    dev = np.asarray(
        device_normalize_image(wire["image"], wire["height"], wire["width"])
    )
    for b in range(2):
        h, w = int(wire["height"][b]), int(wire["width"][b])
        assert (dev[b, h:, :] == 0).all()
        assert (dev[b, :, w:] == 0).all()


def test_prepare_image_passthrough_fp32():
    import jax.numpy as jnp

    x = jnp.ones((1, 8, 8, 3), jnp.float32) * 0.5
    out = prepare_image(x, jnp.asarray([8]), jnp.asarray([8]))
    assert out is x  # static dispatch: fp32 untouched


def test_assemble_batch_uint8_rejects_normalized_floats():
    import pytest

    rng = np.random.default_rng(2)
    (img, t), = _items(rng, n=1)
    bad = [(img.astype(np.float32) / 255.0, t)]
    with pytest.raises(AssertionError):
        assemble_batch(bad, (64, 96), max_gt=4, image_dtype="uint8")
