"""On-device resize (ops/device_resize.py) vs the host resampler.

The host resampler (data/transforms.py::resize — native C++ or PIL
bilinear/antialias, itself golden-tested against torchvision in
tests/test_resize_numerics.py) is the parity oracle: the device matmul
resample must land within quantization distance of it, padding must be
invisible, and identity must be exact.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from detr_tpu.data import transforms as T
from detr_tpu.ops.device_resize import resize_on_device


def _host_resize(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    out, _ = T.resize(img, {"boxes": np.zeros((0, 4), np.float32)}, th, tw)
    return out


def _device_resize(img: np.ndarray, th: int, tw: int, canvas=None, src_canvas=None):
    h, w = img.shape[:2]
    sh, sw = src_canvas or (h, w)
    ch, cw = canvas or (th, tw)
    src = np.zeros((1, sh, sw, 3), np.uint8)
    src[0, :h, :w] = img
    out = resize_on_device(
        jnp.asarray(src),
        jnp.asarray([h], jnp.int32), jnp.asarray([w], jnp.int32),
        jnp.asarray([th], jnp.int32), jnp.asarray([tw], jnp.int32),
        (ch, cw),
    )
    return np.asarray(out[0])


@pytest.mark.parametrize(
    "shape,target",
    [
        ((480, 640), (360, 480)),   # antialiased downscale
        ((320, 320), (800, 800)),   # bilinear upscale
        ((456, 356), (800, 625)),   # rect upscale (val-transform-like)
        ((640, 480), (256, 192)),   # strong downscale
    ],
)
def test_matches_host_resampler(rng, shape, target):
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    th, tw = target
    ref = _host_resize(img, th, tw).astype(np.float32)
    got = _device_resize(img, th, tw)
    err = np.abs(np.round(np.clip(got, 0, 255)) - ref)
    # host path quantizes to uint8 (and PIL quantizes per separable stage);
    # the fp32 device path differs by at most quantization wobble
    assert err.mean() < 0.75, err.mean()
    assert np.quantile(err, 0.999) <= 2.0
    assert err.max() <= 4.0


def test_identity_exact(rng):
    img = rng.integers(0, 256, (120, 90, 3), dtype=np.uint8)
    got = _device_resize(img, 120, 90)
    np.testing.assert_array_equal(np.asarray(got), img.astype(np.float32))


def test_source_padding_invisible(rng):
    """Zero padding beyond the true source extent must not bleed into the
    result (the weight window is clipped to the true extent)."""
    img = rng.integers(0, 256, (100, 140, 3), dtype=np.uint8)
    tight = _device_resize(img, 160, 224)
    padded = _device_resize(img, 160, 224, src_canvas=(256, 256), canvas=(160, 224))
    np.testing.assert_allclose(padded, tight, atol=1e-3)


def test_canvas_padding_zero(rng):
    """Rows/cols beyond the target extent are exactly zero (the wire
    contract the padding mask + normalize stage rely on)."""
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    out = _device_resize(img, 96, 80, canvas=(128, 128))
    assert np.abs(out[96:, :]).max() == 0.0
    assert np.abs(out[:, 80:]).max() == 0.0
    assert np.abs(out[:96, :80]).min() >= 0.0 and np.abs(out[:96, :80]).mean() > 1.0


def test_batched_mixed_sizes(rng):
    """Each image in a batch resizes to its own target (the multi-scale
    augmentation case) and matches its single-image result."""
    imgs = [
        rng.integers(0, 256, (200, 300, 3), dtype=np.uint8),
        rng.integers(0, 256, (256, 128, 3), dtype=np.uint8),
    ]
    targets = [(150, 225), (400, 200)]
    sh, sw, ch, cw = 256, 320, 416, 256
    src = np.zeros((2, sh, sw, 3), np.uint8)
    for i, im in enumerate(imgs):
        src[i, : im.shape[0], : im.shape[1]] = im
    out = resize_on_device(
        jnp.asarray(src),
        jnp.asarray([im.shape[0] for im in imgs], jnp.int32),
        jnp.asarray([im.shape[1] for im in imgs], jnp.int32),
        jnp.asarray([t[0] for t in targets], jnp.int32),
        jnp.asarray([t[1] for t in targets], jnp.int32),
        (ch, cw),
    )
    for i, (im, (th, tw)) in enumerate(zip(imgs, targets)):
        single = _device_resize(im, th, tw, canvas=(ch, cw))
        np.testing.assert_allclose(np.asarray(out[i]), single, atol=1e-3)
