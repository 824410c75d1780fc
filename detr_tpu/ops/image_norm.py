"""On-device image normalization (uint8 wire format).

The reference normalizes on the CPU inside torchvision transforms
(reference detr/data.py:60-63) and ships fp32 over PCIe.  TPU-natively
that is 4x wasted host->device bandwidth: the trainer ships the augmented
images as uint8 and the jitted step normalizes on device, where the
multiply/subtract fuses into the first convolution's input handling.

Semantics match the host path exactly (fp32 ``x * scale - bias`` with the
same folded constants as data/transforms.normalize, i.e. (x/255 - mean)/std)
including the reference's pad-after-normalize convention
(detr/data.py:199-203): pixels beyond each image's valid (height, width)
are forced to exactly 0.0 after normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# THE folded constants — imported from the host path, not re-derived, so
# the two wire formats (uint8 device-normalize vs fp32 host-normalize)
# cannot silently desynchronize.
from detr_tpu.data.transforms import _NORM_BIAS as _BIAS  # noqa: F401
from detr_tpu.data.transforms import _NORM_SCALE as _SCALE  # noqa: F401

Array = jax.Array


def device_normalize_image(
    image: Array, height: Array, width: Array
) -> Array:
    """(B, H, W, 3) uint8 + per-image valid extents -> fp32 normalized.

    fp32 output regardless of the model's compute dtype — the model casts
    at its first op like it does for host-normalized input, so the two wire
    formats are numerically identical.
    """
    B, H, W, _ = image.shape
    x = image.astype(jnp.float32) * _SCALE - _BIAS
    rows = jnp.arange(H, dtype=jnp.int32)[None, :, None] < height[:, None, None]
    cols = jnp.arange(W, dtype=jnp.int32)[None, None, :] < width[:, None, None]
    return jnp.where((rows & cols)[..., None], x, 0.0)


def prepare_image(batch_image: Array, height: Array, width: Array) -> Array:
    """Batch image in either wire format -> normalized fp32 (trace-time
    static dispatch on dtype)."""
    if batch_image.dtype == jnp.uint8:
        return device_normalize_image(batch_image, height, width)
    return batch_image


def prepare_batch_image(
    batch: dict[str, Array],
    canvas_map: "dict[tuple[int, int], tuple[int, int]] | None" = None,
) -> Array:
    """Full wire dispatcher: fp32 host-normalized, uint8 device-normalize,
    or the device-resize wire (``src_height``/``src_width`` present:
    source-resolution uint8 resampled on device to each image's augmented
    ``height`` x ``width``, then normalized).  ``canvas_map`` maps the
    static source-canvas shape to the target canvas (the shapes are
    distinct by construction — data/bucketing.derive_source_buckets), so
    the dispatch is trace-time static with no API change at the step."""
    image = batch["image"]
    if "src_height" in batch:
        from detr_tpu.ops.device_resize import resize_on_device

        if canvas_map is None:
            raise ValueError(
                "device-resize wire batch but the step was built without a "
                "canvas_map (pass TrainingConfig.device_resize through)"
            )
        canvas = canvas_map[(int(image.shape[1]), int(image.shape[2]))]
        x = resize_on_device(
            image, batch["src_height"], batch["src_width"],
            batch["height"], batch["width"], canvas,
        )
        # Same folded normalize + pad-to-exact-zero contract as the uint8
        # wire; x is already zero outside each extent, but normalize maps
        # 0 -> -bias, so re-mask.
        x = x * _SCALE - _BIAS
        H, W = canvas
        rows = (
            jnp.arange(H, dtype=jnp.int32)[None, :, None]
            < batch["height"][:, None, None]
        )
        cols = (
            jnp.arange(W, dtype=jnp.int32)[None, None, :]
            < batch["width"][:, None, None]
        )
        return jnp.where((rows & cols)[..., None], x, 0.0)
    return prepare_image(image, batch["height"], batch["width"])
