"""On-device multi-scale image resize: the wire-bandwidth half of the input
pipeline, moved onto the MXU.

The reference resizes every image to its augmented target size on the host
(torchvision ``RandomShortestSize`` -> bilinear/antialias resample;
reference detr/data.py:31-56) and ships the big result.  On this design
the host ships the SOURCE-resolution uint8 pixels (COCO sources are
<= 640px a side; the augmented target is up to 800x1333 — ~2.5-4x more
bytes) and the jitted train step resamples on device:

  * separable resampling as two batched matmuls — ``out = Wh @ img @ Ww^T``
    per image — which is exactly how the MXU wants it (vs a gather-based
    bilinear that would be VPU/scatter-bound);
  * the per-image weight matrices are built inside the program from the
    true (src_h, src_w) -> (dst_h, dst_w) scalars with broadcasted iota
    arithmetic: fixed SHAPES (canvas-sized), value-dependent CONTENT — the
    XLA-friendly encoding of "every image in the batch resizes to its own
    augmented size";
  * the filter reproduces PIL/torchvision semantics (the same math as our
    host resampler, native/image_ops.cc): a triangle (bilinear) kernel with
    support stretched by the downscale factor (antialias), normalized over
    the in-bounds window — which also makes source zero-padding
    mathematically invisible (out-of-extent taps get zero weight);
  * rows/cols beyond the destination extent produce zeros, matching the
    zero-padded uint8 wire canvas the rest of the stack already masks.

Upscale (scale >= 1) degenerates to classic bilinear (support 1); identity
(src == dst) yields an exact permutation matrix, so images the host chose
to resize itself (source larger than target: shipping the target is
cheaper) pass through bit-clean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _axis_weights(dst_size: int, src_size: int, dst_true, src_true) -> Array:
    """(dst_size, src_size) fp32 resampling matrix for one axis of one image.

    Maps the true ``src_true`` extent onto the true ``dst_true`` extent with
    PIL-convention pixel centers (``(i + 0.5) / scale``); everything outside
    either true extent gets weight zero.  ``dst_true``/``src_true`` are
    traced int32 scalars.
    """
    src_true_f = src_true.astype(jnp.float32)
    dst_true_f = dst_true.astype(jnp.float32)
    scale = dst_true_f / jnp.maximum(src_true_f, 1.0)
    # Antialias: triangle support stretched by the downscale factor
    # (PIL LANCZOS/BILINEAR convention: support = filter.support * max(1,
    # 1/scale); bilinear filter.support == 1).
    support = jnp.maximum(1.0, 1.0 / jnp.maximum(scale, 1e-6))
    d = jnp.arange(dst_size, dtype=jnp.float32)[:, None]  # (D, 1)
    s = jnp.arange(src_size, dtype=jnp.float32)[None, :]  # (1, S)
    center = (d + 0.5) / scale  # in source coordinates
    w = jnp.maximum(0.0, 1.0 - jnp.abs(s + 0.5 - center) / support)
    w = jnp.where((s < src_true_f) & (d < dst_true_f), w, 0.0)
    return w / jnp.maximum(w.sum(axis=-1, keepdims=True), 1e-12)


def resize_on_device(
    images: Array,  # (B, SH, SW, C) uint8/float — zero-padded source canvas
    src_h: Array,  # (B,) int32 true source extents
    src_w: Array,
    dst_h: Array,  # (B,) int32 true target extents (augmented sizes)
    dst_w: Array,
    canvas: tuple[int, int],  # static (CH, CW) output canvas
) -> Array:
    """Per-image resample (src_h, src_w) -> (dst_h, dst_w) into a fixed
    (B, CH, CW, C) fp32 canvas, zero outside each image's target extent.

    Cost at the flagship config (B=8 onto an 832x1344 canvas from a 672px
    source canvas): ~45 GFLOP fp32 — noise next to the ~2.4 TFLOP train
    step, and it buys ~2.5-4x less host->device traffic plus removing the
    host resample (~45% of the reference-equivalent augmentation chain).
    """
    CH, CW = canvas
    B = images.shape[0]
    SH, SW = images.shape[1], images.shape[2]
    x = images.astype(jnp.float32)
    wh = jax.vmap(lambda dt, st: _axis_weights(CH, SH, dt, st))(dst_h, src_h)
    ww = jax.vmap(lambda dt, st: _axis_weights(CW, SW, dt, st))(dst_w, src_w)
    # (B,CH,SH) @ (B,SH,SW,C) @ (B,CW,SW)^T — two MXU-shaped contractions.
    tmp = jnp.einsum("bds,bswc->bdwc", wh, x, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("bdwc,bew->bdec", tmp, ww, precision=jax.lax.Precision.HIGHEST)
    return out
