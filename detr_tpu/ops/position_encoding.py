"""2D sine/cosine positional embeddings, fully vectorized.

Numerically equivalent (fp32) to the reference implementation at
detr/position_encoding.py:5-97, but with the per-image host Python loop that
builds ``linspace`` grids on device (reference position_encoding.py:57-67)
replaced by a single broadcasted computation from per-image valid extents —
shape-static, jit/vmap friendly, and free of host round trips.

Reference semantics reproduced exactly:
  * per-image x/y grids are ``linspace(0, 1, n)`` over the *valid* region and
    zero outside it (reference position_encoding.py:60-65);
  * coordinates are scaled by 2*pi (reference position_encoding.py:22-24);
  * frequencies ``temperature ** (2i / num_pos_feats)`` (reference
    position_encoding.py:33-38);
  * sin/cos interleaved via stack+flatten (reference
    position_encoding.py:51-52); y-embedding concatenated before x
    (reference position_encoding.py:53);
  * image extents are downscaled with ``ceil(size / stride)`` (reference
    position_encoding.py:88-89).

Layout divergence: we return channels-last ``(B, H, W, C)`` (TPU-friendly;
the reference returns NCHW at position_encoding.py:53).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _interleaved_sincos(coords: Array, num_pos_feats: int, temperature: float) -> Array:
    """coords (…,) in [0,1] -> (…, num_pos_feats) interleaved sin/cos."""
    coords = coords.astype(jnp.float32) * (2.0 * jnp.pi)
    # Frequencies [t^0, t^(2/n), t^(4/n), ...] — one per sin/cos pair
    # (reference position_encoding.py:33-38).
    exponents = jnp.arange(0, num_pos_feats, 2, dtype=jnp.float32) / num_pos_feats
    dim_t = jnp.power(jnp.float32(temperature), exponents)  # (num_pos_feats//2,)
    phase = coords[..., None] / dim_t  # (…, n/2)
    # stack+reshape interleaves: [sin f0, cos f0, sin f1, cos f1, ...]
    both = jnp.stack([jnp.sin(phase), jnp.cos(phase)], axis=-1)
    return both.reshape(*phase.shape[:-1], num_pos_feats)


def positional_encoding(
    grid_x: Array,
    grid_y: Array,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
) -> Array:
    """Sine embeddings from normalized coordinate grids.

    Args:
      grid_x, grid_y: (…, H, W) normalized coordinates in [0, 1].
    Returns:
      (…, H, W, 2 * num_pos_feats) with y-features first, then x
      (channels-last; reference returns NCHW).
    """
    pos_x = _interleaved_sincos(grid_x, num_pos_feats, temperature)
    pos_y = _interleaved_sincos(grid_y, num_pos_feats, temperature)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def _valid_linspace_grid(n_valid: Array, size: int) -> Array:
    """Vectorized ``linspace(0, 1, n_valid)`` zero-padded to ``size``.

    Args:
      n_valid: (B,) int — valid extent per image.
      size: static padded extent.
    Returns:
      (B, size) fp32; entry [b, i] = i / (n_valid[b] - 1) for i < n_valid[b],
      else 0 (and 0 everywhere when n_valid == 1, matching linspace(0,1,1)).
    """
    idx = jnp.arange(size, dtype=jnp.float32)[None, :]  # (1, size)
    n = n_valid.astype(jnp.float32)[:, None]  # (B, 1)
    denom = jnp.maximum(n - 1.0, 1.0)
    return jnp.where(idx < n, idx / denom, 0.0)


def batch_positional_encoding(
    feat_height: int,
    feat_width: int,
    valid_heights: Array,
    valid_widths: Array,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
) -> Array:
    """Batched embeddings from per-image valid feature extents.

    Replaces the reference's per-image device loop (position_encoding.py:57-67)
    with one broadcasted pass.  Grids are linspace over the valid rectangle and
    zero on padding.

    Args:
      valid_heights / valid_widths: (B,) int valid extents in *feature* cells.
    Returns:
      (B, feat_height, feat_width, 2 * num_pos_feats) fp32, channels-last.
    """
    gx = _valid_linspace_grid(valid_widths, feat_width)  # (B, W)
    gy = _valid_linspace_grid(valid_heights, feat_height)  # (B, H)
    # Zero outside the valid rectangle in *both* axes (reference writes the
    # linspace grid only into [:h, :w]).
    row_valid = (
        jnp.arange(feat_height)[None, :] < valid_heights[:, None]
    )  # (B, H)
    col_valid = jnp.arange(feat_width)[None, :] < valid_widths[:, None]  # (B, W)
    inside = row_valid[:, :, None] & col_valid[:, None, :]  # (B, H, W)
    grid_x = jnp.where(inside, gx[:, None, :], 0.0)
    grid_y = jnp.where(inside, gy[:, :, None], 0.0)
    return positional_encoding(grid_x, grid_y, num_pos_feats, temperature)


def scaled_valid_extent(image_extent: Array, stride: int) -> Array:
    """``ceil(extent / stride)`` as int32 (reference position_encoding.py:88-89)."""
    return jnp.ceil(image_extent.astype(jnp.float32) / float(stride)).astype(jnp.int32)


def sine_position_embedding(
    feat_height: int,
    feat_width: int,
    image_heights: Array,
    image_widths: Array,
    stride: int = 32,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
) -> Array:
    """Full equivalent of the reference ``PositionalEncoding`` module
    (position_encoding.py:70-97): downscales per-image pixel extents by the
    backbone stride with ceil, then emits batched embeddings.

    Returns (B, feat_height, feat_width, 2 * num_pos_feats) fp32.
    """
    sh = scaled_valid_extent(image_heights, stride)
    sw = scaled_valid_extent(image_widths, stride)
    return batch_positional_encoding(
        feat_height, feat_width, sh, sw, num_pos_feats, temperature
    )
