"""Padding-masked scaled-dot-product attention core.

The XLA reference path for the attention math of the reference's hand-rolled
``ScaledDotProductAttention`` (reference detr/model.py:228-356): per-head
scores q @ k^T / sqrt(head_size), key-padding masking via fill with the
dtype's most-negative finite value *before* softmax (reference
detr/model.py:326-334), softmax, attention dropout, probs @ v.

Kept as a pure function so the Pallas fused masked-flash kernel
(detr_tpu/ops/pallas_attention.py) can swap in behind the same signature with
a correctness-diffing fallback (SURVEY §7 hard part #5).

Numerics: matmuls run in the caller's compute dtype (bf16 on TPU); the
softmax itself is computed in fp32 and cast back — matching torch autocast
semantics the reference trains under, and avoiding bf16 overflow artifacts
with the finfo-min fill (SURVEY §7 hard part #4).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def scaled_dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    key_padding_mask: Optional[Array] = None,
    attention_mask: Optional[Array] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Array:
    """Multi-head attention core.

    Args:
      q: (B, L, H, Dh) queries (already projected and head-split).
      k, v: (B, S, H, Dh) keys/values.
      key_padding_mask: optional (B, S) bool, True on *padded* key positions
        to be ignored (reference detr/model.py:275-280 semantics).
      attention_mask: optional (L, S) bool, True on disallowed pairs
        (reference detr/model.py:282-296 semantics).
      dropout_rate: attention-probability dropout (reference model.py:345).
      dropout_rng: RNG for dropout; required when active.
      deterministic: disables dropout when True (eval mode).

    Returns:
      (B, L, H, Dh) attention output in the input dtype.
    """
    in_dtype = q.dtype
    B, L, H, Dh = q.shape
    S = k.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32)).astype(in_dtype)

    # (B, H, L, S)
    scores = jnp.einsum("blhd,bshd->bhls", q, k) * scale

    neg_fill = jnp.finfo(scores.dtype).min
    if key_padding_mask is not None:
        scores = jnp.where(key_padding_mask[:, None, None, :], neg_fill, scores)
    if attention_mask is not None:
        scores = jnp.where(attention_mask[None, None, :, :], neg_fill, scores)

    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(in_dtype)

    if dropout_rate > 0.0 and not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when dropout is active")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhls,bshd->blhd", probs, v)
    return out.astype(in_dtype)
