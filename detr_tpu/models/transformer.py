"""Pre-LayerNorm transformer encoder/decoder (flax.linen).

Semantics mirror the reference's hand-rolled modules exactly (SURVEY §7.3):
  * MultiHeadAttention — separate Q/K/V/output projections, 8 heads x 32,
    key-padding masking before softmax, attention-prob dropout then residual
    dropout after the output projection (reference detr/model.py:228-356);
  * EncoderLayer — pre-LN self-attention with the positional embedding added
    to q and k only (value is the un-embedded normed input) then FFN
    (reference detr/model.py:212-225);
  * DecoderLayer — pre-LN self-attention over queries (q = k = LN(x) +
    query_embed, value = LN(x)), cross-attention to encoder tokens (k =
    tokens + pos, v = tokens, image key-padding mask), FFN (reference
    detr/model.py:154-183);
  * Decoder — starts from zeros and stacks the shared-final-norm output of
    every layer for deep supervision -> (B, num_layers, Q, D) (reference
    detr/model.py:137-151);
  * FFN — Linear(d, 8d) -> GELU(tanh) -> Dropout -> Linear(8d, d) -> Dropout
    (reference detr/model.py:395-424);
  * MLP box head — Linear stack with GELU(tanh) between (reference
    detr/model.py:359-392);
  * init — normal(initializer_range) for all Linear kernels, zero biases,
    ones/zeros LayerNorm (reference detr/model.py:127-135,196-204).

TPU-native choices: parameters are fp32; matmuls run in ``config.dtype``
(bf16); LayerNorm and softmax run in fp32 (torch-autocast-equivalent
islands).  The attention core is a pure function (detr_tpu/ops/attention.py)
so the Pallas fused kernel can swap in.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from detr_tpu.config import DETRConfig
from detr_tpu.ops.attention import scaled_dot_product_attention
from detr_tpu.ops.dropout import hash_dropout

Array = jax.Array


def _normal_init(std: float):
    return nn.initializers.normal(stddev=std)


class MultiHeadAttention(nn.Module):
    """Reference ``ScaledDotProductAttention`` (detr/model.py:228-356)."""

    config: DETRConfig

    @nn.compact
    def __call__(
        self,
        query: Array,
        key: Array,
        value: Array,
        key_padding_mask: Optional[Array] = None,
        attention_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        dense = lambda name: nn.Dense(  # noqa: E731
            cfg.hidden_size,
            dtype=dtype,
            param_dtype=jnp.float32,
            kernel_init=_normal_init(cfg.initializer_range),
            bias_init=nn.initializers.zeros,
            name=name,
        )
        B, L, _ = query.shape
        S = key.shape[1]
        H, Dh = cfg.num_attention_heads, cfg.head_size

        q = dense("query_proj")(query).reshape(B, L, H, Dh)
        k = dense("key_proj")(key).reshape(B, S, H, Dh)
        v = dense("value_proj")(value).reshape(B, S, H, Dh)

        dropout_rng = None
        attn_drop = cfg.attention_probs_dropout_prob
        if attn_drop > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        # Fused Pallas path: any attention without an (L, S) attention_mask
        # (never used by DETR).  Dropout runs inside the kernel from a
        # counter-based hash mask, so the train path is fused too; the
        # backward kernel regenerates the identical mask from the seed
        # (see detr_tpu/ops/pallas_attention.py).
        from detr_tpu.ops.pallas_attention import pallas_attention_enabled

        use_pallas = (
            pallas_attention_enabled(cfg.use_pallas_attention)
            and attention_mask is None
        )
        if use_pallas:
            from detr_tpu.ops.pallas_attention import pallas_masked_attention

            if dropout_rng is not None:
                rate = attn_drop
                seed = jax.random.randint(
                    dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
                )
            else:
                rate, seed = 0.0, None
            out = pallas_masked_attention(q, k, v, key_padding_mask, seed, rate)
        else:
            out = scaled_dot_product_attention(
                q,
                k,
                v,
                key_padding_mask=key_padding_mask,
                attention_mask=attention_mask,
                dropout_rate=attn_drop,
                dropout_rng=dropout_rng,
                deterministic=deterministic,
            )
        out = out.reshape(B, L, cfg.hidden_size)

        out = dense("output_proj")(out)
        rate = cfg.hidden_dropout_prob
        out = hash_dropout(
            out,
            rate,
            self.make_rng("dropout") if (rate > 0.0 and not deterministic) else None,
            deterministic,
        )
        return out


class FFN(nn.Module):
    """Reference FFN (detr/model.py:395-424)."""

    config: DETRConfig

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x = nn.Dense(
            cfg.ffn_hidden_size,
            dtype=dtype,
            param_dtype=jnp.float32,
            kernel_init=_normal_init(cfg.initializer_range),
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=True)  # GELU(tanh), reference model.py:377,407
        rate = cfg.hidden_dropout_prob
        rng = lambda: (  # noqa: E731
            self.make_rng("dropout") if (rate > 0.0 and not deterministic) else None
        )
        x = hash_dropout(x, rate, rng(), deterministic)
        x = nn.Dense(
            cfg.hidden_size,
            dtype=dtype,
            param_dtype=jnp.float32,
            kernel_init=_normal_init(cfg.initializer_range),
            name="fc2",
        )(x)
        x = hash_dropout(x, rate, rng(), deterministic)
        return x


class MLP(nn.Module):
    """Reference box-head MLP (detr/model.py:359-392)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    initializer_range: float = 0.02
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_layers):
            out_dim = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(
                out_dim,
                dtype=jnp.dtype(self.dtype),
                param_dtype=jnp.float32,
                kernel_init=_normal_init(self.initializer_range),
                name=f"fc{i}",
            )(x)
            if i < self.num_layers - 1:
                x = nn.gelu(x, approximate=True)
        return x


def _layer_norm(cfg: DETRConfig, name: str) -> nn.LayerNorm:
    # fp32 island for stability under bf16 compute.
    return nn.LayerNorm(
        epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name
    )


class EncoderLayer(nn.Module):
    config: DETRConfig

    @nn.compact
    def __call__(
        self,
        x: Array,
        position_embedding: Array,
        key_padding_mask: Array,
        deterministic: bool = True,
    ) -> Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x_attn = _layer_norm(cfg, "norm1")(x).astype(dtype)
        qk = x_attn + position_embedding.astype(dtype)
        x = x + MultiHeadAttention(cfg, name="self_attention")(
            qk,
            qk,
            x_attn,
            key_padding_mask=key_padding_mask,
            deterministic=deterministic,
        )
        x = x + FFN(cfg, name="ffn")(
            _layer_norm(cfg, "norm2")(x).astype(dtype), deterministic=deterministic
        )
        return x


class Encoder(nn.Module):
    """Pre-LN encoder stack + final LayerNorm (reference detr/model.py:186-209)."""

    config: DETRConfig

    @nn.compact
    def __call__(
        self,
        x: Array,
        position_embedding: Array,
        key_padding_mask: Array,
        deterministic: bool = True,
    ) -> Array:
        layer_cls = (
            nn.remat(EncoderLayer, static_argnums=(4,))
            if self.config.remat
            else EncoderLayer
        )
        for i in range(self.config.num_encoder_layers):
            x = layer_cls(self.config, name=f"layer{i}")(
                x, position_embedding, key_padding_mask, deterministic
            )
        return _layer_norm(self.config, "norm")(x).astype(jnp.dtype(self.config.dtype))


class DecoderLayer(nn.Module):
    config: DETRConfig

    @nn.compact
    def __call__(
        self,
        x: Array,
        encoded_image_tokens: Array,
        object_query_embedding: Array,
        position_embedding: Array,
        key_padding_mask: Array,
        deterministic: bool = True,
    ) -> Array:
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        x_attn = _layer_norm(cfg, "norm1")(x).astype(dtype)
        qk = x_attn + object_query_embedding.astype(dtype)
        x = x + MultiHeadAttention(cfg, name="self_attention")(
            qk, qk, x_attn, deterministic=deterministic
        )

        x_attn = _layer_norm(cfg, "norm2")(x).astype(dtype)
        q = x_attn + object_query_embedding.astype(dtype)
        k = encoded_image_tokens + position_embedding.astype(dtype)
        x = x + MultiHeadAttention(cfg, name="cross_attention")(
            q,
            k,
            encoded_image_tokens,
            key_padding_mask=key_padding_mask,
            deterministic=deterministic,
        )

        x = x + FFN(cfg, name="ffn")(
            _layer_norm(cfg, "norm3")(x).astype(dtype), deterministic=deterministic
        )
        return x


class Decoder(nn.Module):
    """Pre-LN decoder from zeros; stacks every layer's shared-norm output

    for deep supervision (reference detr/model.py:117-151)."""

    config: DETRConfig

    @nn.compact
    def __call__(
        self,
        encoded_image_tokens: Array,
        position_embedding: Array,
        object_query_embedding: Array,
        key_padding_mask: Array,
        deterministic: bool = True,
    ) -> Array:
        cfg = self.config
        x = jnp.zeros_like(object_query_embedding).astype(jnp.dtype(cfg.dtype))
        norm = _layer_norm(cfg, "norm")
        layer_cls = (
            nn.remat(DecoderLayer, static_argnums=(6,)) if cfg.remat else DecoderLayer
        )
        outputs = []
        for i in range(cfg.num_decoder_layers):
            x = layer_cls(cfg, name=f"layer{i}")(
                x,
                encoded_image_tokens,
                object_query_embedding,
                position_embedding,
                key_padding_mask,
                deterministic,
            )
            outputs.append(norm(x).astype(jnp.dtype(cfg.dtype)))
        return jnp.stack(outputs, axis=1)  # (B, num_layers, Q, D)
