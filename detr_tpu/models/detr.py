"""DETR top module (flax.linen, NHWC, fixed-shape).

Equivalent of the reference ``DETR`` (detr/model.py:31-114): frozen-BN ResNet
backbone -> 1x1 conv projection 2048->256 -> per-image sine positional
embedding + padding mask -> flatten HW -> 6-layer pre-LN encoder -> 6-layer
decoder over 100 learned object queries -> shared class head (Linear->C+1)
and box head (3-layer MLP -> 4, sigmoid) applied to every stacked decoder
layer output for deep supervision.

Init parity (reference detr/model.py:54-66): xavier_uniform for input_proj
and class head (zero biases), normal(initializer_range) for the object-query
embedding, normal(initializer_range) for the box MLP; the transformer stacks
self-initialize with normal(initializer_range)/zeros per their own rule.

Output: {"pred_logits": (B, num_decoder_layers, Q, C+1) fp32,
         "pred_boxes": (B, num_decoder_layers, Q, 4) fp32 normalized cxcywh}.

TPU-native divergences (documented, SURVEY §7.3):
  * NHWC images (B, H, W, 3) instead of NCHW;
  * the padding-mask builder vectorizes the reference's per-image Python loop
    and by default masks the full L-shaped pad region, fixing the reference's
    corner-only bug (detr/model.py:113) — set
    ``config.padding_mask_mode="corner"`` to reproduce the bug bit-for-bit
    for golden parity tests;
  * heads emit fp32 regardless of compute dtype (loss/matcher islands).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from detr_tpu.config import DETRConfig
from detr_tpu.models.resnet import ResNetBackbone
from detr_tpu.models.transformer import MLP, Decoder, Encoder
from detr_tpu.ops.position_encoding import (
    batch_positional_encoding,
    scaled_valid_extent,
)

Array = jax.Array


def make_image_padding_mask(
    feat_height: int,
    feat_width: int,
    image_heights: Array,
    image_widths: Array,
    stride: int = 32,
    mode: str = "full",
) -> Array:
    """(B, feat_height, feat_width) bool mask, True on padded cells.

    Vectorized equivalent of reference detr/model.py:96-114.  ``mode="full"``
    masks the whole L-shaped pad region (rows >= ceil(h/s) OR cols >=
    ceil(w/s)) — the official-DETR behavior; ``mode="corner"`` reproduces the
    reference's ``mask[i, h:, w:] = True`` bug (rows >= h AND cols >= w).
    """
    sh = scaled_valid_extent(image_heights, stride)  # (B,)
    sw = scaled_valid_extent(image_widths, stride)
    rows = jnp.arange(feat_height)[None, :, None] >= sh[:, None, None]
    cols = jnp.arange(feat_width)[None, None, :] >= sw[:, None, None]
    if mode == "full":
        return rows | cols
    elif mode == "corner":
        return rows & cols
    raise ValueError(f"unknown padding_mask_mode: {mode!r}")


class DETR(nn.Module):
    config: DETRConfig

    def setup(self):
        cfg = self.config
        self.backbone = ResNetBackbone(
            backbone=cfg.backbone,
            dilation=cfg.dilation,
            dtype=cfg.dtype,
        )
        # 1x1 conv projection == Dense over the channel axis.
        self.input_proj = nn.Dense(
            cfg.hidden_size,
            dtype=jnp.dtype(cfg.dtype),
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
        )
        self.object_query_embedding = self.param(
            "object_query_embedding",
            nn.initializers.normal(stddev=cfg.initializer_range),
            (cfg.num_object_queries, cfg.hidden_size),
            jnp.float32,
        )
        self.encoder = Encoder(cfg)
        self.decoder = Decoder(cfg)
        self.class_embedding = nn.Dense(
            cfg.num_classes + 1,
            dtype=jnp.float32,  # head in fp32: feeds CE loss + matcher
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
        )
        self.bbox_embedding = MLP(
            hidden_dim=cfg.hidden_size,
            output_dim=4,
            num_layers=cfg.box_embedding_mlp_num_layers,
            initializer_range=cfg.initializer_range,
            dtype="float32",
        )

    def __call__(
        self,
        images: Array,
        heights: Array,
        widths: Array,
        deterministic: bool = True,
    ) -> dict[str, Array]:
        """Args:
          images: (B, H, W, 3) normalized, zero-padded to the bucket shape.
          heights / widths: (B,) int32 valid pixel extents per image.
          deterministic: disables dropout (eval).
        """
        feats = self.backbone(images)
        return self.from_features(feats, heights, widths, deterministic)

    def from_features(
        self,
        feats: Array,
        heights: Array,
        widths: Array,
        deterministic: bool = True,
    ) -> dict[str, Array]:
        """Post-backbone pipeline (reference detr/model.py:70-94): projection,

        positional embedding, padding mask, encoder, decoder, heads.  Exposed
        so the torch-reference golden tests can drive it with a shared feature
        map (``model.apply(vars, feats, h, w, method="from_features")``)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        stride = cfg.backbone_stride
        B, fh, fw, _ = feats.shape

        x = self.input_proj(feats)

        # fp32 positional embedding island (SURVEY §7 hard part #4).
        pos = batch_positional_encoding(
            fh,
            fw,
            scaled_valid_extent(heights, stride),
            scaled_valid_extent(widths, stride),
            num_pos_feats=cfg.hidden_size // 2,
            temperature=cfg.temperature,
        )
        mask = make_image_padding_mask(
            fh, fw, heights, widths, stride, cfg.padding_mask_mode
        )

        tokens = x.reshape(B, fh * fw, cfg.hidden_size)
        pos = pos.reshape(B, fh * fw, cfg.hidden_size).astype(dtype)
        key_padding_mask = mask.reshape(B, fh * fw)

        query_embed = jnp.broadcast_to(
            self.object_query_embedding[None],
            (B, cfg.num_object_queries, cfg.hidden_size),
        ).astype(dtype)

        encoded = self.encoder(tokens, pos, key_padding_mask, deterministic)
        decoded = self.decoder(
            encoded, pos, query_embed, key_padding_mask, deterministic
        )  # (B, num_layers, Q, D)

        logits = self.class_embedding(decoded.astype(jnp.float32))
        boxes = jax.nn.sigmoid(self.bbox_embedding(decoded.astype(jnp.float32)))

        return {"pred_logits": logits, "pred_boxes": boxes}
