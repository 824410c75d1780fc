"""Frozen-BatchNorm ResNet-50/101 backbone (flax.linen, NHWC).

TPU-native equivalent of the reference backbone (reference
detr/model.py:427-438): torchvision resnet50/resnet101 with
``FrozenBatchNorm2d`` and ``IntermediateLayerGetter`` extracting layer4 only
(stride 32, 2048 channels).  Re-designed rather than ported:

  * NHWC layout end-to-end (XLA:TPU's native conv layout — keeps the MXU fed
    without transposes);
  * FrozenBatchNorm parameters (gamma, beta, running mean/var) live in a
    separate non-trainable ``frozen`` variable collection and are folded into
    a single scale/bias affine at apply time (XLA fuses it into the
    neighboring conv);
  * conv kernels are trainable fp32 params computed in the configured dtype
    (bf16), exactly matching the reference's trainable-convs/frozen-BN split
    (the 10x-lower backbone LR applies to these — reference train.py:172-182);
  * optional dilated final stage (DETR-DC5: layer4 stride 1, dilation 2 — the
    torchvision ``replace_stride_with_dilation=[F, F, T]`` scheme).

Pretrained ImageNet weights are converted offline from torchvision by
``detr_tpu/models/convert.py`` into an .npz this module can ingest; random
(he_normal) init otherwise.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# (block counts per stage)
_STAGES = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics and affine parameters frozen.

    Equivalent to torchvision ``FrozenBatchNorm2d`` (used at reference
    detr/model.py:432): y = (x - mean) / sqrt(var + eps) * gamma + beta with
    no trainable parameters and no stat updates.  Parameters live in the
    ``frozen`` collection so the optimizer never sees them.
    """

    features: int
    eps: float = 1e-5
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        shape = (self.features,)
        gamma = self.variable("frozen", "scale", nn.initializers.ones, None, shape)
        beta = self.variable("frozen", "bias", nn.initializers.zeros, None, shape)
        mean = self.variable("frozen", "mean", nn.initializers.zeros, None, shape)
        var = self.variable("frozen", "var", nn.initializers.ones, None, shape)

        scale = (gamma.value * jax.lax.rsqrt(var.value + self.eps)).astype(
            jnp.dtype(self.dtype)
        )
        bias = (beta.value - mean.value * gamma.value * jax.lax.rsqrt(var.value + self.eps)).astype(
            jnp.dtype(self.dtype)
        )
        return x * scale + bias


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1, *, dtype, name: str):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        dtype=jnp.dtype(dtype),
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.he_normal(),
        name=name,
    )


class Bottleneck(nn.Module):
    """torchvision-style bottleneck: 1x1 -> 3x3 (stride/dilation) -> 1x1 (4x)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.planes * 4

        identity = x
        y = _conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = _conv(
            self.planes, 3, self.stride, self.dilation, dtype=self.dtype, name="conv2"
        )(y)
        y = FrozenBatchNorm(self.planes, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = _conv(out_ch, 1, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(out_ch, dtype=self.dtype, name="bn3")(y)

        if self.downsample:
            identity = _conv(
                out_ch, 1, self.stride, dtype=self.dtype, name="downsample_conv"
            )(x)
            identity = FrozenBatchNorm(out_ch, dtype=self.dtype, name="downsample_bn")(
                identity
            )
        return nn.relu(y + identity)


class ResNetBackbone(nn.Module):
    """ResNet-50/101 trunk returning the final stage's feature map.

    Output: (B, H/32, W/32, 2048) — or H/16 with ``dilation=True`` (DC5).
    """

    backbone: str = "resnet50"
    dilation: bool = False
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert self.backbone in _STAGES, (
            "Only resnet50 and resnet101 backbones are supported"
        )
        blocks: Sequence[int] = _STAGES[self.backbone]
        x = x.astype(jnp.dtype(self.dtype))

        x = _conv(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        for stage, (p, s, n) in enumerate(zip(planes, strides, blocks), start=1):
            dilate_stage = self.dilation and stage == 4
            stage_stride = 1 if dilate_stage else s
            # torchvision replace_stride_with_dilation: first block keeps the
            # *previous* dilation; subsequent blocks dilate.
            block_dilation = 2 if dilate_stage else 1
            for b in range(n):
                x = Bottleneck(
                    planes=p,
                    stride=stage_stride if b == 0 else 1,
                    dilation=1 if (b == 0 or not dilate_stage) else block_dilation,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage}_block{b}",
                )(x)
        return x
