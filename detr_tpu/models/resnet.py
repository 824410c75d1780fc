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

    ``calibrate=True`` (one-shot, via ``apply(..., mutable=["frozen"])``)
    overwrites mean/var with the current batch's activation statistics
    before normalizing.  Frozen BN only makes sense with matching stats:
    with the identity defaults and a RANDOM backbone, activations explode
    through the trunk (measured layer4 L2 ~1e4) and training from scratch
    stalls — the reference never hits this because it always loads
    ImageNet weights (whose stats ship with them).  See
    ``detr_tpu.models.calibrate_frozen_bn``.
    """

    features: int
    eps: float = 1e-5
    dtype: str = "bfloat16"
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        shape = (self.features,)
        gamma = self.variable("frozen", "scale", nn.initializers.ones, None, shape)
        beta = self.variable("frozen", "bias", nn.initializers.zeros, None, shape)
        mean = self.variable("frozen", "mean", nn.initializers.zeros, None, shape)
        var = self.variable("frozen", "var", nn.initializers.ones, None, shape)

        if self.calibrate and not self.is_initializing():
            x32 = x.astype(jnp.float32)
            mean.value = jnp.mean(x32, axis=(0, 1, 2))
            var.value = jnp.var(x32, axis=(0, 1, 2))

        scale = (gamma.value * jax.lax.rsqrt(var.value + self.eps)).astype(
            jnp.dtype(self.dtype)
        )
        bias = (beta.value - mean.value * gamma.value * jax.lax.rsqrt(var.value + self.eps)).astype(
            jnp.dtype(self.dtype)
        )
        return x * scale + bias


class _StemConv(nn.Module):
    """conv1 (7x7 stride-2 pad-3, C_in=3) with a space-to-depth fast path.

    The MLPerf-ResNet transform (zero-pad the kernel to 8x8, space-to-depth
    the input by 2x2, run an equivalent 4x4 stride-1 VALID conv over 12
    channels) computes the identical linear map — verified to fp32 tolerance
    in tests/test_model.py.

    **Measured OFF by default on v5e**: profiling flagged conv1's
    forward + weight-gradient at ~5.3 ms of a 47.8 ms train step, but the
    A/B came out 155.1 vs 164.3 img/s — XLA:TPU already lowers the C_in=3
    stem through a specialized packed emitter
    (EmitAllInputFeaturePackedInSublanesOutputBatchInSublanes), and the
    (403, 403, 12) s2d layout wastes lanes instead.  The path is kept,
    tested, and config-switchable for other TPU generations/XLA versions.

    The parameter KEEPS the reference (7, 7, 3, 64) HWIO layout — checkpoint
    trees, torchvision weight conversion (models/convert.py), and backbone
    goldens are unaffected; the reshape to (4, 4, 12, 64) happens at apply
    time and XLA constant-folds it per step.
    """

    dtype: str = "bfloat16"
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (7, 7, 3, 64), jnp.float32
        )
        kernel = kernel.astype(jnp.dtype(self.dtype))
        B, H, W, C = x.shape
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        if not (self.space_to_depth and H % 2 == 0 and W % 2 == 0 and C == 3):
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn
            )
        # Output pixel o of the 7x7/s2/p3 conv reads padded-input rows
        # 2o..2o+6; with the kernel zero-padded to 8x8 that window is exactly
        # 4 consecutive 2-pixel blocks of the (3,3)-padded input, stride one
        # block.  So: pad -> s2d(2) -> 4x4 VALID conv, outputs identical.
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        Hp, Wp = H + 6, W + 6
        xs = (
            xp.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, Hp // 2, Wp // 2, 4 * C)
        )
        k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (8,8,3,64)
        ks = (
            k8.reshape(4, 2, 4, 2, 3, 64)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 12, 64)
        )
        dn = jax.lax.conv_dimension_numbers(
            xs.shape, ks.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            xs, ks, (1, 1), "VALID", dimension_numbers=dn
        )


class _ParityDilatedConv3x3(nn.Module):
    """3x3 / stride-1 / dilation-2 conv as 4 dense convs on parity subgrids.

    Exact identity on even (H, W): output row 2m+i of the dilated conv
    reads padded-input rows 2(m-1)+i, 2m+i, 2(m+1)+i — all of row-parity
    i — so each of the 4 (row, col)-parity subgrids is an independent
    DENSE 3x3 / pad-1 conv with the SAME kernel.  The parities stack on
    the batch axis (4B, H/2, W/2, C), one standard conv runs, and the
    outputs interleave back.  Motivation (DC5, round-5 profile): XLA's
    TPU emitter lowers base-dilated 3x3 gradients far below dense-conv
    efficiency at layer4's 50x84 x 512ch shapes; the dense rewrite runs
    on the MXU's well-tuned conv path in both directions.  Parameter
    name/shape ("kernel", (3, 3, C, F)) matches nn.Conv(use_bias=False),
    so checkpoints, weight conversion, and goldens are unchanged.
    Odd H or W falls back to the plain dilated conv.
    """

    features: int
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (3, 3, C, self.features),
            jnp.float32,
        )
        k = kernel.astype(jnp.dtype(self.dtype))
        B, H, W, _ = x.shape
        dn = jax.lax.conv_dimension_numbers(
            (B, H, W, C), k.shape, ("NHWC", "HWIO", "NHWC")
        )
        if H % 2 or W % 2:
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
                dimension_numbers=dn,
            )
        Hh, Wh = H // 2, W // 2
        xs = (
            x.reshape(B, Hh, 2, Wh, 2, C)
            .transpose(2, 4, 0, 1, 3, 5)
            .reshape(4 * B, Hh, Wh, C)
        )
        dn = jax.lax.conv_dimension_numbers(
            xs.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            xs, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
        )
        F = self.features
        return (
            y.reshape(2, 2, B, Hh, Wh, F)
            .transpose(2, 3, 0, 4, 1, 5)
            .reshape(B, H, W, F)
        )


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
    calibrate: bool = False
    # Parity-subgrid rewrite of the dilated conv2 (see _ParityDilatedConv3x3).
    # A/B'd OFF on v5e: 21.65 vs 21.61 img/s on the DC5 train step —
    # XLA's base-dilated lowering is already at dense-conv parity there;
    # kept switchable for targets where it is not.
    parity_dilated: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.planes * 4

        identity = x
        y = _conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.planes, dtype=self.dtype, calibrate=self.calibrate, name="bn1")(y)
        y = nn.relu(y)
        if self.dilation == 2 and self.stride == 1 and self.parity_dilated:
            y = _ParityDilatedConv3x3(
                self.planes, dtype=self.dtype, name="conv2"
            )(y)
        else:
            y = _conv(
                self.planes, 3, self.stride, self.dilation, dtype=self.dtype,
                name="conv2",
            )(y)
        y = FrozenBatchNorm(self.planes, dtype=self.dtype, calibrate=self.calibrate, name="bn2")(y)
        y = nn.relu(y)
        y = _conv(out_ch, 1, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(out_ch, dtype=self.dtype, calibrate=self.calibrate, name="bn3")(y)

        if self.downsample:
            identity = _conv(
                out_ch, 1, self.stride, dtype=self.dtype, name="downsample_conv"
            )(x)
            identity = FrozenBatchNorm(out_ch, dtype=self.dtype, calibrate=self.calibrate, name="downsample_bn")(
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
    # See _StemConv: exact s2d stem transform, measured slower on v5e
    # (XLA's packed stem emitter wins); switchable for other targets.
    stem_space_to_depth: bool = False
    # One-shot frozen-BN stat calibration (see FrozenBatchNorm.calibrate).
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert self.backbone in _STAGES, (
            "Only resnet50 and resnet101 backbones are supported"
        )
        blocks: Sequence[int] = _STAGES[self.backbone]
        x = x.astype(jnp.dtype(self.dtype))

        x = _StemConv(
            dtype=self.dtype, space_to_depth=self.stem_space_to_depth, name="conv1"
        )(x)
        x = FrozenBatchNorm(64, dtype=self.dtype, calibrate=self.calibrate, name="bn1")(x)
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
                    calibrate=self.calibrate,
                    name=f"layer{stage}_block{b}",
                )(x)
        return x


def calibrate_frozen_bn(
    config, variables: dict, images: Array
) -> dict:
    """One-shot frozen-BN stat calibration for from-scratch training.

    Runs the backbone once with every FrozenBatchNorm overwriting its
    mean/var with the batch's activation statistics (sequentially — each
    layer sees its upstream already calibrated) and returns a new
    ``variables`` dict with the updated ``frozen`` collection.  Use when
    ``DETRConfig.backbone_weights`` is None: the identity default stats make
    a random trunk's activations explode (~1e4 L2 at layer4) and from-scratch
    training stalls in DETR's query-collapse phase.

    Args:
      config: DETRConfig (backbone name / dilation / dtype are read).
      variables: the DETR model's {"params", "frozen", ...} tree.
      images: (B, H, W, 3) sample batch (normalized, zero-padded).
    """
    bb = ResNetBackbone(
        backbone=config.backbone,
        dilation=config.dilation,
        dtype=config.dtype,
        calibrate=True,
    )
    _, mutated = bb.apply(
        {
            "params": variables["params"]["backbone"],
            "frozen": variables["frozen"]["backbone"],
        },
        images,
        mutable=["frozen"],
    )
    new_frozen = dict(variables["frozen"])
    new_frozen["backbone"] = mutated["frozen"]
    out = dict(variables)
    out["frozen"] = new_frozen
    return out
