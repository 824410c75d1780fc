from detr_tpu.models.detr import DETR, make_image_padding_mask
from detr_tpu.models.resnet import ResNetBackbone, calibrate_frozen_bn
from detr_tpu.models.transformer import (
    FFN,
    MLP,
    Decoder,
    Encoder,
    MultiHeadAttention,
)

__all__ = [
    "DETR",
    "make_image_padding_mask",
    "ResNetBackbone",
    "calibrate_frozen_bn",
    "Encoder",
    "Decoder",
    "FFN",
    "MLP",
    "MultiHeadAttention",
]
