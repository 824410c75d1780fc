"""Backbone conversion golden: flax ResNetBackbone + convert_torch_state_dict

vs an independent torch frozen-BN ResNet oracle (torchvision architecture and
state_dict naming — see tests/torch_reference.py:build_torch_frozen_resnet),
asserting fp32 feature parity end-to-end (reference detr/model.py:427-438;
SURVEY §7 hard part #3).  Randomized weights in torchvision layout catch
transposed kernels, swapped mean/var, or misplaced strides/dilations that the
structure-only tests in test_convert.py cannot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from detr_tpu.models.convert import convert_torch_state_dict  # noqa: E402
from detr_tpu.models.resnet import ResNetBackbone  # noqa: E402

from torch_reference import build_torch_frozen_resnet  # noqa: E402


@pytest.mark.parametrize(
    "backbone,dilation,hw",
    [
        ("resnet50", False, 96),
        ("resnet50", True, 96),  # DC5: layer4 stride 1, dilation 2
        ("resnet101", False, 64),
    ],
)
def test_backbone_feature_parity_fp32(backbone, dilation, hw):
    oracle = build_torch_frozen_resnet(backbone, dilation=dilation, seed=3)
    sd = {k: v.detach().cpu().numpy() for k, v in oracle.state_dict().items()}
    params, frozen = convert_torch_state_dict(sd, backbone)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, size=(2, hw, hw, 3)).astype(np.float32)

    model = ResNetBackbone(backbone=backbone, dilation=dilation, dtype="float32")
    feats = model.apply(
        {"params": params, "frozen": frozen}, jnp.asarray(x)
    )

    with torch.no_grad():
        ref = oracle(torch.as_tensor(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    stride = 16 if dilation else 32
    assert feats.shape == (2, hw // stride, hw // stride, 2048)
    np.testing.assert_allclose(np.asarray(feats), ref, rtol=1e-4, atol=1e-4)
