"""Full-checkpoint migration golden: reference ``model.safetensors`` ->
``load_reference_checkpoint`` -> identical forward.

The user-facing migration path for someone switching frameworks with a
trained model: the reference's accelerate checkpoint
(``accelerator.save_state()``, reference detr/train.py:286, weights-only
resume at train.py:224) is converted by
``detr_tpu.models.convert.convert_detr_state_dict`` /
``load_reference_checkpoint`` into flax variables.  Unlike
``test_torch_golden`` (which certifies the post-backbone graph against
fixed features) this runs the FULL model — converted frozen-BN ResNet
included — through both frameworks end to end, on ragged image sizes so
the padding-mask path is exercised too.

The torch side uses ``build_torch_frozen_resnet`` (torchvision-exact
module naming, real torch convolutions) grafted into the reference DETR
via the same ``get_model``/``IntermediateLayerGetter`` seams torchvision
would fill (reference detr/model.py:432-433), so the saved state_dict has
the genuine ``backbone.backbone.*`` key layout of a real checkpoint.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torch_reference import build_torch_frozen_resnet, load_reference  # noqa: E402

from detr_tpu.config import DETRConfig  # noqa: E402
from detr_tpu.models.convert import (  # noqa: E402
    apply_detr_weights,
    export_detr_state_dict,
    load_reference_checkpoint,
)
from detr_tpu.models.detr import DETR  # noqa: E402

# Batch of two ragged images inside a 64x96 padded canvas (multiples of 32
# so the /32 feature grid is exact; the second image leaves an L-shaped pad
# region that the corner-mode mask must reproduce).
IMG_H, IMG_W = 64, 96
HEIGHTS = [64, 48]
WIDTHS = [96, 80]


def _intermediate_layer_getter(model, return_layers):
    """torchvision ``IntermediateLayerGetter`` semantics for the oracle:
    adopts the resnet's children as its OWN children (so state_dict keys
    nest as ``backbone.backbone.conv1.weight`` exactly like a real
    checkpoint) and stops at layer4."""

    class _Getter(nn.ModuleDict):
        def __init__(self):
            super().__init__(dict(model.named_children()))

        def forward(self, x):
            out = x
            for name, mod in self.items():
                out = mod(out)
                if name == "layer4":
                    break
            return {"final_feature_map": out}

    return _Getter()


def test_full_checkpoint_roundtrip(tmp_path, monkeypatch):
    ref_model, _, _, _ = load_reference()
    oracle = build_torch_frozen_resnet("resnet50", seed=7)
    monkeypatch.setattr(ref_model, "get_model", lambda *a, **kw: oracle)
    monkeypatch.setattr(
        ref_model, "IntermediateLayerGetter", _intermediate_layer_getter
    )

    torch.manual_seed(0)
    ref = ref_model.DETR(ref_model.DETRConfig()).eval()

    # The exact artifact accelerate writes: one model.safetensors.
    path = tmp_path / "model.safetensors"
    save_file(ref.state_dict(), str(path))

    # Ragged fp32 batch, zero outside each image's valid extent (the
    # reference's collate pads with zeros, detr/data.py:199-203).
    torch.manual_seed(1)
    images_t = torch.randn(2, 3, IMG_H, IMG_W, dtype=torch.float32)
    for i, (h, w) in enumerate(zip(HEIGHTS, WIDTHS)):
        images_t[i, :, h:, :] = 0.0
        images_t[i, :, :, w:] = 0.0
    with torch.no_grad():
        ref_out = ref(
            images_t,
            torch.tensor(HEIGHTS, dtype=torch.int64),
            torch.tensor(WIDTHS, dtype=torch.int64),
        )

    cfg = DETRConfig(dtype="float32", padding_mask_mode="corner")
    model = DETR(cfg)
    images = jnp.asarray(images_t.numpy().transpose(0, 2, 3, 1))  # NCHW->NHWC
    heights = jnp.asarray(HEIGHTS, jnp.int32)
    widths = jnp.asarray(WIDTHS, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), images, heights, widths)
    params, frozen = load_reference_checkpoint(str(path), cfg)
    variables = apply_detr_weights(variables, params, frozen)

    out = model.apply(variables, images, heights, widths)

    np.testing.assert_allclose(
        np.asarray(out["pred_logits"]),
        ref_out["pred_logits"].numpy(),
        rtol=1e-3,
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_boxes"]),
        ref_out["pred_boxes"].numpy(),
        rtol=1e-3,
        atol=1e-4,
    )

    # Reverse direction: exporting the just-imported variables must give
    # back the original checkpoint bit-for-bit (every key, exact layout) —
    # certifying export_detr_state_dict as the exact inverse on a real
    # reference state_dict, so models trained here load in the reference.
    exported = export_detr_state_dict(params, frozen, cfg)
    ref_sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    assert set(exported) == set(ref_sd)
    for k, v in ref_sd.items():
        np.testing.assert_array_equal(exported[k], v, err_msg=k)

