"""Weight-conversion tests: a synthetic state_dict with torchvision's exact

naming/shapes maps onto the flax ResNet variable structure bit-for-bit
(SURVEY §7 hard part #3 — the fp32 layer4 golden check vs real torchvision
runs offline where torchvision exists; structure + numerics-of-mapping are
covered here)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detr_tpu.models.convert import (
    apply_backbone_weights,
    convert_torch_state_dict,
    load_backbone_npz,
    save_backbone_npz,
)
from detr_tpu.models.resnet import ResNetBackbone

_STAGES = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


def fake_torchvision_state_dict(backbone="resnet50", rng=None):
    """Build a state_dict with torchvision's names and shapes."""
    rng = rng or np.random.default_rng(0)
    sd = {}

    def conv(name, o, i, k):
        # he-ish scale so the 50-layer forward stays finite in fp32
        std = (2.0 / (i * k * k)) ** 0.5
        sd[f"{name}.weight"] = (rng.normal(size=(o, i, k, k)) * std).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 2, size=(c,)).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    inplanes = 64
    for stage, n in enumerate(_STAGES[backbone], start=1):
        planes = 64 * 2 ** (stage - 1)
        for b in range(n):
            p = f"layer{stage}.{b}"
            conv(f"{p}.conv1", planes, inplanes, 1)
            bn(f"{p}.bn1", planes)
            conv(f"{p}.conv2", planes, planes, 3)
            bn(f"{p}.bn2", planes)
            conv(f"{p}.conv3", planes * 4, planes, 1)
            bn(f"{p}.bn3", planes * 4)
            if b == 0:
                conv(f"{p}.downsample.0", planes * 4, inplanes, 1)
                bn(f"{p}.downsample.1", planes * 4)
            inplanes = planes * 4
    return sd


@pytest.mark.parametrize("backbone", ["resnet50"])
def test_conversion_structure_matches_model(backbone):
    sd = fake_torchvision_state_dict(backbone)
    params, frozen = convert_torch_state_dict(sd, backbone)

    model = ResNetBackbone(backbone=backbone, dtype="float32")
    variables = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )

    ref_p = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
    got_p = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert ref_p == got_p
    ref_f = jax.tree_util.tree_map(lambda x: x.shape, variables["frozen"])
    got_f = jax.tree_util.tree_map(lambda x: x.shape, frozen)
    assert ref_f == got_f

    # kernel transpose is OIHW -> HWIO
    np.testing.assert_allclose(
        params["conv1"]["kernel"],
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
    )


def test_npz_roundtrip(tmp_path):
    sd = fake_torchvision_state_dict()
    path = str(tmp_path / "weights.npz")
    save_backbone_npz(path, sd, "resnet50")
    params, frozen = load_backbone_npz(path)
    direct_p, direct_f = convert_torch_state_dict(sd, "resnet50")
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(direct_p)
    ):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(
        jax.tree_util.tree_leaves(frozen), jax.tree_util.tree_leaves(direct_f)
    ):
        np.testing.assert_array_equal(a, b)


def test_apply_backbone_weights_and_forward():
    sd = fake_torchvision_state_dict()
    params, frozen = convert_torch_state_dict(sd, "resnet50")

    model = ResNetBackbone(backbone="resnet50", dtype="float32")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    new_vars = apply_backbone_weights(
        {"params": {"backbone": variables["params"]},
         "frozen": {"backbone": variables["frozen"]}},
        params,
        frozen,
    )
    out = model.apply(
        {
            "params": new_vars["params"]["backbone"],
            "frozen": new_vars["frozen"]["backbone"],
        },
        jnp.ones((1, 64, 64, 3)) * 0.1,
    )
    assert out.shape == (1, 2, 2, 2048)
    assert np.isfinite(np.asarray(out)).all()


def test_apply_weights_rejects_same_size_wrong_shape():
    """A same-element-count wrong-shape leaf (the signature of a transposed
    kernel from a mapping bug) must raise, not silently reshape into a
    model that predicts garbage."""
    sd = fake_torchvision_state_dict()
    params, frozen = convert_torch_state_dict(sd, "resnet50")

    model = ResNetBackbone(backbone="resnet50", dtype="float32")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    def transpose_first_4d(tree):
        done = False

        def f(x):
            nonlocal done
            x = np.asarray(x)
            if not done and x.ndim == 4 and x.shape[-2] != x.shape[-1]:
                done = True
                return np.swapaxes(x, -2, -1)
            return x

        out = jax.tree_util.tree_map(f, tree)
        assert done, "fixture needs one non-square 4D kernel"
        return out

    with pytest.raises(ValueError, match="leaf shape"):
        apply_backbone_weights(
            {"params": {"backbone": variables["params"]},
             "frozen": {"backbone": variables["frozen"]}},
            transpose_first_4d(params),
            frozen,
        )
