"""Model tests: shapes, masking semantics, deep supervision, param parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detr_tpu.config import DETRConfig
from detr_tpu.models import DETR, Encoder, make_image_padding_mask
from detr_tpu.models.resnet import ResNetBackbone

TINY = DETRConfig(
    num_object_queries=10,
    num_encoder_layers=2,
    num_decoder_layers=2,
    num_attention_heads=4,
    hidden_size=32,
    ffn_scale_factor=2,
    num_classes=7,
    dtype="float32",
)


def test_padding_mask_full_vs_corner():
    heights = jnp.array([33, 64])  # ceil/32 -> 2, 2
    widths = jnp.array([32, 64])  # -> 1, 2
    full = np.asarray(make_image_padding_mask(2, 2, heights, widths, 32, "full"))
    corner = np.asarray(make_image_padding_mask(2, 2, heights, widths, 32, "corner"))
    # image 0: valid 2x1. full masks the whole right column.
    np.testing.assert_array_equal(full[0], [[False, True], [False, True]])
    # corner-bug mode: only rows>=2 AND cols>=1 -> nothing in a 2x2 grid
    # with h=2: the right strip stays unmasked (the reference bug).
    np.testing.assert_array_equal(corner[0], [[False, False], [False, False]])
    np.testing.assert_array_equal(full[1], [[False, False], [False, False]])


def test_encoder_masks_padded_keys(rng):
    """Valid-token encoder outputs must not depend on padded-token content."""
    cfg = TINY
    B, S = 2, 6
    enc = Encoder(cfg)
    pos = jnp.asarray(rng.normal(size=(B, S, cfg.hidden_size)).astype(np.float32))
    mask = jnp.asarray(np.array([[False] * 4 + [True] * 2, [False] * 6]))

    x1 = rng.normal(size=(B, S, cfg.hidden_size)).astype(np.float32)
    x2 = x1.copy()
    x2[0, 4:] += 100.0  # perturb padded tokens only

    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x1), pos, mask)
    y1 = enc.apply(params, jnp.asarray(x1), pos, mask)
    y2 = enc.apply(params, jnp.asarray(x2), pos, mask)
    np.testing.assert_allclose(
        np.asarray(y1)[0, :4], np.asarray(y2)[0, :4], atol=1e-5
    )
    # unmasked image identical throughout
    np.testing.assert_allclose(np.asarray(y1)[1], np.asarray(y2)[1], atol=1e-6)


@pytest.fixture(scope="module")
def tiny_detr():
    model = DETR(TINY)
    images = jax.random.normal(jax.random.PRNGKey(42), (2, 64, 96, 3), jnp.float32)
    heights = jnp.array([64, 33])
    widths = jnp.array([96, 64])
    variables = model.init(jax.random.PRNGKey(0), images, heights, widths)
    return model, variables, images, heights, widths


def test_detr_forward_shapes(tiny_detr):
    model, variables, images, heights, widths = tiny_detr
    out = model.apply(variables, images, heights, widths)
    L, Q, C = TINY.num_decoder_layers, TINY.num_object_queries, TINY.num_classes
    assert out["pred_logits"].shape == (2, L, Q, C + 1)
    assert out["pred_boxes"].shape == (2, L, Q, 4)
    assert out["pred_logits"].dtype == jnp.float32
    boxes = np.asarray(out["pred_boxes"])
    assert (boxes > 0).all() and (boxes < 1).all()


def test_detr_deterministic_and_dropout(tiny_detr):
    model, variables, images, heights, widths = tiny_detr
    o1 = model.apply(variables, images, heights, widths)
    o2 = model.apply(variables, images, heights, widths)
    np.testing.assert_array_equal(
        np.asarray(o1["pred_logits"]), np.asarray(o2["pred_logits"])
    )
    # train mode with different dropout rngs differs
    d1 = model.apply(
        variables,
        images,
        heights,
        widths,
        False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    d2 = model.apply(
        variables,
        images,
        heights,
        widths,
        False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(
        np.asarray(d1["pred_logits"]), np.asarray(d2["pred_logits"])
    )


def test_frozen_collection_not_in_params(tiny_detr):
    _, variables, *_ = tiny_detr
    assert "frozen" in variables
    assert "params" in variables
    flat = jax.tree_util.tree_leaves(variables["frozen"])
    assert all(not isinstance(x, dict) for x in flat)
    # No BN scale/bias inside trainable params of the backbone
    backbone_params = variables["params"]["backbone"]
    names = jax.tree_util.tree_flatten_with_path(backbone_params)[0]
    joined = [jax.tree_util.keystr(p) for p, _ in names]
    assert not any("bn" in s for s in joined)


def test_param_count_parity():
    """Reference prints ~41M trainable params (SURVEY §6, train.py:170-171)."""
    model = DETR(DETRConfig())
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.array([64]),
            jnp.array([64]),
        )
    )
    n = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables["params"])
    )
    assert 39e6 < n < 43e6, f"param count {n/1e6:.2f}M out of expected range"


def test_stem_space_to_depth_equivalence():
    """The s2d fast-path stem must reproduce the plain 7x7/s2/p3 conv
    exactly (same (7,7,3,64) param; see models/resnet.py::_StemConv)."""
    from detr_tpu.models.resnet import _StemConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    fast = _StemConv(dtype="float32", space_to_depth=True)
    ref = _StemConv(dtype="float32", space_to_depth=False)
    v = fast.init(jax.random.PRNGKey(0), x)
    a, b = fast.apply(v, x), ref.apply(v, x)
    assert a.shape == b.shape == (2, 32, 48, 64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)
    # Odd spatial size falls back to the plain conv (no wrong-shape crash).
    x_odd = jnp.asarray(rng.normal(size=(1, 63, 96, 3)).astype(np.float32))
    v_odd = fast.init(jax.random.PRNGKey(0), x_odd)
    assert fast.apply(v_odd, x_odd).shape == (1, 32, 48, 64)


def test_resnet_output_stride():
    feats = jax.eval_shape(
        lambda v, x: ResNetBackbone(dtype="float32").apply(v, x),
        jax.eval_shape(
            ResNetBackbone(dtype="float32").init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, 96, 64, 3)),
        ),
        jnp.zeros((1, 96, 64, 3)),
    )
    assert feats.shape == (1, 3, 2, 2048)


def test_resnet_dc5_stride():
    feats = jax.eval_shape(
        lambda v, x: ResNetBackbone(dilation=True, dtype="float32").apply(v, x),
        jax.eval_shape(
            ResNetBackbone(dilation=True, dtype="float32").init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)),
        ),
        jnp.zeros((1, 64, 64, 3)),
    )
    assert feats.shape == (1, 4, 4, 2048)


def test_remat_matches_plain(rng):
    """jax.checkpoint'ed layers give identical outputs and gradients."""
    import jax.numpy as jnp

    cfg_plain = TINY
    cfg_remat = TINY.replace(remat=True)
    images = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    h = jnp.array([64])
    w = jnp.array([64])

    m1, m2 = DETR(cfg_plain), DETR(cfg_remat)
    variables = m1.init(jax.random.PRNGKey(0), images, h, w)

    def loss(m, v, img):
        out = m.apply(v, img, h, w)
        return jnp.sum(out["pred_logits"] ** 2)

    l1 = jax.value_and_grad(lambda img: loss(m1, variables, img))(images)
    l2 = jax.value_and_grad(lambda img: loss(m2, variables, img))(images)
    np.testing.assert_allclose(float(l1[0]), float(l2[0]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(l1[1]), np.asarray(l2[1]), atol=1e-5
    )


def test_bn_recalibration_tracks_weight_drift():
    """TrainingConfig.bn_recalibrate_epochs rationale, as an executable
    fact: a from-scratch trunk calibrated once and then trained drifts
    away from its frozen stats — simulated here by scaling every conv
    kernel 1.6x post-calibration (compounding ~1.6^k through the blocks:
    measured 3.4e4-magnitude layer4 activations at mid-scale epoch 35).
    Recalibration on the SAME batch restores O(1) activations."""
    from detr_tpu.config import DETRConfig
    from detr_tpu.models.resnet import calibrate_frozen_bn

    cfg = DETRConfig(dtype="float32")
    bb = ResNetBackbone(dtype="float32")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = bb.init(jax.random.PRNGKey(0), x)

    wrap = {"params": {"backbone": variables["params"]},
            "frozen": {"backbone": variables["frozen"]}}
    cal = calibrate_frozen_bn(cfg, wrap, x)

    def fwd(v):
        return bb.apply(
            {"params": v["params"]["backbone"],
             "frozen": v["frozen"]["backbone"]}, x)

    base = float(jnp.abs(fwd(cal)).mean())
    assert base < 10.0  # calibrated trunk is O(1)

    drifted = dict(
        cal,
        params={"backbone": jax.tree_util.tree_map(
            lambda p: p * 1.6 if p.ndim == 4 else p,
            cal["params"]["backbone"],
        )},
    )
    stale = float(jnp.abs(fwd(drifted)).mean())
    recal = calibrate_frozen_bn(cfg, drifted, x)
    fresh = float(jnp.abs(fwd(recal)).mean())
    assert stale > 50.0 * base, (stale, base)  # the drift pathology is real
    assert fresh < 10.0, fresh  # recalibration restores the scale


def test_parity_dilated_conv_equivalence():
    """The parity-subgrid dilated conv must reproduce the plain 3x3 /
    stride-1 / dilation-2 conv exactly with the same (3,3,C,F) kernel
    (models/resnet.py::_ParityDilatedConv3x3; DC5 layer4 rewrite)."""
    import jax.lax as lax
    from detr_tpu.models.resnet import _ParityDilatedConv3x3

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 10, 14, 8)).astype(np.float32))
    mod = _ParityDilatedConv3x3(features=12, dtype="float32")
    v = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(v, x)

    k = v["params"]["kernel"]
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(
        x, k, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
        dimension_numbers=dn,
    )
    assert got.shape == ref.shape == (2, 10, 14, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)

    # gradient path equivalence (the dW lowering is the point of the rewrite)
    def loss_fast(params, x):
        return jnp.sum(mod.apply(params, x) ** 2)

    def loss_ref(kk, x):
        return jnp.sum(
            lax.conv_general_dilated(
                x, kk, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
                dimension_numbers=dn,
            ) ** 2
        )

    gf = jax.grad(loss_fast)(v, x)["params"]["kernel"]
    gr = jax.grad(loss_ref)(k, x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=2e-4, rtol=1e-4)

    # odd spatial falls back to the plain dilated conv
    x_odd = jnp.asarray(rng.normal(size=(1, 9, 14, 8)).astype(np.float32))
    v_odd = mod.init(jax.random.PRNGKey(0), x_odd)
    assert mod.apply(v_odd, x_odd).shape == (1, 9, 14, 12)
