"""Model-variant coverage: DETR-R101, DETR-DC5 (dilated C5), 300 queries —

the BASELINE.json config axes beyond the default R50."""

import jax
import jax.numpy as jnp
import numpy as np

from detr_tpu.config import DETRConfig
from detr_tpu.matcher.auction import assignment_total_cost, auction_lap
from detr_tpu.models import DETR


def shapes_of(config, H=64, W=96):
    model = DETR(config)
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, H, W, 3), jnp.float32),
            jnp.array([H]),
            jnp.array([W]),
        )
    )
    out = jax.eval_shape(
        lambda v: model.apply(
            v, jnp.zeros((1, H, W, 3), jnp.float32), jnp.array([H]), jnp.array([W])
        ),
        variables,
    )
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables["params"])
    )
    return out, n_params


def test_r101_param_count():
    out, n = shapes_of(DETRConfig(backbone="resnet101"))
    # R101 backbone adds ~19M conv params over R50's ~41M total
    assert 55e6 < n < 65e6, n
    assert out["pred_logits"].shape == (1, 6, 100, 81)


def test_dc5_doubles_tokens():
    cfg = DETRConfig(dilation=True)
    assert cfg.backbone_stride == 16
    out, _ = shapes_of(cfg)
    # output heads unchanged; the encoder ran at stride 16 internally
    assert out["pred_boxes"].shape == (1, 6, 100, 4)

    from detr_tpu.models.resnet import ResNetBackbone

    feats = jax.eval_shape(
        lambda v: ResNetBackbone(dilation=True, dtype="float32").apply(
            v, jnp.zeros((1, 64, 96, 3))
        ),
        jax.eval_shape(
            ResNetBackbone(dilation=True, dtype="float32").init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 96, 3)),
        ),
    )
    assert feats.shape == (1, 4, 6, 2048)  # stride 16, 4x tokens vs stride 32


def test_300_queries_forward_and_matcher(rng):
    cfg = DETRConfig(
        num_object_queries=300,
        num_encoder_layers=1,
        num_decoder_layers=1,
        hidden_size=32,
        num_attention_heads=2,
        ffn_scale_factor=2,
        num_classes=7,
        dtype="float32",
    )
    out, _ = shapes_of(cfg)
    assert out["pred_logits"].shape == (1, 1, 300, 8)

    # matcher at Q=300 (R101-300q config): XLA path correctness
    from scipy.optimize import linear_sum_assignment

    Q, G = 300, 40
    cost = rng.normal(size=(Q, G)).astype(np.float32) * 3
    valid = np.ones(G, bool)
    qog, _ = auction_lap(jnp.asarray(cost), jnp.asarray(valid))
    qog = np.asarray(qog)
    assert len(np.unique(qog)) == G
    ours = float(
        assignment_total_cost(jnp.asarray(cost), jnp.asarray(qog), jnp.asarray(valid))
    )
    rows, cols = linear_sum_assignment(cost)
    assert abs(ours - cost[rows, cols].sum()) < 2e-3 * G


def test_pallas_chunking_at_300_queries():
    """VMEM chunking picks a smaller chunk for Q=300 (17MB/problem set)."""
    from detr_tpu.matcher.pallas_auction import pallas_auction_lap
    import numpy as np

    N, Q, G = 4, 300, 20
    rng = np.random.default_rng(0)
    cost = rng.normal(size=(N, Q, G)).astype(np.float32)
    valid = np.ones((N, G), bool)
    qog, _ = pallas_auction_lap(jnp.asarray(cost), jnp.asarray(valid), interpret=True)
    qog = np.asarray(qog)
    for n in range(N):
        assert len(np.unique(qog[n])) == G
