"""Pallas kernels in interpreter mode (CPU): parity with the XLA reference

implementations — the correctness-diffing fallback SURVEY §7 hard part #5
calls for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from detr_tpu.matcher.pallas_auction import pallas_auction_lap
from detr_tpu.ops.attention import scaled_dot_product_attention
from detr_tpu.ops.pallas_attention import _flash_forward


@pytest.mark.parametrize("kind", ["random", "contentious"])
def test_pallas_auction_matches_scipy(rng, kind):
    N, Q, G = 4, 32, 16
    if kind == "random":
        cost = rng.normal(size=(N, Q, G)).astype(np.float32) * 3
    else:  # near-identical rows: the early-training worst case
        cost = (
            rng.normal(size=(N, 1, G)) * 3 + rng.normal(size=(N, Q, G)) * 0.01
        ).astype(np.float32)
    valid = np.ones((N, G), bool)
    valid[1, 5:] = False
    valid[2, :] = False

    qog, iters = pallas_auction_lap(
        jnp.asarray(cost), jnp.asarray(valid), interpret=True
    )
    qog = np.asarray(qog)
    for n in range(N):
        nv = valid[n].sum()
        if nv == 0:
            assert (qog[n] == -1).all()
            continue
        assert len(np.unique(qog[n, :nv])) == nv
        rows, cols = linear_sum_assignment(cost[n][:, :nv])
        err = abs(
            cost[n][qog[n, :nv], np.arange(nv)].sum() - cost[n][rows, cols].sum()
        )
        assert err < 2e-3 * nv, (kind, n, err)


def test_pallas_attention_matches_xla(rng):
    B, L, S, H, D = 2, 48, 40, 4, 32
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    mask = np.zeros((B, S), bool)
    mask[0, 30:] = True

    ours = _flash_forward(q, k, v, jnp.asarray(mask), block_q=16)
    ref = scaled_dot_product_attention(
        q, k, v, key_padding_mask=jnp.asarray(mask), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_pallas_attention_no_mask_and_ragged_L(rng):
    # L not divisible by block_q exercises the pad-and-slice path
    B, L, S, H, D = 1, 37, 40, 2, 32
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    ours = _flash_forward(q, kv, kv, None, block_q=16)
    ref = scaled_dot_product_attention(q, kv, kv, deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)
