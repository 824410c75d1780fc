"""Pallas kernels in interpreter mode (CPU): parity with the XLA reference

implementations and an fp64 host oracle — the correctness-diffing fallback
SURVEY §7 hard part #5 calls for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from detr_tpu.matcher.pallas_auction import pallas_auction_lap
from detr_tpu.ops.attention import scaled_dot_product_attention
from detr_tpu.ops.pallas_attention import pallas_masked_attention


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


def test_pallas_auction_flagship_shape(rng):
    """DETR's real (Q=100, G_max=25) rectangular shape, ragged validity."""
    N, Q, G = 4, 100, 25
    cost = rng.normal(size=(N, Q, G)).astype(np.float32) * 3
    valid = rng.random((N, G)) < 0.7
    qog, _ = pallas_auction_lap(jnp.asarray(cost), jnp.asarray(valid), interpret=True)
    qog = np.asarray(qog)
    for n in range(N):
        vc = np.flatnonzero(valid[n])
        if len(vc) == 0:
            assert (qog[n] == -1).all()
            continue
        assert len(np.unique(qog[n, vc])) == len(vc)
        rows, cols = linear_sum_assignment(cost[n][:, vc])
        err = cost[n][qog[n, vc], vc].sum() - cost[n][rows, vc[cols]].sum()
        assert err < 2e-3 * len(vc), (n, err)


def test_pallas_auction_chunked_grid(rng):
    """N that doesn't fit one VMEM chunk at G_max=Q exercises the multi-cell
    grid with batch padding (regression: chunk=15 broke Mosaic's sublane
    divisibility when N had no /8 divisor under the VMEM budget)."""
    N, Q, G = 30, 100, 100  # trainer-smoke shapes: batch 5 x 6 layers
    cost = rng.normal(size=(N, Q, G)).astype(np.float32) * 3
    nval = rng.integers(0, 12, size=N)
    valid = np.arange(G)[None, :] < nval[:, None]
    qog, _ = pallas_auction_lap(jnp.asarray(cost), jnp.asarray(valid), interpret=True)
    qog = np.asarray(qog)
    for n in range(N):
        vc = np.flatnonzero(valid[n])
        if len(vc) == 0:
            assert (qog[n] == -1).all()
            continue
        assert len(np.unique(qog[n, vc])) == len(vc)
        rows, cols = linear_sum_assignment(cost[n][:, vc])
        err = cost[n][qog[n, vc], vc].sum() - cost[n][rows, vc[cols]].sum()
        assert err < 2e-3 * max(1, len(vc)), (n, err)


def test_pallas_attention_matches_xla(rng):
    B, L, S, H, D = 2, 48, 40, 4, 32
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    mask = np.zeros((B, S), bool)
    mask[0, 30:] = True

    ours = pallas_masked_attention(q, k, v, jnp.asarray(mask), None, 0.0, 16)
    ref = scaled_dot_product_attention(
        q, k, v, key_padding_mask=jnp.asarray(mask), deterministic=True
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_pallas_attention_no_mask_and_ragged_L(rng):
    # L not divisible by block_q exercises the pad-and-slice path
    B, L, S, H, D = 1, 37, 40, 2, 32
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    ours = pallas_masked_attention(q, kv, kv, None, None, 0.0, 16)
    ref = scaled_dot_product_attention(q, kv, kv, deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_pallas_attention_backward_matches_xla(rng):
    """Fused backward kernel vs the XLA reference VJP (deterministic)."""
    B, L, S, H, D = 2, 32, 40, 2, 32
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    mask = np.zeros((B, S), bool)
    mask[1, 25:] = True
    mask = jnp.asarray(mask)

    _, vjp_p = jax.vjp(
        lambda q, k, v: pallas_masked_attention(q, k, v, mask, None, 0.0, 16), q, k, v
    )
    _, vjp_r = jax.vjp(
        lambda q, k, v: scaled_dot_product_attention(
            q, k, v, key_padding_mask=mask, deterministic=True
        ),
        q,
        k,
        v,
    )
    for ours, ref in zip(vjp_p(g), vjp_r(g)):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=5e-5)


def _host_keep(shape, rate, seed, bh, qi, block):
    """numpy reimplementation of the kernel's counter-based dropout hash."""
    row = (np.arange(shape[0], dtype=np.uint64)[:, None] + qi * block) * np.uint64(
        0x27D4EB2F
    )
    col = np.arange(shape[1], dtype=np.uint64)[None, :] * np.uint64(0x165667B1)
    h = (
        np.uint64(seed) * np.uint64(0x9E3779B9)
        + np.uint64(bh) * np.uint64(0x85EBCA6B)
        + row
    ) & np.uint64(0xFFFFFFFF)
    h = (h ^ (col & np.uint64(0xFFFFFFFF))) & np.uint64(0xFFFFFFFF)
    for sh, mul in [(16, 0x7FEB352D), (15, 0x846CA68B), (16, None)]:
        h = (h ^ (h >> np.uint64(sh))) & np.uint64(0xFFFFFFFF)
        if mul:
            h = (h * np.uint64(mul)) & np.uint64(0xFFFFFFFF)
    return h >= (int(rate * 4294967296.0) & 0xFFFFFFFF)


def test_pallas_attention_dropout_fp64_oracle(rng):
    """Dropout fwd AND fused bwd vs an exact fp64 host reference.

    The keep-mask is a pure function of (seed, head, row, col), so the host
    can reproduce it exactly; forward/backward must both agree with the
    oracle (which also proves fwd and bwd regenerate the same mask).
    """
    B, L, S, H, D = 2, 16, 40, 2, 32
    BQ, rate, seed_val = 16, 0.1, 1234
    qn = rng.normal(size=(B, L, H, D)).astype(np.float32)
    kn = rng.normal(size=(B, S, H, D)).astype(np.float32)
    vn = rng.normal(size=(B, S, H, D)).astype(np.float32)
    gn = rng.normal(size=(B, L, H, D)).astype(np.float32)
    maskn = np.zeros((B, S), bool)
    maskn[0, 30:] = True

    scale = 1 / np.sqrt(D)
    out_h = np.zeros_like(qn, np.float64)
    dq_h = np.zeros_like(qn, np.float64)
    dk_h = np.zeros_like(kn, np.float64)
    dv_h = np.zeros_like(vn, np.float64)
    for b in range(B):
        for h_ in range(H):
            bh = b * H + h_
            qq = qn[b, :, h_, :].astype(np.float64)
            kk = kn[b, :, h_, :].astype(np.float64)
            vv = vn[b, :, h_, :].astype(np.float64)
            gg = gn[b, :, h_, :].astype(np.float64)
            s = qq @ kk.T * scale
            s[:, maskn[b]] = np.finfo(np.float32).min
            e = np.exp(s - s.max(1, keepdims=True))
            p = e / e.sum(1, keepdims=True)
            keep = _host_keep((L, S), rate, seed_val, bh, 0, BQ)
            pd = np.where(keep, p / (1 - rate), 0.0)
            out_h[b, :, h_, :] = pd @ vv
            dv_h[b, :, h_, :] = pd.T @ gg
            dpd = np.where(keep, (gg @ vv.T) / (1 - rate), 0.0)
            ds = p * (dpd - (p * dpd).sum(1, keepdims=True))
            dq_h[b, :, h_, :] = ds @ kk * scale
            dk_h[b, :, h_, :] = ds.T @ qq * scale

    q, k, v = map(jnp.asarray, (qn, kn, vn))
    mask = jnp.asarray(maskn)
    seed = jnp.array([seed_val], jnp.int32)
    out, vjp = jax.vjp(
        lambda q, k, v: pallas_masked_attention(q, k, v, mask, seed, rate, BQ), q, k, v
    )
    dq, dk, dv = vjp(jnp.asarray(gn))
    np.testing.assert_allclose(np.asarray(out), out_h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dq), dq_h, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), dk_h, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), dv_h, atol=1e-4)


def test_pallas_attention_dropout_determinism(rng):
    B, L, S, H, D = 1, 16, 24, 2, 32
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    s1, s2 = jnp.array([7], jnp.int32), jnp.array([8], jnp.int32)
    o1 = pallas_masked_attention(q, kv, kv, None, s1, 0.3, 16)
    o2 = pallas_masked_attention(q, kv, kv, None, s1, 0.3, 16)
    o3 = pallas_masked_attention(q, kv, kv, None, s2, 0.3, 16)
    assert bool(jnp.all(o1 == o2))
    assert bool(jnp.any(o1 != o3))


def test_blocked_backward_matches_single_kernel(rng):
    """The S-blocked two-kernel flash backward (DC5 path) must reproduce the
    single-kernel backward's gradients — dropout ON so the absolute-coord
    mask regeneration across (qj, si) tiles is exercised too."""
    import detr_tpu.ops.pallas_attention as pa

    B, L, S, H, D = 2, 40, 72, 2, 32
    BQ, BS = 16, 24
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, S)) < 0.2)
    seed = jnp.array([11], jnp.int32)
    rate = 0.3

    out, lse = pa._flash_forward(q, k, v, mask, seed, rate, BQ)
    dq1, dk1, dv1 = pa._flash_backward(q, k, v, mask, seed, g, rate, BQ)
    dq2, dk2, dv2 = pa._flash_backward_blocked(
        q, k, v, mask, seed, g, out, lse, rate, BQ, block_s=BS
    )
    np.testing.assert_allclose(np.asarray(dq1), np.asarray(dq2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk1), np.asarray(dk2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv1), np.asarray(dv2), atol=2e-4)


def test_blocked_backward_dispatch(rng, monkeypatch):
    """Above the S threshold jax.grad routes through the blocked kernels and
    still matches the XLA reference gradient (deterministic path)."""
    import detr_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(pa, "_BWD_SINGLE_MAX_S", 32)
    monkeypatch.setattr(pa, "_DEF_BS", 24)
    # Record that jax.grad genuinely routes through the blocked backward —
    # without this the test silently passes via the single-kernel path if
    # the dispatch in pa._bwd regresses (round-3 verdict #6 / round-2
    # advisor #3: the module globals must be read at _bwd call time).
    calls: list[int] = []
    orig_blocked = pa._flash_backward_blocked

    def counting_blocked(*args, **kwargs):
        calls.append(kwargs.get("block_s", -1))
        return orig_blocked(*args, **kwargs)

    monkeypatch.setattr(pa, "_flash_backward_blocked", counting_blocked)
    B, L, S, H, D = 1, 24, 48, 2, 32
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, S)) < 0.2)

    def f_pallas(q, k, v):
        return jnp.sum(pallas_masked_attention(q, k, v, mask, None, 0.0, 8) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(
            scaled_dot_product_attention(q, k, v, key_padding_mask=mask) ** 2
        )

    gp = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    # the blocked route ran, with the patched (call-time) block_s
    assert calls == [24]


def test_pallas_attention_dropout_block_size_invariance(rng):
    """The hash mask is a function of ABSOLUTE (row, col), so the fwd output
    must not depend on block_q — the property that lets the backward pick a
    smaller VMEM-fitting block than the forward (DC5 S=4.2k regression)."""
    B, L, S, H, D = 1, 32, 24, 2, 32
    q = jnp.asarray(rng.normal(size=(B, L, H, D)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(B, S, H, D)).astype(np.float32))
    s = jnp.array([9], jnp.int32)
    o16 = pallas_masked_attention(q, kv, kv, None, s, 0.3, 16)
    o8 = pallas_masked_attention(q, kv, kv, None, s, 0.3, 8)
    np.testing.assert_allclose(np.asarray(o16), np.asarray(o8), atol=1e-6)


def test_bwd_block_q_sizing():
    """R50 token counts keep BQ=128; DC5 shrinks to fit the 16MB scoped
    VMEM (measured 18.37MB OOM at BQ=128, S=4200)."""
    from detr_tpu.ops.pallas_attention import _bwd_block_q

    assert _bwd_block_q(128, 625, 32) == 128   # R50 encoder
    assert _bwd_block_q(128, 1050, 32) == 128  # R50 @ 800x1333
    bq_dc5 = _bwd_block_q(128, 4200, 32)
    assert bq_dc5 < 128 and bq_dc5 % 8 == 0
    # calibrated stack model stays under the 16MB scoped limit
    assert bq_dc5 * 4200 * 4 * 8 + 4200 * 32 * 12 < 16 * 1024 * 1024


def test_dropout_keep_rate():
    """The hash mask's keep rate is ~(1 - p) over a large tile."""
    rate = 0.25
    keep = _host_keep((512, 512), rate, 42, 3, 1, 128)
    assert abs(keep.mean() - (1 - rate)) < 0.01
