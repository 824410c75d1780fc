"""Pallas TPU kernels: padding-masked attention, fused forward AND backward.

SURVEY §7 hard part #5: the reference materializes the full (B, H, L, S)
score tensor in HBM (reference detr/model.py:323-341).  For the DETR-DC5
config (~4,200 encoder tokens) that's gigabytes per step.  These kernels
compute attention one query-block at a time entirely in VMEM — scores for a
(BQ, S) row block never leave the chip — so memory stays flat in S while the
MXU does the matmuls.

Shape regime: DETR head_dim is 32 and S <= ~4.2k, so a full (BQ, S) score
row-block (~2 MB fp32 at BQ=128) plus K/V (~0.5 MB) comfortably fit VMEM; a
single softmax pass per row block replaces online-softmax bookkeeping (the
blockwise structure still leaves a future sequence-parallel mesh axis one
grid-dim away — SURVEY §5 long-context row).

Masking matches the reference semantics: key-padding positions are filled
with the dtype's most-negative value *before* softmax (reference
detr/model.py:326-330); softmax runs in fp32.

Attention-probability dropout (reference detr/model.py:344-346) runs
*inside* the kernel with the TPU PRNG: the mask is a pure function of
(seed, bh, q-block), so the backward kernel regenerates the identical mask
— no (B, H, L, S) mask tensor ever exists in HBM, which is what lets the
train path use the fused kernel.

Backward: one fused kernel over the same (B*H, L/BQ) grid recomputes the
probability block, regenerates the dropout mask, and accumulates dK/dV
across q-block grid steps into a revisited output block (TPU Pallas grids
execute sequentially, so accumulation across grid steps is well-defined);
dQ is written per block.  All accumulation in fp32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_DEF_BQ = 128


def _interpret() -> bool:
    """Interpreter mode on non-TPU backends (CPU tests)."""
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:
        return True


def pallas_attention_enabled(setting) -> bool:
    """Resolve ``DETRConfig.use_pallas_attention``: "auto" -> TPU only."""
    if setting == "auto":
        return not _interpret()
    return bool(setting)


def _dropout_keep(shape, dropout_rate: float, seed, bh, qi, block_q: int, col_off=0):
    """Counter-based keep-mask: hash of (seed, head, absolute row, col).

    Deliberately NOT ``pltpu.prng_random_bits``: the hardware PRNG's bit
    layout is not reproducible across *different* kernels (measured: the
    backward kernel regenerated a different mask than the forward on
    unaligned (BQ, S) tiles), while the forward/backward pair here must
    agree bit-exactly.  A murmur3-finalizer hash over broadcasted iotas is
    layout-independent, kernel-independent, and works in interpret mode.
    ``col_off`` shifts columns to their ABSOLUTE index when the kernel
    blocks over S (the S-blocked backward) — the mask is a pure function of
    absolute (row, col), so any fwd/bwd blocking agree.
    """
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + (qi * block_q).astype(
        jnp.uint32
    )
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    if not (isinstance(col_off, int) and col_off == 0):
        col = col + (
            jnp.uint32(col_off)
            if isinstance(col_off, int)
            else col_off.astype(jnp.uint32)
        )
    h = (
        seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        + bh.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
        + row * jnp.uint32(0x27D4EB2F)
    ) ^ (col * jnp.uint32(0x165667B1))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    # P(keep) = 1 - rate; compare in uint32 space.
    thresh = jnp.uint32(int(dropout_rate * 4294967296.0) & 0xFFFFFFFF)
    return h >= thresh


def _masked_scores(q, k, mask_row, scale: float):
    """(BQ, S_blk) fp32 masked scores for one (q-block, k-block) pair."""
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    neg = jnp.finfo(jnp.float32).min
    return jnp.where(mask_row > 0, neg, scores)


def _probs_block(q, k, mask_row, scale: float):
    """(BQ, S) fp32 softmax probabilities for one query block."""
    scores = _masked_scores(q, k, mask_row, scale)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _fwd_kernel(
    seed_ref,
    q_ref,
    k_ref,
    v_ref,
    mask_ref,
    o_ref,
    lse_ref,
    *,
    scale: float,
    dropout_rate: float,
):
    # q (1, BQ, D); k/v (1, S, D); mask (1, 1, S) int32 (1 = padded)
    # Matmul inputs stay in their native (bf16) dtype — the MXU takes bf16
    # operands with fp32 accumulation; casting operands to fp32 would drop it
    # into 4x-slower fp32 mode.  Softmax runs in fp32.
    scores = _masked_scores(q_ref[0], k_ref[0], mask_ref[0], scale)
    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    probs = e / denom
    # Row log-sum-exp, consumed by the S-blocked backward (fp32; on a fully
    # masked row this saturates to finfo.min — such rows cannot occur for
    # DETR's masks, see _flash_backward_blocked).
    lse_ref[0] = m + jnp.log(denom)  # (BQ, 1)

    if dropout_rate > 0.0:
        bh, qi = pl.program_id(0), pl.program_id(1)
        keep = _dropout_keep(
            probs.shape, dropout_rate, seed_ref[0], bh, qi, block_q=probs.shape[0]
        )
        probs = jnp.where(keep, probs * (1.0 / (1.0 - dropout_rate)), 0.0)

    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype),
        v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, D) fp32 accum
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref,
    q_ref,
    k_ref,
    v_ref,
    mask_ref,
    g_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    *,
    scale: float,
    dropout_rate: float,
):
    qi = pl.program_id(1)

    # dK/dV blocks are revisited across the (sequential) q-block grid steps
    # for a fixed bh: zero them on the first step, accumulate after.
    @pl.when(qi == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (S, D)
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)  # (BQ, D); zero rows on L-padding

    probs = _probs_block(q, k, mask_ref[0], scale)  # (BQ, S) fp32

    if dropout_rate > 0.0:
        bh = pl.program_id(0)
        keep = _dropout_keep(
            probs.shape, dropout_rate, seed_ref[0], bh, qi, block_q=probs.shape[0]
        )
        inv = 1.0 / (1.0 - dropout_rate)
        probs_d = jnp.where(keep, probs * inv, 0.0)
    else:
        probs_d = probs

    # dV += P_d^T g
    dv_ref[0] += jax.lax.dot_general(
        probs_d,
        g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)

    # dP_d = g V^T; back through dropout, then softmax.
    dp = jax.lax.dot_general(
        g,
        v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, S)
    if dropout_rate > 0.0:
        dp = jnp.where(keep, dp * inv, 0.0)
    ds = probs * (dp - jnp.sum(probs * dp, axis=1, keepdims=True))  # (BQ, S)

    # dQ = dS K * scale ; dK += dS^T Q * scale
    dq = jax.lax.dot_general(
        ds.astype(k.dtype),
        k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] += (
        jax.lax.dot_general(
            ds.astype(q.dtype),
            q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dk_ref.dtype)


def _block_dsoftmax(q, g, k, v, mask_row, lse, delta, seed, bh, qj, si, *,
                    scale, dropout_rate, block_q, block_s):
    """Shared math of the S-blocked backward kernels: (p_d, dp_d, ds) for one

    (q-block, s-block) tile.  ``lse``/``delta`` are (BQ, 1) row statistics
    saved from the forward: p = exp(s - lse) reproduces the softmax without
    seeing the full row, and delta = rowsum(g * out) equals
    rowsum(P ∘ dP) (the flash-attention identity: sum_s P·dP =
    sum_s P_d·(gVᵀ) = g·(P_d V) = g·out), so dS = P ∘ (dP - delta)."""
    s = _masked_scores(q, k, mask_row, scale)  # (BQ, BS) fp32
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        g,
        v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BS)
    if dropout_rate > 0.0:
        keep = _dropout_keep(
            p.shape, dropout_rate, seed, bh, qj, block_q=block_q,
            col_off=si * block_s,
        )
        inv = 1.0 / (1.0 - dropout_rate)
        p_d = jnp.where(keep, p * inv, 0.0)
        dp = jnp.where(keep, dp * inv, 0.0)
    else:
        p_d = p
    ds = p * (dp - delta)  # (BQ, BS)
    return p_d, ds


def _bwd_dkv_kernel(
    seed_ref, q_ref, g_ref, k_ref, v_ref, mask_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, *, scale, dropout_rate, block_q, block_s,
):
    # grid (BH, n_s, n_q): q streams innermost; dK/dV blocks (bh, si) are
    # revisited across the contiguous inner q steps — zero on first, then
    # accumulate (TPU grids execute sequentially).
    bh, si, qj = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(qj == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q, g = q_ref[0], g_ref[0].astype(jnp.float32)
    k, v = k_ref[0], v_ref[0]
    p_d, ds = _block_dsoftmax(
        q, g, k, v, mask_ref[0], lse_ref[0], delta_ref[0], seed_ref[0],
        bh, qj, si, scale=scale, dropout_rate=dropout_rate,
        block_q=block_q, block_s=block_s,
    )
    dv_ref[0] += jax.lax.dot_general(
        p_d,
        g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dk_ref[0] += (
        jax.lax.dot_general(
            ds.astype(q.dtype),
            q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dk_ref.dtype)


def _bwd_dq_kernel(
    seed_ref, q_ref, g_ref, k_ref, v_ref, mask_ref, lse_ref, delta_ref,
    dq_ref, *, scale, dropout_rate, block_q, block_s,
):
    # grid (BH, n_q, n_s): k/v stream innermost; dQ block (bh, qj)
    # accumulates across the contiguous inner s steps.
    bh, qj, si = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(si == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    q, g = q_ref[0], g_ref[0].astype(jnp.float32)
    k, v = k_ref[0], v_ref[0]
    _, ds = _block_dsoftmax(
        q, g, k, v, mask_ref[0], lse_ref[0], delta_ref[0], seed_ref[0],
        bh, qj, si, scale=scale, dropout_rate=dropout_rate,
        block_q=block_q, block_s=block_s,
    )
    dq_ref[0] += (
        jax.lax.dot_general(
            ds.astype(k.dtype),
            k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    ).astype(dq_ref.dtype)


def _prep(q, k, v, key_padding_mask, block_q):
    """Fold heads into batch, pad L to the block size, build the mask."""
    B, Lq, H, D = q.shape
    S = k.shape[1]

    def fold(x, L):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, L, x.shape[-1])

    qf, kf, vf = fold(q, Lq), fold(k, S), fold(v, S)

    Lq_pad = -(-Lq // block_q) * block_q
    if Lq_pad != Lq:
        qf = jnp.pad(qf, ((0, 0), (0, Lq_pad - Lq), (0, 0)))

    if key_padding_mask is None:
        mask = jnp.zeros((B, S), jnp.int32)
    else:
        mask = key_padding_mask.astype(jnp.int32)
    # one mask row per (b, h) program; 3D so the (1, S) block
    # satisfies Mosaic's last-two-dims tiling rule
    maskf = jnp.repeat(mask, H, axis=0).reshape(B * H, 1, S)
    return qf, kf, vf, maskf, Lq_pad


def _grid_specs(B, H, Lq_pad, S, D, block_q):
    grid = (B * H, Lq_pad // block_q)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,) int32
        pl.BlockSpec(
            (1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, S, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, S, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, S), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
    ]
    return grid, in_specs


def _flash_forward(
    q: Array,
    k: Array,
    v: Array,
    key_padding_mask: Optional[Array],
    seed: Array,
    dropout_rate: float,
    block_q: int,
) -> tuple[Array, Array]:
    """Returns (out (B, Lq, H, D), lse (B*H, Lq_pad, 1) fp32)."""
    B, Lq, H, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D**0.5)
    qf, kf, vf, maskf, Lq_pad = _prep(q, k, v, key_padding_mask, block_q)
    grid, in_specs = _grid_specs(B, H, Lq_pad, S, D, block_q)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, dropout_rate=dropout_rate),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_q, 1), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Lq_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Lq_pad, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(seed, qf, kf, vf, maskf)

    out = out[:, :Lq].reshape(B, H, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3)), lse  # (B, Lq, H, D)


def _bwd_block_q(block_q: int, S: int, D: int) -> int:
    """Shrink the bwd q-block so the kernel fits scoped VMEM at large S.

    The backward holds ~8 live (BQ, S) fp32 temporaries (probs, keep, dp,
    ds, plus compiler copies — calibrated from a measured 18.37 MB stack at
    BQ=128, S=4200, D=32) on top of the (S, D) K/V blocks and fp32 dK/dV
    accumulators.  DETR-R50 (S<=1.1k) keeps BQ=128; DC5 (S~4.2k) drops to
    the largest /8-aligned block under the budget.
    """
    budget = 13 * 1024 * 1024
    fixed = S * D * (2 * 2 + 2 * 4) + 2 * 1024 * 1024  # K/V + dK/dV + slack
    per_row = S * 4 * 8
    fit = max(8, ((budget - fixed) // per_row // 8) * 8)
    return min(block_q, fit)


def _flash_backward(
    q: Array,
    k: Array,
    v: Array,
    key_padding_mask: Optional[Array],
    seed: Array,
    g: Array,
    dropout_rate: float,
    block_q: int,
) -> tuple[Array, Array, Array]:
    B, Lq, H, D = q.shape
    S = k.shape[1]
    block_q = _bwd_block_q(block_q, S, D)
    scale = 1.0 / (D**0.5)
    qf, kf, vf, maskf, Lq_pad = _prep(q, k, v, key_padding_mask, block_q)
    gf, _, _, _, _ = _prep(g, k, v, None, block_q)  # zero-padded like q
    grid, in_specs = _grid_specs(B, H, Lq_pad, S, D, block_q)
    in_specs = in_specs + [
        pl.BlockSpec(
            (1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
    ]

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, dropout_rate=dropout_rate),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, S, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, Lq_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, S, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, S, D), jnp.float32),
        ),
        interpret=_interpret(),
    )(seed, qf, kf, vf, maskf, gf)

    def unfold(x, L, Lp):
        x = x[:, :L].reshape(B, H, L, D)
        return jnp.transpose(x, (0, 2, 1, 3))

    return (
        unfold(dq, Lq, Lq_pad).astype(q.dtype),
        unfold(dk, S, S).astype(k.dtype),
        unfold(dv, S, S).astype(v.dtype),
    )


_BWD_SINGLE_MAX_S = 2048  # single-kernel bwd stack fits scoped VMEM up to here
# S-blocked backward tile sizes, tuned on a v5e at the DC5 shape
# (B=2, S=4200, H=8, D=32; scripts/sweep_attention_blocks.py): the
# (512, 1024) tile runs the backward at ~1.96 ms/layer — at the K=32
# MXU-depth ceiling for head_dim 32 — vs 2.75 ms at the former
# (128, 512).  block_q is still capped by the query length (decoder
# cross-attention has Lq=100: padding it to 512 would 4x the dKV
# kernel's q-stream for nothing).
_DEF_BS = 1024
_DEF_BWD_BQ_LARGE_S = 512


def _flash_backward_blocked(
    q: Array,
    k: Array,
    v: Array,
    key_padding_mask: Optional[Array],
    seed: Array,
    g: Array,
    out: Array,
    lse: Array,
    dropout_rate: float,
    block_q: int,
    block_s: int = _DEF_BS,
) -> tuple[Array, Array, Array]:
    """S-blocked two-kernel flash backward for large S (DC5's ~4.2k tokens).

    The single-kernel backward holds ~(BQ, S) fp32 temporaries whose stack
    exceeds the 16 MB scoped-VMEM limit near S~4k (measured 18.37 MB at
    BQ=128, S=4200).  This path blocks S too: a dK/dV kernel (q innermost,
    accumulating into the (bh, si) block) and a dQ kernel (s innermost),
    with the softmax reproduced per tile from the forward's saved row
    log-sum-exp and the flash identity delta = rowsum(g * out).  Memory is
    flat in S; the probability tile is recomputed twice (the standard flash
    backward trade).

    Caveat: a fully key-masked row would make lse saturate to finfo.min and
    p degenerate — impossible for DETR (every image has >= 1 valid token and
    decoder self-attention is unmasked); the single-kernel path keeps the
    uniform-probability behavior for such rows.
    """
    B, Lq, H, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D**0.5)
    qf, kf, vf, maskf, Lq_pad = _prep(q, k, v, key_padding_mask, block_q)
    gf, _, _, _, _ = _prep(g, k, v, None, block_q)

    # delta = rowsum(g * out) per (bh, row): (B, L, H) -> (BH, Lq_pad, 1)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.transpose(delta, (0, 2, 1)).reshape(B * H, Lq)
    delta = jnp.pad(delta, ((0, 0), (0, Lq_pad - Lq)))[..., None]  # (BH,Lqp,1)
    # The forward padded lse to ITS block_q multiple; this kernel's block_q
    # may be larger (_DEF_BWD_BQ_LARGE_S), so re-pad to our Lq_pad — an OOB
    # block read here returns garbage lse and NaNs the whole gradient.
    # Zero-lse padding rows are inert: their g (and delta) rows are zero,
    # so every dK/dV/dQ contribution they touch vanishes.
    if lse.shape[1] < Lq_pad:
        lse = jnp.pad(lse, ((0, 0), (0, Lq_pad - lse.shape[1]), (0, 0)))

    S_pad = -(-S // block_s) * block_s
    if S_pad != S:
        kf = jnp.pad(kf, ((0, 0), (0, S_pad - S), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, S_pad - S), (0, 0)))
        # padding keys are masked out (1 = padded)
        maskf = jnp.pad(maskf, ((0, 0), (0, 0), (0, S_pad - S)), constant_values=1)

    BH = B * H
    n_q, n_s = Lq_pad // block_q, S_pad // block_s

    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def qg_spec(ix):
        return pl.BlockSpec((1, block_q, D), ix, memory_space=pltpu.VMEM)

    def kv_spec(ix):
        return pl.BlockSpec((1, block_s, D), ix, memory_space=pltpu.VMEM)

    def mask_spec(ix):
        return pl.BlockSpec((1, 1, block_s), ix, memory_space=pltpu.VMEM)

    def row_spec(ix):
        return pl.BlockSpec((1, block_q, 1), ix, memory_space=pltpu.VMEM)

    kw = dict(
        scale=scale, dropout_rate=dropout_rate, block_q=block_q, block_s=block_s
    )
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **kw),
        grid=(BH, n_s, n_q),
        in_specs=[
            seed_spec,
            qg_spec(lambda bh, si, qj: (bh, qj, 0)),
            qg_spec(lambda bh, si, qj: (bh, qj, 0)),
            kv_spec(lambda bh, si, qj: (bh, si, 0)),
            kv_spec(lambda bh, si, qj: (bh, si, 0)),
            mask_spec(lambda bh, si, qj: (bh, 0, si)),
            row_spec(lambda bh, si, qj: (bh, qj, 0)),
            row_spec(lambda bh, si, qj: (bh, qj, 0)),
        ],
        out_specs=(
            kv_spec(lambda bh, si, qj: (bh, si, 0)),
            kv_spec(lambda bh, si, qj: (bh, si, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S_pad, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, S_pad, D), jnp.float32),
        ),
        interpret=_interpret(),
    )(seed, qf, gf, kf, vf, maskf, lse, delta)

    (dq,) = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kw),
        grid=(BH, n_q, n_s),
        in_specs=[
            seed_spec,
            qg_spec(lambda bh, qj, si: (bh, qj, 0)),
            qg_spec(lambda bh, qj, si: (bh, qj, 0)),
            kv_spec(lambda bh, qj, si: (bh, si, 0)),
            kv_spec(lambda bh, qj, si: (bh, si, 0)),
            mask_spec(lambda bh, qj, si: (bh, 0, si)),
            row_spec(lambda bh, qj, si: (bh, qj, 0)),
            row_spec(lambda bh, qj, si: (bh, qj, 0)),
        ],
        out_specs=(qg_spec(lambda bh, qj, si: (bh, qj, 0)),),
        out_shape=(jax.ShapeDtypeStruct((BH, Lq_pad, D), jnp.float32),),
        interpret=_interpret(),
    )(seed, qf, gf, kf, vf, maskf, lse, delta)

    def unfold(x, L):
        x = x[:, :L].reshape(B, H, L, D)
        return jnp.transpose(x, (0, 2, 1, 3))

    return (
        unfold(dq, Lq).astype(q.dtype),
        unfold(dk, S).astype(k.dtype),
        unfold(dv, S).astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def pallas_masked_attention(
    q: Array,
    k: Array,
    v: Array,
    key_padding_mask: Optional[Array] = None,
    seed: Optional[Array] = None,
    dropout_rate: float = 0.0,
    block_q: int = _DEF_BQ,
) -> Array:
    """Padding-masked MHA core with fused kernels, (B, L, H, D) in/out.

    With ``dropout_rate == 0`` this is numerically equivalent (fp32 softmax)
    to ``scaled_dot_product_attention(..., deterministic=True)``.  With
    dropout the keep-mask comes from the TPU PRNG seeded by ``seed`` (an
    int32 scalar array); forward and backward regenerate the identical mask.
    """
    if seed is None:
        if dropout_rate > 0.0:
            # Match the XLA path's contract (ops/attention.py): a silent
            # constant seed would reuse ONE dropout mask every call/step,
            # degenerating dropout into fixed structured sparsity.
            raise ValueError("dropout_rate > 0 requires a seed")
        seed = jnp.zeros((1,), jnp.int32)
    out, _ = _flash_forward(q, k, v, key_padding_mask, seed, dropout_rate, block_q)
    return out


def _fwd(q, k, v, key_padding_mask, seed, dropout_rate, block_q):
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    out, lse = _flash_forward(q, k, v, key_padding_mask, seed, dropout_rate, block_q)
    return out, (q, k, v, key_padding_mask, seed, out, lse)


def _bwd(dropout_rate, block_q, residuals, g):
    q, k, v, key_padding_mask, seed, out, lse = residuals
    if k.shape[1] > _BWD_SINGLE_MAX_S:
        # block_s passed explicitly so the module global is read at call
        # time (tests shrink _DEF_BS to force the multi-S-block route).
        # Grow the q-block toward the tuned large-S tile, but never past
        # the /128-rounded query length (see _DEF_BWD_BQ_LARGE_S note).
        bq = max(
            block_q,
            min(_DEF_BWD_BQ_LARGE_S, -(-q.shape[1] // 128) * 128),
        )
        dq, dk, dv = _flash_backward_blocked(
            q, k, v, key_padding_mask, seed, g, out, lse, dropout_rate, bq,
            block_s=_DEF_BS,
        )
    else:
        dq, dk, dv = _flash_backward(
            q, k, v, key_padding_mask, seed, g, dropout_rate, block_q
        )
    return dq, dk, dv, None, None


pallas_masked_attention.defvjp(_fwd, _bwd)
