"""Pallas TPU kernel: padding-masked attention (flash-style, row-block).

SURVEY §7 hard part #5: the reference materializes the full (B, H, L, S)
score tensor in HBM (reference detr/model.py:323-341).  For the DETR-DC5
config (~4,200 encoder tokens) that's gigabytes per step.  This kernel
computes attention one query-block at a time entirely in VMEM — scores for a
(BQ, S) row block never leave the chip — so memory stays flat in S while the
MXU does the two matmuls per block.

Shape regime: DETR head_dim is 32 and S <= ~4.2k, so a full (BQ, S) score
row-block (~2 MB fp32 at BQ=128) plus K/V (~0.5 MB) comfortably fit VMEM; a
single softmax pass per row block replaces online-softmax bookkeeping (the
blockwise structure still leaves a future sequence-parallel mesh axis one
grid-dim away — SURVEY §5 long-context row).

Masking matches the reference semantics: key-padding positions are filled
with the dtype's most-negative value *before* softmax (reference
detr/model.py:326-330); softmax runs in fp32.

Differentiation: wrapped in ``jax.custom_vjp`` — the backward pass recomputes
attention with the XLA reference implementation (deterministic, so fwd/bwd
agree) and takes its VJP.  The kernel is therefore used for deterministic
attention (eval, and training with attention-dropout 0); the train path with
attention dropout uses the XLA implementation (dropout RNG must thread
through fwd+bwd identically).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detr_tpu.ops.attention import scaled_dot_product_attention

Array = jax.Array

_DEF_BQ = 128


def _interpret() -> bool:
    """Interpreter mode on non-TPU backends (CPU tests)."""
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:
        return True


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # q (1, BQ, D); k/v (1, S, D); mask (1, 1, S) int32 (1 = padded)
    # Matmul inputs stay in their native (bf16) dtype — the MXU takes bf16
    # operands with fp32 accumulation; casting operands to fp32 would drop it
    # into 4x-slower fp32 mode.  Softmax runs in fp32.
    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (S, D)
    v = v_ref[0]

    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, S) fp32

    neg = jnp.finfo(jnp.float32).min
    pad = mask_ref[0]  # (1, S) int32
    scores = jnp.where(pad > 0, neg, scores)

    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    probs = (e / denom).astype(v.dtype)

    out = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, D) fp32 accum
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_forward(
    q: Array, k: Array, v: Array, key_padding_mask: Optional[Array], block_q: int
) -> Array:
    B, Lq, H, D = q.shape
    S = k.shape[1]
    scale = 1.0 / (D**0.5)

    # (B, L, H, D) -> (B*H, L, D)
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

    grid = (B * H, Lq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, S, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, S), lambda bh, qi: (bh, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, D), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq_pad, D), q.dtype),
        interpret=_interpret(),
    )(qf, kf, vf, maskf)

    out = out[:, :Lq].reshape(B, H, Lq, D)
    return jnp.transpose(out, (0, 2, 1, 3))  # (B, Lq, H, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_masked_attention(
    q: Array,
    k: Array,
    v: Array,
    key_padding_mask: Optional[Array] = None,
    block_q: int = _DEF_BQ,
) -> Array:
    """Deterministic padding-masked MHA core, (B, L, H, D) in/out.

    Numerically equivalent (fp32 softmax) to
    ``scaled_dot_product_attention(..., deterministic=True)``.
    """
    return _flash_forward(q, k, v, key_padding_mask, block_q)


def _fwd(q, k, v, key_padding_mask, block_q):
    return _flash_forward(q, k, v, key_padding_mask, block_q), (
        q,
        k,
        v,
        key_padding_mask,
    )


def _bwd(block_q, residuals, g):
    q, k, v, key_padding_mask = residuals

    def ref(q, k, v):
        return scaled_dot_product_attention(
            q, k, v, key_padding_mask=key_padding_mask, deterministic=True
        )

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


pallas_masked_attention.defvjp(_fwd, _bwd)
