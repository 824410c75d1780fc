"""Pallas TPU kernel: VMEM-resident batched auction assignment solver.

Why a kernel: the XLA implementation (detr_tpu/matcher/auction.py) is
HBM-bound — every auction round streams ~20 (N, Q, Q) temporaries through
HBM, ~125us/round on v5e, and a train step runs hundreds of rounds.  Here the
whole solver state (benefit matrix, prices, ownership) lives in VMEM for the
entire ``while`` loop, so a round is pure VPU work (~10us) with zero HBM
traffic — a ~10-20x matcher speedup that keeps the fused train step's
matching overhead marginal (the north-star requirement: set criterion fully
on TPU with no host sync, at speed).

Algorithm: identical to auction.py (squared Jacobi forward auction,
epsilon-scaling, randomized tie-breaking — see that module for the
correctness argument), with three kernel-friendly substitutions:
  * argmax is emulated with max + first-index-of-max (iota/min trick);
  * the random candidate pick uses per-(person, query, iteration) hashed
    priorities and a masked argmax instead of a cumsum-rank;
  * scatters (evict/assign) become masked reductions over one-hot compares.
Per-problem epsilon phases run independently (each problem rescales when its
own assignment completes), unlike the vmapped XLA path's lockstep.

Grid: problems are processed in VMEM-sized chunks; each grid cell runs its
own while loop to convergence.  For the DETR default (Q=100, B*layers=48
problems) everything fits in one cell.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_LARGE = -1e30


def _first_argmax(x: Array, iota: Array, axis: int) -> Array:
    """Index of the first maximum along ``axis`` (argmax emulation)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    hit = x >= m  # ties included; take smallest index
    big = jnp.int32(1 << 30)
    return jnp.min(jnp.where(hit, iota, big), axis=axis)


def _auction_kernel(
    benefit_ref,
    out_obj_ref,
    iters_ref,
    *,
    eps_start_scale: float,
    eps_decay: float,
    eps_min: float,
    max_iters: int,
    unroll: int,
):
    benefit = benefit_ref[:]  # (N, P, Q) fp32, P == Q
    N, P, Q = benefit.shape

    q_iota = jax.lax.broadcasted_iota(jnp.int32, (N, P, Q), 2)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (N, P, Q), 1)
    pq_iota2 = jax.lax.broadcasted_iota(jnp.int32, (N, Q), 1)  # query index
    pp_iota2 = jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)  # person index

    # Keep every intermediate >= 2D (Mosaic layout requirement).
    rng = jnp.max(jnp.max(jnp.abs(benefit), axis=2), axis=1, keepdims=True)  # (N,1)
    eps0 = jnp.maximum(jnp.maximum(rng, 1e-6) * eps_start_scale, eps_min)

    def one_round(state):
        prices, owner, obj, eps, it = state
        # (N,Q) fp32, (N,Q) i32 owner person per query, (N,P) i32 query per
        # person, (N,1) fp32 eps, i32 iteration

        all_assigned = jnp.min(obj, axis=1, keepdims=True) >= 0  # (N,1)
        rescale = all_assigned & (eps > eps_min)
        eps = jnp.where(rescale, jnp.maximum(eps * eps_decay, eps_min), eps)
        owner = jnp.where(rescale, -1, owner)
        obj = jnp.where(rescale, -1, obj)

        bidding = obj < 0  # (N,P)

        values = benefit - prices[:, None, :]  # (N,P,Q)
        w1 = jnp.max(values, axis=2)  # (N,P)
        best_q = _first_argmax(values, q_iota, axis=2)  # (N,P)
        masked = jnp.where(q_iota == best_q[:, :, None], _NEG_LARGE, values)
        w2 = jnp.max(masked, axis=2)

        # Randomized pick among the eps-near-optimal candidate set via hashed
        # priorities (uniform-ish without a cumsum).
        candidates = values >= (w1 - eps)[:, :, None]
        h = (
            (p_iota * jnp.int32(1000003) + q_iota * jnp.int32(7919) + it + 1)
            * jnp.int32(-1640531527)
        )
        # Mask the hash into [0, 2^30) so the non-candidate sentinel (-1) can
        # never outrank a candidate — a full-range int32 hash below the
        # sentinel would let a non-candidate win the pick, producing
        # price-lowering bids and a livelock.
        h = h & jnp.int32(0x3FFFFFFF)
        prio = jnp.where(candidates, h, jnp.int32(-1))
        target = _first_argmax(prio, q_iota, axis=2)  # (N,P)

        is_pick = q_iota == target[:, :, None]
        value_t = jnp.sum(jnp.where(is_pick, values, 0.0), axis=2)  # (N,P)
        benefit_t = jnp.sum(jnp.where(is_pick, benefit, 0.0), axis=2)

        w_ex = jnp.where(target == best_q, w2, w1)
        mu = jnp.minimum(w_ex, w1 - eps)  # eps broadcasts (N,1)->(N,P)
        bid = benefit_t - mu + eps  # (N,P)

        # Mosaic can't insert a minor dim on 1-bit vectors; expand as int32.
        bidding3 = bidding.astype(jnp.int32)[:, :, None] > 0
        bid_matrix = jnp.where(
            bidding3 & is_pick, bid[:, :, None], _NEG_LARGE
        )  # (N,P,Q)
        top_bid = jnp.max(bid_matrix, axis=1)  # (N,Q)
        winner = _first_argmax(bid_matrix, p_iota, axis=1)  # (N,Q)
        got = top_bid > _NEG_LARGE / 2

        old_owner = owner
        prices = jnp.where(got, top_bid, prices)
        owner = jnp.where(got, winner, owner)

        evict_q = got & (old_owner >= 0) & (old_owner != winner)  # (N,Q)
        evicted = jnp.max(
            jnp.where(
                evict_q[:, None, :] & (old_owner[:, None, :] == p_iota),
                jnp.int32(1),
                jnp.int32(0),
            ),
            axis=2,
        )  # (N,P)
        obj = jnp.where(evicted == 1, -1, obj)

        won_q = jnp.max(
            jnp.where(
                got[:, None, :] & (winner[:, None, :] == p_iota),
                q_iota,
                jnp.int32(-1),
            ),
            axis=2,
        )  # (N,P)
        obj = jnp.where(won_q >= 0, won_q, obj)

        return prices, owner, obj, eps, it + 1

    def cond(state):
        prices, owner, obj, eps, it = state
        min_obj = jnp.min(jnp.min(obj, axis=1, keepdims=True), axis=0, keepdims=True)
        max_eps = jnp.max(eps, axis=0, keepdims=True)
        done = (min_obj[0, 0] >= 0) & (max_eps[0, 0] <= eps_min)
        return jnp.logical_not(done) & (it < max_iters)

    def body(state):
        for _ in range(unroll):
            state = one_round(state)
        return state

    init = (
        jnp.zeros((N, Q), jnp.float32),
        jnp.full((N, Q), -1, jnp.int32),
        jnp.full((N, P), -1, jnp.int32),
        eps0,
        jnp.int32(0),
    )
    prices, owner, obj, eps, it = jax.lax.while_loop(cond, body, init)
    out_obj_ref[:] = obj
    iters_ref[:] = jnp.full(iters_ref.shape, it, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps_start_scale",
        "eps_decay",
        "eps_min",
        "max_iters",
        "unroll",
        "interpret",
    ),
)
def pallas_auction_lap(
    cost: Array,
    gt_valid: Array,
    eps_start_scale: float = 0.25,
    eps_decay: float = 0.15,
    eps_min: float = 1e-4,
    max_iters: int = 4000,
    unroll: int = 8,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Batched LAP via the VMEM-resident auction kernel.

    Args:
      cost: (N, Q, G) fp32, G <= Q (rows queries, columns GT).
      gt_valid: (N, G) bool.
    Returns:
      (query_of_gt (N, G) int32 with -1 on padding, iters (per chunk)).
    """
    from detr_tpu.matcher.auction import _greedy_complete

    cost = cost.astype(jnp.float32)
    N, Q, G = cost.shape
    if G > Q:
        raise ValueError(f"need G <= Q, got {Q=}, {G=}")
    gt_valid = gt_valid.astype(bool)

    # Square the problem (see auction.py): persons [0, G) real, rest dummies.
    benefit = jnp.zeros((N, Q, Q), jnp.float32)
    benefit = benefit.at[:, :G, :].set(
        jnp.where(gt_valid[:, :, None], -jnp.swapaxes(cost, 1, 2), 0.0)
    )

    # Chunk problems so one chunk's working set fits in VMEM.  The compiler
    # keeps ~14 (chunk, P, Q) fp32/int32 buffers live per round (values,
    # masked, candidates, priorities, bid matrix, one-hot compares, ...);
    # tiles pad P to /8 and Q to /128.
    pad = lambda v, m: -(-v // m) * m  # noqa: E731
    bytes_per_problem = pad(Q, 8) * pad(Q, 128) * 4
    live_buffers = 14
    budget = 13 * 1024 * 1024
    chunk = max(1, min(N, budget // (bytes_per_problem * live_buffers)))
    while N % chunk:
        chunk -= 1
    grid = N // chunk

    kernel = functools.partial(
        _auction_kernel,
        eps_start_scale=eps_start_scale,
        eps_decay=eps_decay,
        eps_min=eps_min,
        max_iters=max_iters,
        unroll=unroll,
    )
    obj, iters = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, Q, Q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((chunk, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, Q), jnp.int32),
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(benefit)

    query_of_gt = jnp.where(gt_valid, obj[:, :G], -1)
    query_of_gt = jax.vmap(_greedy_complete)(cost, query_of_gt, gt_valid)
    return query_of_gt, jnp.max(iters)
