"""Pallas TPU kernel: VMEM-resident batched auction assignment solver.

Why a kernel: the XLA implementation (detr_tpu/matcher/auction.py) is
HBM-bound — every auction round streams ~20 (N, Q, Q) temporaries through
HBM, ~125us/round on v5e, and a train step runs hundreds of rounds.  Here the
whole solver state (benefit matrix, prices, ownership) lives in VMEM for the
entire solve, so a round is pure VPU work with zero HBM traffic.

Algorithm: squared Jacobi forward auction with epsilon-scaling and randomized
tie-breaking — see auction.py for the base correctness argument — plus two
kernel-side accelerations:

  * **Phase-outer structure**: a static unrolled loop over epsilon phases,
    each running an inner ``while`` until every problem's assignment is
    complete.  Problems whose epsilon already bottomed out skip the reset and
    stay converged.
  * **Dummy-floor equalization**: at each phase start, the prices of the
    d = Q - G_valid cheapest queries are lifted to the d-th smallest price
    (found by a short binary search).  Rationale: the dominant round cost was
    the late-phase "dummy war" — interchangeable zero-benefit dummy persons
    leapfrogging each other by epsilon to equalize the free queries' prices,
    ~(price spread / epsilon) rounds.  Because the problem is *squared*, the
    sum of prices over a perfect matching is permutation-invariant, so any
    price modification at a phase boundary (when everyone is unassigned)
    cannot bias the final assignment — the final phase re-establishes
     2-epsilon-CS from whatever prices it starts with.  Equalizing the floor
    analytically lets the dummies spread in a couple of rounds via the
    randomized tie-break.

Kernel-friendly substitutions vs the XLA path: argmax emulated with max +
first-index-of-max; the random candidate pick uses hashed priorities and a
masked argmax instead of a cumsum-rank; scatters become masked reductions
over one-hot compares.

Grid: problems are processed in VMEM-sized chunks; each grid cell runs its
own loops to convergence.
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


def _kth_smallest(x: Array, k: Array, iters: int = 14) -> Array:
    """Per-row k-th smallest of x (N, Q) via binary search; k is (N, 1).

    Returns (N, 1) lam such that ~k entries of each row are <= lam.
    """
    lo = jnp.min(x, axis=1, keepdims=True)
    hi = jnp.max(x, axis=1, keepdims=True)

    def body(i, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((x <= mid).astype(jnp.int32), axis=1, keepdims=True)
        take_hi = cnt >= k
        return jnp.where(take_hi, lo, mid), jnp.where(take_hi, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi


def _auction_kernel(
    benefit_ref,
    n_valid_ref,
    out_obj_ref,
    iters_ref,
    *,
    eps_start_scale: float,
    eps_decay: float,
    eps_min: float,
    max_iters: int,
    num_phases: int,
    unroll: int,
):
    benefit = benefit_ref[:]  # (N, P, Q) fp32, P == Q
    N, P, Q = benefit.shape
    n_valid = n_valid_ref[:, 0:1]  # (N, 1) int32 — count of real persons

    q_iota = jax.lax.broadcasted_iota(jnp.int32, (N, P, Q), 2)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (N, P, Q), 1)

    # Keep every intermediate >= 2D (Mosaic layout requirement).
    rng = jnp.max(jnp.max(jnp.abs(benefit), axis=2), axis=1, keepdims=True)  # (N,1)
    eps0 = jnp.maximum(jnp.maximum(rng, 1e-6) * eps_start_scale, eps_min)

    def one_round(state):
        prices, owner, obj, eps, it = state

        bidding = obj < 0  # (N,P)

        values = benefit - prices[:, None, :]  # (N,P,Q)
        w1 = jnp.max(values, axis=2)  # (N,P)
        best_q = _first_argmax(values, q_iota, axis=2)  # (N,P)
        masked = jnp.where(q_iota == best_q[:, :, None], _NEG_LARGE, values)
        w2 = jnp.max(masked, axis=2)

        # Randomized pick among the eps-near-optimal candidate set via hashed
        # priorities.  The hash is masked into [0, 2^30) so the non-candidate
        # sentinel (-1) can never outrank a candidate (a full-range hash
        # below the sentinel produced price-lowering bids and a livelock).
        h = (
            (p_iota * jnp.int32(1000003) + q_iota * jnp.int32(7919) + it + 1)
            * jnp.int32(-1640531527)
        ) & jnp.int32(0x3FFFFFFF)
        prio = jnp.where(values >= (w1 - eps)[:, :, None], h, jnp.int32(-1))
        target = _first_argmax(prio, q_iota, axis=2)  # (N,P)

        is_pick = q_iota == target[:, :, None]
        benefit_t = jnp.sum(jnp.where(is_pick, benefit, 0.0), axis=2)

        w_ex = jnp.where(target == best_q, w2, w1)
        mu = jnp.minimum(w_ex, w1 - eps)  # eps broadcasts (N,1)->(N,P)
        bid = benefit_t - mu + eps  # (N,P)

        # Mosaic can't insert a minor dim on 1-bit vectors; expand as int32.
        bidding3 = bidding.astype(jnp.int32)[:, :, None] > 0
        bid_matrix = jnp.where(bidding3 & is_pick, bid[:, :, None], _NEG_LARGE)
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

    p_iota2 = jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)
    q_iota2 = jax.lax.broadcasted_iota(jnp.int32, (N, Q), 1)

    def tail_round(state):
        """Gauss-Seidel round: ONE bidder per problem.

        Late-phase rounds have only a couple of unassigned persons per
        problem (price wars); a Jacobi round still pays for all P person
        rows.  This round costs one (N, P)x(P, Q) row gather plus (N, Q)
        vector work — ~13x cheaper — and single-bidder auction rounds are
        the classic Gauss-Seidel variant (no bid collisions, plain
        Bertsekas bids, strictly correct).
        """
        prices, owner, obj, eps, it = state

        unassigned = obj < 0  # (N,P)
        has_un = jnp.max(unassigned.astype(jnp.int32), axis=1, keepdims=True) > 0
        big = jnp.int32(1 << 30)
        p_star = jnp.min(
            jnp.where(unassigned, p_iota2, big), axis=1, keepdims=True
        )  # (N,1); == big when none
        p_star_safe = jnp.where(has_un, p_star, 0)

        onehot_p = (p_iota2 == p_star_safe).astype(benefit.dtype)  # (N,P)
        row_b = jax.lax.dot_general(
            onehot_p[:, None, :],
            benefit,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # (N,Q)

        values = row_b - prices  # (N,Q)
        w1 = jnp.max(values, axis=1, keepdims=True)
        best_q = _first_argmax(values, q_iota2, axis=1)[:, None]  # (N,1)
        masked = jnp.where(q_iota2 == best_q, _NEG_LARGE, values)
        w2 = jnp.max(masked, axis=1, keepdims=True)

        # Randomized pick among eps-near-optimal candidates — without it,
        # two near-tie persons alternate-evict each other on the same query
        # (+eps per round) and the tail livelocks to the iteration cap.
        h = (
            (p_star_safe * jnp.int32(1000003) + q_iota2 * jnp.int32(7919) + it + 1)
            * jnp.int32(-1640531527)
        ) & jnp.int32(0x3FFFFFFF)
        prio = jnp.where(values >= w1 - eps, h, jnp.int32(-1))
        q_star = _first_argmax(prio, q_iota2, axis=1)[:, None]  # (N,1)

        pick = q_iota2 == q_star  # (N,Q)
        b_star = jnp.sum(jnp.where(pick, row_b, 0.0), axis=1, keepdims=True)
        w_ex = jnp.where(q_star == best_q, w2, w1)
        mu = jnp.minimum(w_ex, w1 - eps)
        bid = b_star - mu + eps  # (N,1)

        old_owner = jnp.sum(jnp.where(pick, owner, 0), axis=1, keepdims=True)

        upd = pick & has_un
        prices = jnp.where(upd, bid, prices)
        owner = jnp.where(upd, p_star_safe, owner)

        evict = has_un & (old_owner >= 0) & (old_owner != p_star_safe)  # (N,1)
        obj = jnp.where(evict & (p_iota2 == old_owner), -1, obj)
        obj = jnp.where(has_un & (p_iota2 == p_star_safe), q_star, obj)

        return prices, owner, obj, eps, it + 1

    TAIL_K = 3  # switch to Gauss-Seidel when <= K unassigned per problem

    def n_unassigned_max(obj):
        per = jnp.sum((obj < 0).astype(jnp.int32), axis=1, keepdims=True)  # (N,1)
        return jnp.max(per, axis=0, keepdims=True)[0, 0]

    def settle_cond(state):
        prices, owner, obj, eps, it = state
        return (n_unassigned_max(obj) > TAIL_K) & (it < max_iters)

    def settle_body(state):
        for _ in range(unroll):
            state = one_round(state)
        return state

    def tail_cond(state):
        prices, owner, obj, eps, it = state
        # Tail rounds are ~10x cheaper than Jacobi rounds; give them a much
        # larger budget so epsilon-level price wars can finish (hitting the
        # cap degrades assignment quality via the greedy completion).
        return (n_unassigned_max(obj) > 0) & (it < 8 * max_iters)

    def tail_body(state):
        for _ in range(unroll * 2):
            state = tail_round(state)
        return state

    def phase(ph, state):
        prices, owner, obj, eps, it = state
        # Problems still above eps_min start a new phase: shrink eps, drop
        # the assignment, keep prices but equalize the dummy floor.
        active = eps > eps_min  # (N,1); phase 0: everyone (eps0 > 0 >=...)
        active = active | (ph == 0)

        d = jnp.maximum(Q - n_valid, 0)  # dummies per problem (N,1)
        lam = _kth_smallest(prices, jnp.maximum(d, 1))  # (N,1)
        lifted = jnp.maximum(prices, lam)
        prices = jnp.where(active & (d > 0), lifted, prices)

        eps = jnp.where(active, jnp.maximum(eps * eps_decay, eps_min), eps)
        eps = jnp.where(ph == 0, eps0, eps)  # phase 0 uses eps0 itself
        owner = jnp.where(active, -1, owner)
        obj = jnp.where(active, -1, obj)

        state = jax.lax.while_loop(
            settle_cond, settle_body, (prices, owner, obj, eps, it)
        )
        # Gauss-Seidel tail: finish the stragglers with cheap rounds.
        return jax.lax.while_loop(tail_cond, tail_body, state)

    state = (
        jnp.zeros((N, Q), jnp.float32),
        jnp.full((N, Q), -1, jnp.int32),
        jnp.full((N, P), -1, jnp.int32),
        eps0,
        jnp.int32(0),
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, iters_ref.shape, 1)
    counts = jnp.zeros(iters_ref.shape, jnp.int32)
    for ph in range(num_phases):  # static unroll; per-phase round counts
        it_before = state[4]
        state = phase(ph, state)
        counts = counts + jnp.where(lane == ph, state[4] - it_before, 0)
    prices, owner, obj, eps, it = state
    out_obj_ref[:] = obj
    iters_ref[:] = counts + jnp.where(lane == 127, it, 0)


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
    unroll: int = 4,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Batched LAP via the VMEM-resident auction kernel.

    Args:
      cost: (N, Q, G) fp32, G <= Q (rows queries, columns GT).
      gt_valid: (N, G) bool.
    Returns:
      (query_of_gt (N, G) int32 with -1 on padding, max rounds used).
    """
    import math

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
    n_valid = jnp.sum(gt_valid.astype(jnp.int32), axis=1)  # (N,)
    n_valid_in = jnp.broadcast_to(n_valid[:, None], (N, 128)).astype(jnp.int32)

    # Static phase count: enough to bring the largest plausible eps0 down to
    # eps_min (phase 0 runs at eps0; each later phase multiplies by decay).
    # Upper-bound the dynamic range at 1e6.
    num_phases = 1 + max(1, int(math.ceil(math.log(1e-6) / math.log(eps_decay))))

    # Chunk problems so one chunk's working set fits in VMEM (~14 live
    # (chunk, P, Q) buffers per round; tiles pad P to /8 and Q to /128).
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
        num_phases=num_phases,
        unroll=unroll,
    )
    obj, iters = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((chunk, Q, Q), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
    )(benefit, n_valid_in)

    query_of_gt = jnp.where(gt_valid, obj[:, :G], -1)
    query_of_gt = jax.vmap(_greedy_complete)(cost, query_of_gt, gt_valid)
    return query_of_gt, jnp.max(iters)
