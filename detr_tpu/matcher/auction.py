"""Batched, jit-able linear-assignment solver (Bertsekas auction algorithm).

TPU-native replacement for the reference's per-image CPU scipy
``linear_sum_assignment`` call (reference detr/matcher.py:94) — the
structural bottleneck of the reference: a device->host sync plus a GIL-bound
C++ LAP solve, B images x 6 decoder layers per train step (SURVEY §3.3).

Design (SURVEY §7 hard part #1):
  * Rectangular problems (G valid ground-truth boxes, G <= Q queries) are
    *squared* by padding with zero-benefit dummy persons: a dummy costs the
    same (0) on every query, so the optimal square assignment restricted to
    real columns is exactly the optimal rectangular assignment.  Squaring is
    what makes epsilon-scaling sound here — for perfect matchings the sum of
    prices over assigned objects is permutation-invariant, so carrying prices
    across scaling phases cannot bias the solution (it can for rectangular
    assignments, where unused queries make price offsets non-constant).
  * Jacobi ("all bidders at once") forward auction with epsilon-scaling:
    every unassigned person simultaneously bids for its best-value query;
    each query accepts the highest bid, evicting the previous owner; epsilon
    shrinks geometrically once everyone is assigned, restarting the
    assignment while keeping prices.  With final epsilon eps_min the total
    cost is within n * eps_min of optimal — the parity criterion vs scipy is
    equal *total cost*, not an identical permutation (ties may break
    differently; SURVEY §7.2).
  * ``lax.while_loop`` with a static iteration cap: data-dependent trip count
    is fine on TPU; shapes inside the body are static.  The per-iteration
    work is pure VPU elementwise on (N, Q) tiles; vmap batches all
    B x decoder-layer problems into one loop.

Everything is fp32 (matcher costs are precision-sensitive; SURVEY §7 hard
part #4) and wrapped in ``stop_gradient`` by the caller.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# A conservative stand-in for -inf that survives arithmetic without NaNs.
_NEG_LARGE = -1e30


@partial(
    jax.jit,
    static_argnames=("max_iters", "eps_start_scale", "eps_decay", "eps_min", "unroll"),
)
def auction_lap(
    cost: Array,
    gt_valid: Array,
    eps_start_scale: float = 0.25,
    eps_decay: float = 0.15,
    eps_min: float = 1e-4,
    max_iters: int = 4000,
    unroll: int = 8,
) -> tuple[Array, Array]:
    """Solve ``min sum cost[query_of_gt[g], g]`` over injective assignments.

    Args:
      cost: (Q, G) fp32 cost matrix (rows: queries / predictions, columns:
        ground-truth boxes), G <= Q.  Entries in invalid columns are ignored.
      gt_valid: (G,) bool — which GT columns are real (non-padding).
      eps_start_scale: initial epsilon as a fraction of the benefit range.
      eps_decay: geometric epsilon scaling factor per phase.
      eps_min: final epsilon; total cost is within (#valid GT) * eps_min of
        the optimum.
      max_iters: static safety cap on total auction iterations.
      unroll: auction rounds executed per ``while_loop`` body.  TPU
        while-loop iterations carry a fixed dispatch overhead that dwarfs the
        tiny per-round VPU work; unrolling amortizes it (the extra rounds
        executed past convergence are harmless no-ops: nobody bids once
        everyone is assigned and epsilon is final).

    Returns:
      (query_of_gt, n_iters): (G,) int32 with the assigned query index per
      valid GT (-1 on padding columns), and the scalar iteration count.
    """
    cost = cost.astype(jnp.float32)
    Q, G = cost.shape
    if G > Q:
        raise ValueError(f"need G <= Q, got Q={Q}, G={G}")
    gt_valid = gt_valid.astype(bool)

    # Square the problem: N = Q persons bid for Q queries.  Persons [0, G)
    # are GT columns (zero-benefit when padding), persons [G, Q) are dummies.
    person_real = jnp.concatenate(
        [gt_valid, jnp.zeros((Q - G,), bool)]
    )  # (Q,) which persons carry real benefits
    benefit = jnp.zeros((Q, Q), jnp.float32)
    benefit = benefit.at[:G, :].set(jnp.where(gt_valid[:, None], -cost.T, 0.0))

    finite_range = jnp.maximum(
        jnp.max(jnp.where(person_real[:, None], jnp.abs(benefit), 0.0)), 1e-6
    )
    eps0 = jnp.maximum(finite_range * eps_start_scale, eps_min)

    person_idx = jnp.arange(Q, dtype=jnp.int32)
    q_idx = jnp.arange(Q, dtype=jnp.int32)

    def cond(state):
        prices, owner, obj_of_person, eps, it = state
        done = jnp.all(obj_of_person >= 0) & (eps <= eps_min)
        return (~done) & (it < max_iters)

    def unrolled_body(state):
        for _ in range(unroll):
            state = body(state)
        return state

    def body(state):
        prices, owner, obj_of_person, eps, it = state

        # Phase transition: everyone assigned but epsilon still coarse ->
        # shrink epsilon, drop the assignment, keep prices (epsilon-scaling).
        rescale = jnp.all(obj_of_person >= 0) & (eps > eps_min)
        eps = jnp.where(rescale, jnp.maximum(eps * eps_decay, eps_min), eps)
        owner = jnp.where(rescale, -1, owner)
        obj_of_person = jnp.where(rescale, -1, obj_of_person)

        bidding = obj_of_person < 0  # (N,)

        # Each bidder's value for every query at current prices.
        values = benefit - prices[None, :]  # (N, Q)
        best_q = jnp.argmax(values, axis=1).astype(jnp.int32)  # (N,)
        w1 = jnp.take_along_axis(values, best_q[:, None], axis=1)[:, 0]
        masked = jnp.where(q_idx[None, :] == best_q[:, None], _NEG_LARGE, values)
        w2 = jnp.max(masked, axis=1)  # second-best value

        # Randomized tie-breaking: target a pseudo-random query among the
        # eps-near-optimal set {q : value >= w1 - eps} instead of always the
        # argmax.  Without this, interchangeable bidders (e.g. the dummy
        # persons, or early-training near-identical cost rows) all contend
        # for the same cheapest query and settle one per round — a price war
        # serializing the Jacobi loop.  Winning any candidate at
        # p_new = benefit - min(w_ex, w1 - eps) + eps still raises the price
        # by >= eps (termination) and leaves the winner within 2*eps of its
        # best alternative (2eps-CS), so the optimality bound merely doubles
        # to 2 * eps_min per GT.
        candidates = values >= (w1 - eps)[:, None]  # (N, Q), nonempty rows
        n_cand = jnp.sum(candidates, axis=1)  # (N,) >= 1
        # Cheap per-(person, iteration) integer hash for decorrelation.
        h = (person_idx * jnp.int32(1000003) + it * jnp.int32(7919) + 1) * jnp.int32(
            -1640531527
        )
        pick = jnp.abs(h) % jnp.maximum(n_cand, 1)  # (N,)
        rank = jnp.cumsum(candidates.astype(jnp.int32), axis=1) - 1  # rank within set
        is_pick = candidates & (rank == pick[:, None])
        target = jnp.argmax(is_pick, axis=1).astype(jnp.int32)  # (N,)

        # Max value over queries other than the target.
        w_ex = jnp.where(target == best_q, w2, w1)
        mu = jnp.minimum(w_ex, w1 - eps)
        bid_price = benefit[person_idx, target] - mu + eps  # (N,)
        best_q = target

        # Jacobi resolution: per query, the highest bid wins.
        bid_matrix = jnp.where(
            bidding[:, None] & (q_idx[None, :] == best_q[:, None]),
            bid_price[:, None],
            _NEG_LARGE,
        )  # (N, Q)
        top_bid = jnp.max(bid_matrix, axis=0)  # (Q,)
        winner = jnp.argmax(bid_matrix, axis=0).astype(jnp.int32)  # (Q,)
        got_bid = top_bid > _NEG_LARGE / 2

        old_owner = owner
        prices = jnp.where(got_bid, top_bid, prices)
        owner = jnp.where(got_bid, winner, owner)

        # Evict previous owners of re-auctioned queries.  Owned queries have
        # distinct owners, so the scatter indices are unique; inactive lanes
        # are routed out of bounds and dropped.
        evict = got_bid & (old_owner >= 0) & (old_owner != winner)
        evict_idx = jnp.where(evict, old_owner, Q)
        obj_of_person = obj_of_person.at[evict_idx].set(-1, mode="drop")

        # Record the new assignments.  Each person bids on exactly one query,
        # so it can win at most one: winner indices on got_bid lanes are
        # unique.
        assign_idx = jnp.where(got_bid, winner, Q)
        obj_of_person = obj_of_person.at[assign_idx].set(q_idx, mode="drop")

        return prices, owner, obj_of_person, eps, it + 1

    init = (
        jnp.zeros((Q,), jnp.float32),  # prices
        jnp.full((Q,), -1, jnp.int32),  # owner: person owning each query
        jnp.full((Q,), -1, jnp.int32),  # obj_of_person
        eps0,
        jnp.int32(0),
    )
    prices, owner, obj_of_person, eps, it = jax.lax.while_loop(
        cond, unrolled_body, init
    )
    query_of_gt = jnp.where(gt_valid, obj_of_person[:G], -1)
    query_of_gt = _greedy_complete(cost, query_of_gt, gt_valid)
    return query_of_gt, it


def _greedy_complete(cost: Array, query_of_gt: Array, gt_valid: Array) -> Array:
    """Assign any still-unassigned valid GT to its cheapest free query.

    The auction terminates with a complete assignment in virtually all cases;
    this O(G*Q) anytime fallback guarantees a valid injective matching even
    when ``max_iters`` is hit (so a pathological batch can never wedge the
    train step), at the price of local suboptimality for the completed rows.
    """
    Q, G = cost.shape
    big = jnp.float32(3.4e38)

    owned = jnp.zeros((Q,), bool)
    owned = owned.at[jnp.where(query_of_gt >= 0, query_of_gt, Q)].set(
        True, mode="drop"
    )

    def body(g, carry):
        qog, owned = carry
        need = gt_valid[g] & (qog[g] < 0)
        masked_col = jnp.where(owned, big, cost[:, g])
        q = jnp.argmin(masked_col).astype(jnp.int32)
        qog = qog.at[g].set(jnp.where(need, q, qog[g]))
        owned = owned.at[q].set(owned[q] | need)
        return qog, owned

    query_of_gt, _ = jax.lax.fori_loop(0, G, body, (query_of_gt, owned))
    return query_of_gt


def assignment_total_cost(cost: Array, query_of_gt: Array, gt_valid: Array) -> Array:
    """Sum of cost over the assignment; padding columns contribute 0."""
    G = cost.shape[1]
    g_idx = jnp.arange(G)
    picked = cost[jnp.clip(query_of_gt, 0), g_idx]
    return jnp.sum(jnp.where(gt_valid & (query_of_gt >= 0), picked, 0.0))
