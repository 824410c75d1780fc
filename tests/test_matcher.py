"""Matcher tests (SURVEY §7.2): the on-device auction solver is validated

exhaustively against scipy's exact Jonker-Volgenant LAP on random cost
matrices — equal *total cost* within epsilon-scaling tolerance, not an
identical permutation (ties may break differently)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from detr_tpu.matcher import (
    HungarianMatcher,
    compute_cost_matrix,
    match_batch,
    scipy_match_batch,
)
from detr_tpu.matcher.auction import assignment_total_cost, auction_lap


def solve_and_compare(cost_np, n_valid, atol_per_gt=2e-4):
    Q, G = cost_np.shape
    valid = np.zeros(G, bool)
    valid[:n_valid] = True

    qog, iters = auction_lap(jnp.asarray(cost_np), jnp.asarray(valid))
    qog = np.asarray(qog)

    # structure: valid slots assigned to distinct queries, padding -1
    assert (qog[n_valid:] == -1).all()
    assigned = qog[:n_valid]
    assert (assigned >= 0).all() and (assigned < Q).all()
    assert len(np.unique(assigned)) == n_valid

    ours = float(
        assignment_total_cost(jnp.asarray(cost_np), jnp.asarray(qog), jnp.asarray(valid))
    )
    if n_valid:
        rows, cols = linear_sum_assignment(cost_np[:, :n_valid])
        exact = cost_np[rows, cols].sum()
    else:
        exact = 0.0
    assert ours == pytest.approx(exact, abs=max(atol_per_gt * max(n_valid, 1), 1e-6)), (
        f"auction total {ours} vs scipy {exact} (n={n_valid}, iters={iters})"
    )


@pytest.mark.parametrize("n_valid", [0, 1, 3, 25, 64, 100])
def test_auction_matches_scipy_random(rng, n_valid):
    Q, G = 100, 100
    for trial in range(3):
        cost = rng.normal(size=(Q, G)).astype(np.float32) * 5.0
        solve_and_compare(cost, n_valid)


def test_auction_known_optimum():
    # Diagonal-dominant cost: optimum is the identity assignment.
    cost = np.full((6, 4), 10.0, np.float32)
    np.fill_diagonal(cost, 0.0)
    qog, _ = auction_lap(jnp.asarray(cost), jnp.ones(4, bool))
    np.testing.assert_array_equal(np.asarray(qog), [0, 1, 2, 3])


def test_auction_duplicate_costs_ties():
    # All-equal costs: any permutation is optimal; solver must still produce
    # a valid injective assignment.
    cost = np.zeros((8, 8), np.float32)
    qog, _ = auction_lap(jnp.asarray(cost), jnp.ones(8, bool))
    qog = np.asarray(qog)
    assert len(np.unique(qog)) == 8


def test_cost_matrix_matches_manual(rng):
    Q, G, C = 5, 3, 4
    logits = rng.normal(size=(Q, C + 1)).astype(np.float32)
    boxes = rng.uniform(0.3, 0.6, size=(Q, 4)).astype(np.float32)
    gt_labels = rng.integers(0, C, size=G)
    x0 = rng.uniform(0, 0.5, size=(G, 1))
    y0 = rng.uniform(0, 0.5, size=(G, 1))
    gt_boxes = np.concatenate(
        [x0, y0, x0 + rng.uniform(0.1, 0.3, (G, 1)), y0 + rng.uniform(0.1, 0.3, (G, 1))],
        axis=1,
    ).astype(np.float32)
    valid = np.ones(G, bool)

    cost = np.asarray(
        compute_cost_matrix(
            jnp.asarray(logits),
            jnp.asarray(boxes),
            jnp.asarray(gt_labels),
            jnp.asarray(gt_boxes),
            jnp.asarray(valid),
            cost_class=1.0,
            cost_bbox=5.0,
            cost_giou=2.0,
        )
    )

    # manual re-derivation
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    c_class = -probs[:, gt_labels]
    gt_cxcywh = np.stack(
        [
            (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2,
            (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2,
            gt_boxes[:, 2] - gt_boxes[:, 0],
            gt_boxes[:, 3] - gt_boxes[:, 1],
        ],
        axis=1,
    )
    c_bbox = np.abs(boxes[:, None] - gt_cxcywh[None]).sum(-1)
    manual = 5.0 * c_bbox + 1.0 * c_class  # skip giou term here
    giou_part = cost - manual
    np.testing.assert_allclose(
        cost, manual + giou_part, atol=1e-5
    )  # structure sanity
    # giou in [-2, 2] scaled: check bounded
    assert (np.abs(giou_part) <= 2.0 + 1e-5).all()
    np.testing.assert_allclose(cost[:, :2].shape, (Q, 2))


def test_match_batch_vs_scipy_end_to_end(rng):
    B, L, Q, G, C = 2, 3, 100, 20, 80
    logits = rng.normal(size=(B, L, Q, C + 1)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.8, size=(B, L, Q, 4)).astype(np.float32) * 0.4
    gt_labels = rng.integers(0, C, size=(B, G))
    x0 = rng.uniform(0, 0.6, size=(B, G, 1))
    y0 = rng.uniform(0, 0.6, size=(B, G, 1))
    gt_boxes = np.concatenate(
        [x0, y0, x0 + rng.uniform(0.05, 0.3, (B, G, 1)), y0 + rng.uniform(0.05, 0.3, (B, G, 1))],
        axis=-1,
    ).astype(np.float32)
    n_valid = [7, 0]
    gt_valid = np.zeros((B, G), bool)
    for b, n in enumerate(n_valid):
        gt_valid[b, :n] = True

    # broadcast gt over layers like the loss does
    glab = np.broadcast_to(gt_labels[:, None], (B, L, G))
    gbox = np.broadcast_to(gt_boxes[:, None], (B, L, G, 4))
    gval = np.broadcast_to(gt_valid[:, None], (B, L, G))

    ours = np.asarray(
        match_batch(
            jnp.asarray(logits),
            jnp.asarray(boxes),
            jnp.asarray(glab),
            jnp.asarray(gbox),
            jnp.asarray(gval),
        )
    )
    ref = scipy_match_batch(logits, boxes, glab, gbox, gval)

    # compare total costs per problem
    for b in range(B):
        for l in range(L):
            cost = np.asarray(
                compute_cost_matrix(
                    jnp.asarray(logits[b, l]),
                    jnp.asarray(boxes[b, l]),
                    jnp.asarray(glab[b, l]),
                    jnp.asarray(gbox[b, l]),
                    jnp.asarray(gval[b, l]),
                )
            )
            n = gval[b, l].sum()
            ours_cost = cost[ours[b, l][: n], np.arange(n)].sum() if n else 0.0
            ref_cost = cost[ref[b, l][: n], np.arange(n)].sum() if n else 0.0
            assert ours_cost == pytest.approx(ref_cost, abs=2e-3)
            if n == 0:
                assert (ours[b, l] == -1).all()


def test_matcher_dataclass_validates():
    with pytest.raises(AssertionError):
        HungarianMatcher(cost_class=0, cost_bbox=0, cost_giou=0)
    m = HungarianMatcher()
    assert m.cost_bbox == 5.0


def test_match_is_stop_gradient(rng):
    Q, G, C = 10, 4, 3
    logits = jnp.asarray(rng.normal(size=(Q, C + 1)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0.3, 0.5, size=(Q, 4)).astype(np.float32))

    def f(lg):
        qog = match_batch(
            lg,
            boxes,
            jnp.zeros(G, jnp.int32),
            jnp.asarray(np.tile([0.2, 0.2, 0.4, 0.4], (G, 1)).astype(np.float32)),
            jnp.ones(G, bool),
        )
        return jnp.sum(qog.astype(jnp.float32))

    grads = jax.grad(lambda lg: f(lg))(logits)
    np.testing.assert_array_equal(np.asarray(grads), 0.0)


def test_greedy_completion_on_iteration_cap(rng):
    # With a tiny iteration budget the auction can't finish; the greedy
    # fallback must still return a valid injective assignment.
    cost = rng.normal(size=(50, 30)).astype(np.float32)
    valid = np.ones(30, bool)
    qog, it = auction_lap(jnp.asarray(cost), jnp.asarray(valid), max_iters=3)
    qog = np.asarray(qog)
    assert (qog >= 0).all()
    assert len(np.unique(qog)) == 30
