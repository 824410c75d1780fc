from detr_tpu.matcher.auction import auction_lap
from detr_tpu.matcher.hungarian import (
    HungarianMatcher,
    compute_cost_matrix,
    match_batch,
    scipy_match_batch,
)

__all__ = [
    "auction_lap",
    "HungarianMatcher",
    "compute_cost_matrix",
    "match_batch",
    "scipy_match_batch",
]
