"""Direct photometric tracking over SE(3)."""
from .photometric import TrackResult, lm_level, residuals_and_jacobian, track
from .sequence import compose_trajectory, track_sequence, track_sequence_batched
from .points import TUM_DEPTH_FACTOR, TrackPoints, patch_points, topk_gradient_points
from .robust import WeightKind, mad_sigma, masked_median, weights
from .depth_prior import (
    DepthPrior,
    fill_prior,
    prior_from_points,
    propagate_prior,
    sample_prior,
    triangulate_matches,
)

__all__ = [
    "DepthPrior",
    "triangulate_matches",
    "prior_from_points",
    "fill_prior",
    "sample_prior",
    "propagate_prior",
    "track",
    "track_sequence",
    "track_sequence_batched",
    "compose_trajectory",
    "lm_level",
    "residuals_and_jacobian",
    "TrackResult",
    "TrackPoints",
    "topk_gradient_points",
    "patch_points",
    "TUM_DEPTH_FACTOR",
    "WeightKind",
    "weights",
    "mad_sigma",
    "masked_median",
]
