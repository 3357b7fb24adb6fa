"""Feature detection, description, matching, and two-view geometry."""
from .descriptors import DESC_DIM, describe
from .detect import Keypoints, detect_level, detect_multiscale, harris_response
from .geometry import (
    RecoveredPose,
    decompose_essential,
    recover_pose,
    triangulate_linear,
)
from .match import Matches, match_descriptors
from .pnp import PnPResult, pnp_from_pixels, pnp_ransac
from .ransac import (
    RansacResult,
    essential_ransac,
    fundamental_ransac,
    sampson_distance,
)

__all__ = [
    "Keypoints",
    "detect_level",
    "detect_multiscale",
    "harris_response",
    "describe",
    "DESC_DIM",
    "Matches",
    "match_descriptors",
    "PnPResult",
    "pnp_ransac",
    "pnp_from_pixels",
    "RansacResult",
    "fundamental_ransac",
    "essential_ransac",
    "sampson_distance",
    "decompose_essential",
    "recover_pose",
    "triangulate_linear",
    "RecoveredPose",
]
