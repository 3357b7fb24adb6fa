"""Multi-device scaling: landmark-sharded distributed BA and
sequence-parallel odometry over jax meshes."""
from .dist_ba import AXIS, distributed_bundle_adjust, shard_problem
from .dist_photo_ba import PHOTO_AXIS, distributed_photometric_ba
from .runtime import (
    grid_mesh,
    init_distributed,
    is_primary,
    landmark_mesh,
    primary_only_io,
)
from .sequence import SEQ_AXIS, track_sequence_sharded

__all__ = [
    "distributed_bundle_adjust",
    "distributed_photometric_ba",
    "PHOTO_AXIS",
    "shard_problem",
    "AXIS",
    "init_distributed",
    "landmark_mesh",
    "grid_mesh",
    "is_primary",
    "primary_only_io",
    "SEQ_AXIS",
    "track_sequence_sharded",
]
