"""Multi-device scaling: landmark-sharded distributed BA over jax meshes."""
from .dist_ba import AXIS, distributed_bundle_adjust, shard_problem
from .runtime import (
    grid_mesh,
    init_distributed,
    is_primary,
    landmark_mesh,
    primary_only_io,
)

__all__ = [
    "distributed_bundle_adjust",
    "shard_problem",
    "AXIS",
    "init_distributed",
    "landmark_mesh",
    "grid_mesh",
    "is_primary",
    "primary_only_io",
]
