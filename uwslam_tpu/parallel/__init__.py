"""Multi-device scaling: landmark-sharded distributed BA over jax meshes."""
from .dist_ba import AXIS, distributed_bundle_adjust, shard_problem

__all__ = ["distributed_bundle_adjust", "shard_problem", "AXIS"]
