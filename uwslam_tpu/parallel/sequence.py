"""Sequence-parallel odometry: frame chunks tracked on different devices.

The reference's temporal loop is strictly sequential
(/root/reference/src/main_uw_slam.cpp:139-151). Frame-to-frame tracking is a
chain, but the chain FACTORS: relative poses T_{i+1<-i} are independent given
the frames, so a long sequence splits into per-device chunks (with one frame
of overlap) whose relative poses are tracked in parallel and composed with an
associative scan. This is the domain's analogue of sequence/context
parallelism (SURVEY.md §2 parallelism table: "keyframe-sharded" scaling) and
the throughput path for multi-chip offline odometry / dataset evaluation.

Cost model: each device tracks ceil((N-1)/D) frame pairs; communication is
one all-gather of (D, C, 4, 4) poses at the end — negligible next to
tracking, so scaling efficiency approaches the chunk load balance.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..camera.model import PinholeCamera
from ..tracking.sequence import track_sequence, track_sequence_batched

SEQ_AXIS = "seq"


@partial(
    jax.jit,
    static_argnames=(
        "cam", "mesh", "levels", "track_levels", "num_points", "max_iters",
        "mono_z", "mode", "batched",
    ),
)
def track_sequence_sharded(
    frames: jax.Array,
    cam: PinholeCamera,
    mesh: Mesh,
    mono_z: float = 1.0,
    levels: int = 5,
    track_levels: tuple[int, ...] = (3, 2, 1, 0),
    num_points: int = 2048,
    max_iters: int = 10,
    mode: str = "fc",
    batched: bool = True,
):
    """Track (N, H, W) frames over a mesh with axis `seq`.

    Returns (T_rel (N-1, 4, 4), inliers (N-1,), errors (N-1,)), identical in
    meaning to tracking.track_sequence (pairs past the end of the sequence
    are padded with the last frame and masked to identity)."""
    D = mesh.shape[SEQ_AXIS]
    N = frames.shape[0]
    C = -(-(N - 1) // D)  # relative poses per chunk

    # Chunk d covers frames [d*C, d*C + C] inclusive — one frame of overlap
    # links consecutive chunks. Out-of-range indices clamp to the last frame
    # (their relative poses are identity and masked out below).
    starts = jnp.arange(D) * C
    idx = jnp.clip(starts[:, None] + jnp.arange(C + 1)[None, :], 0, N - 1)
    chunks = frames[idx]  # (D, C+1, H, W)

    # batched=True: within each device's chunk the pairs are ALSO data
    # parallel (tracking.track_sequence_batched) — the two parallelism
    # levels compose: shard_map distributes chunks over the mesh, vmap
    # batches pairs within a chip. batched=False keeps the sequential scan
    # (constant-velocity prior) per chunk.
    inner = track_sequence_batched if batched else track_sequence

    def per_chunk(chunk):
        T_rel, inliers, errors = inner(
            chunk[0], cam,
            mono_z=mono_z, levels=levels, track_levels=track_levels,
            num_points=num_points, max_iters=max_iters, mode=mode,
        )
        return T_rel[None], inliers[None], errors[None]

    T_rel, inliers, errors = jax.shard_map(
        per_chunk,
        mesh=mesh,
        in_specs=P(SEQ_AXIS),
        out_specs=P(SEQ_AXIS),
        check_vma=False,
    )(chunks)

    T_rel = T_rel.reshape(D * C, 4, 4)[: N - 1]
    inliers = inliers.reshape(D * C)[: N - 1]
    errors = errors.reshape(D * C)[: N - 1]
    return T_rel, inliers, errors
