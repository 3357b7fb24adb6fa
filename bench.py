"""End-to-end tracking throughput benchmark (driver contract: one JSON line).

Measures tracked frames/sec of the full per-frame hot path — pyramid build +
gradient maps + top-K point selection + 3-level coarse-to-fine photometric LM
tracking — at the reference's TUM design point (640x480 grayscale,
/root/reference/calibration/calibrationTUM.xml) on whatever device jax
selects (TPU v5e under the driver).

vs_baseline anchors to 30 frames/s: the reference is a "real-time-ish"
single-GPU pipeline with no published numbers (BASELINE.md — README has no
perf section and the build is Debug), and 30 fps is the TUM camera rate its
design point implies. BASELINE.json's target of ">5x reference CPU fps" is
then vs_baseline > 5 under this anchor.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from uwslam_tpu.camera import PinholeCamera
    from uwslam_tpu.image import build_pyramid
    from uwslam_tpu.lie import se3
    from uwslam_tpu.tracking import topk_gradient_points, track
    from uwslam_tpu.utils.synthetic import plane_depth, render_plane_view

    cam = PinholeCamera(
        fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480
    )
    plane_z = 2.0

    # Pre-render a short synthetic sequence (rendering excluded from timing).
    num_frames = 24
    poses = [
        se3.exp(
            jnp.asarray(
                [0.015 * i, 0.006 * i, 0.002 * i, 0.001 * i, -0.0015 * i, 0.002 * i],
                jnp.float32,
            )
        )
        for i in range(num_frames)
    ]
    frames = [render_plane_view(cam, T, plane_z) for T in poses]
    frames = [f.block_until_ready() for f in frames]
    depth0 = plane_depth(cam, jnp.eye(4), plane_z)

    levels = (3, 2, 1, 0)
    n_points = 2048

    def per_frame(prev_img, cur_img, T_init):
        prev_pyr = build_pyramid(prev_img, levels=5)
        cur_pyr = build_pyramid(cur_img, levels=5)
        pts = topk_gradient_points(
            prev_pyr.images[0], prev_pyr.grad_mag[0], cam,
            num_points=n_points,
        )
        u = pts.uv[:, 0].astype(jnp.int32).clip(0, cam.width - 1)
        v = pts.uv[:, 1].astype(jnp.int32).clip(0, cam.height - 1)
        pts = pts._replace(p3d=cam.unproject(pts.uv, depth0[v, u]))
        out = track(
            prev_pyr, cur_pyr, pts, cam, T_init=T_init,
            levels=levels, max_iters=10,
        )
        return out.T

    step = jax.jit(per_frame)

    # Warm up / compile.
    T = step(frames[0], frames[1], jnp.eye(4)).block_until_ready()

    # Timed steady-state loop over the sequence (3 passes).
    t0 = time.perf_counter()
    n_tracked = 0
    for _ in range(3):
        T_rel = jnp.eye(4)
        for i in range(1, num_frames):
            T_rel = step(frames[i - 1], frames[i], T_rel)
            n_tracked += 1
    T_rel.block_until_ready()
    dt = time.perf_counter() - t0

    fps = n_tracked / dt
    baseline_fps = 30.0
    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_sec",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
