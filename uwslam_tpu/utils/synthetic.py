"""Synthetic photometrically-consistent scenes with exact ground truth.

Renders views of a textured plane from arbitrary SE(3) poses by ray-casting
against a continuous procedural texture — so tracking/BA tests have golden
trajectories (SURVEY.md §4: "golden-trajectory integration tests on short
synthetic sequences (known SE(3) motion rendered from a textured plane)").
The reference has no equivalent; it eyeballed Rviz overlays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..camera.model import PinholeCamera
from ..lie import se3


def smooth_texture(
    x: jax.Array, y: jax.Array, seed: int = 0, detail: float = 1.0
) -> jax.Array:
    """Continuous band-limited texture in [0, 255]: a fixed sum of sinusoids.

    Smooth enough that bilinear sampling and Scharr gradients are accurate,
    textured enough that photometric alignment is well-conditioned everywhere.
    `detail` scales the frequency band (higher -> more corner-like structure
    for feature-detection tests)."""
    key = jax.random.PRNGKey(seed)
    kf, kp, ka = jax.random.split(key, 3)
    n = 12
    freqs = jax.random.uniform(kf, (n, 2), minval=0.5 * detail, maxval=6.0 * detail)
    phases = jax.random.uniform(kp, (n,), minval=0.0, maxval=6.28)
    amps = jax.random.uniform(ka, (n,), minval=0.3, maxval=1.0)
    acc = jnp.zeros_like(x)
    for i in range(n):
        acc = acc + amps[i] * jnp.sin(
            freqs[i, 0] * x + freqs[i, 1] * y + phases[i]
        )
    lo, hi = -jnp.sum(amps), jnp.sum(amps)
    return (acc - lo) / (hi - lo) * 255.0


def render_plane_view(
    cam: PinholeCamera,
    T_cam_world: jax.Array,
    plane_z: float = 2.0,
    seed: int = 0,
    detail: float = 1.0,
) -> jax.Array:
    """Render the world plane z=plane_z seen from camera pose T_cam_world.

    World frame == camera frame of the identity view. Returns (H, W) float32.
    """
    v, u = jnp.meshgrid(
        jnp.arange(cam.height, dtype=jnp.float32),
        jnp.arange(cam.width, dtype=jnp.float32),
        indexing="ij",
    )
    # Ray in camera coords through each pixel.
    d = jnp.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, jnp.ones_like(u)],
        axis=-1,
    )  # (H, W, 3)
    T_world_cam = se3.inverse(T_cam_world)
    Rwc = se3.rotation(T_world_cam)
    twc = se3.translation(T_world_cam)
    d_w = jnp.einsum("ij,hwj->hwi", Rwc, d)
    o_w = twc
    # Intersect z = plane_z: o_z + t d_z = plane_z.
    t = (plane_z - o_w[2]) / jnp.where(jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2])
    px = o_w[0] + t * d_w[..., 0]
    py = o_w[1] + t * d_w[..., 1]
    img = smooth_texture(px, py, seed, detail)
    behind = t <= 0
    return jnp.where(behind, 0.0, img)


def render_two_plane_view(
    cam: PinholeCamera,
    T_cam_world: jax.Array,
    z_near: float = 2.0,
    z_far: float = 3.5,
    seed: int = 0,
    detail: float = 1.0,
) -> jax.Array:
    """Two-depth scene: world x<0 lies on plane z=z_near, x>=0 on z=z_far.

    Single planes are degenerate for fundamental/essential estimation
    (homography ambiguity); two-view geometry tests need depth structure.
    """
    v, u = jnp.meshgrid(
        jnp.arange(cam.height, dtype=jnp.float32),
        jnp.arange(cam.width, dtype=jnp.float32),
        indexing="ij",
    )
    d = jnp.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, jnp.ones_like(u)],
        axis=-1,
    )
    T_world_cam = se3.inverse(T_cam_world)
    Rwc = se3.rotation(T_world_cam)
    twc = se3.translation(T_world_cam)
    d_w = jnp.einsum("ij,hwj->hwi", Rwc, d)

    def hit(z):
        t = (z - twc[2]) / jnp.where(
            jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2]
        )
        px = twc[0] + t * d_w[..., 0]
        py = twc[1] + t * d_w[..., 1]
        return t, px, py

    t1, px1, py1 = hit(z_near)
    t2, px2, py2 = hit(z_far)
    use_near = px1 < 0.0
    t = jnp.where(use_near, t1, t2)
    px = jnp.where(use_near, px1, px2)
    py = jnp.where(use_near, py1, py2)
    img = smooth_texture(px, py, seed, detail)
    return jnp.where(t <= 0, 0.0, img)


def two_plane_depth(
    cam: PinholeCamera,
    T_cam_world: jax.Array,
    z_near: float = 2.0,
    z_far: float = 3.5,
):
    """Exact per-pixel camera-frame depth for render_two_plane_view's scene
    (the ray direction has unit z in the camera frame, so depth equals the
    ray parameter t)."""
    v, u = jnp.meshgrid(
        jnp.arange(cam.height, dtype=jnp.float32),
        jnp.arange(cam.width, dtype=jnp.float32),
        indexing="ij",
    )
    d = jnp.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, jnp.ones_like(u)],
        axis=-1,
    )
    T_world_cam = se3.inverse(T_cam_world)
    Rwc = se3.rotation(T_world_cam)
    twc = se3.translation(T_world_cam)
    d_w = jnp.einsum("ij,hwj->hwi", Rwc, d)

    def hit(z):
        t = (z - twc[2]) / jnp.where(
            jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2]
        )
        return t, twc[0] + t * d_w[..., 0]

    t1, px1 = hit(z_near)
    t2, _ = hit(z_far)
    t = jnp.where(px1 < 0.0, t1, t2)
    return jnp.maximum(t, 0.0)


def render_plane_view_distorted(
    cam: PinholeCamera,
    T_cam_world: jax.Array,
    plane_z: float = 2.0,
    seed: int = 0,
    detail: float = 1.0,
) -> jax.Array:
    """Render the plane as seen by a DISTORTED camera (cam carries radtan
    coefficients): each raw pixel's ray direction is the undistorted
    normalized coordinate. Exercises the rectification path end-to-end
    (reference EUROC mode, src/CameraModel.cpp:89-103)."""
    v, u = jnp.meshgrid(
        jnp.arange(cam.height, dtype=jnp.float32),
        jnp.arange(cam.width, dtype=jnp.float32),
        indexing="ij",
    )
    xy_d = jnp.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy], axis=-1
    )
    xy = cam.undistort_normalized(xy_d)
    d = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    T_world_cam = se3.inverse(T_cam_world)
    Rwc = se3.rotation(T_world_cam)
    twc = se3.translation(T_world_cam)
    d_w = jnp.einsum("ij,hwj->hwi", Rwc, d)
    t = (plane_z - twc[2]) / jnp.where(
        jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2]
    )
    px = twc[0] + t * d_w[..., 0]
    py = twc[1] + t * d_w[..., 1]
    img = smooth_texture(px, py, seed, detail)
    return jnp.where(t <= 0, 0.0, img)


def plane_depth(cam: PinholeCamera, T_cam_world: jax.Array, plane_z: float = 2.0):
    """Exact per-pixel depth of the plane for the given view (z in cam frame)."""
    v, u = jnp.meshgrid(
        jnp.arange(cam.height, dtype=jnp.float32),
        jnp.arange(cam.width, dtype=jnp.float32),
        indexing="ij",
    )
    d = jnp.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, jnp.ones_like(u)],
        axis=-1,
    )
    T_world_cam = se3.inverse(T_cam_world)
    Rwc = se3.rotation(T_world_cam)
    twc = se3.translation(T_world_cam)
    d_w = jnp.einsum("ij,hwj->hwi", Rwc, d)
    t = (plane_z - twc[2]) / jnp.where(
        jnp.abs(d_w[..., 2]) < 1e-9, 1e-9, d_w[..., 2]
    )
    # Depth along the camera z axis = t * d_z(cam) = t * 1.
    return jnp.clip(t, 0.0, None)


def orbit_trajectory(num_frames: int, radius: float = 0.05, step: float = 0.02):
    """A gentle synthetic camera trajectory: slow sideways drift + tiny yaw.

    Returns (num_frames, 4, 4) camera-from-world poses."""
    poses = []
    for i in range(num_frames):
        xi = jnp.array(
            [
                radius * jnp.sin(0.3 * i),
                0.5 * radius * jnp.cos(0.21 * i) - 0.5 * radius,
                step * 0.3 * i,
                0.002 * i,
                0.015 * jnp.sin(0.2 * i),
                0.003 * i,
            ],
            dtype=jnp.float32,
        )
        poses.append(se3.exp(xi))
    return jnp.stack(poses)
