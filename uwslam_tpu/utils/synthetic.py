"""Synthetic photometrically-consistent scenes with exact ground truth.

Renders views of a textured plane from arbitrary SE(3) poses by ray-casting
against a continuous procedural texture — so tracking/BA tests have golden
trajectories (SURVEY.md §4: "golden-trajectory integration tests on short
synthetic sequences (known SE(3) motion rendered from a textured plane)").
The reference has no equivalent; it eyeballed Rviz overlays.
"""
from __future__ import annotations

from typing import NamedTuple

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


def fractal_texture(
    x: jax.Array, y: jax.Array, seed: int = 0, detail: float = 1.0,
    octaves: int = 4,
) -> jax.Array:
    """Broadband (1/f) texture in [0, 255]: `octaves` bands of sinusoids with
    amplitude halving as frequency doubles.

    Why this exists: smooth_texture is NARROWBAND (12 sinusoids in one
    frequency band). Under a 5-level pyramid that is pathological in a way
    real scenes are not — when the band's period is small on screen, the
    coarse levels alias it into structureless mush (no coarse signal to
    absorb motion) while the fine levels see a periodic energy landscape
    whose minima repeat every texture period (basin jumps). Real-world
    texture is broadband: every pyramid level keeps signal. Measured on the
    EUROC-style eval scene: tracking a 1-px-motion pair with GROUND-TRUTH
    depth diverged to |t|=0.14 m under smooth_texture and converges under
    this one."""
    key = jax.random.PRNGKey(seed)
    acc = jnp.zeros_like(x)
    n_per = 4
    # Static amplitude bound (amps <= 1.0 each) keeps this jit-friendly.
    bound = sum(n_per * (0.55 ** o) for o in range(octaves))
    for o in range(octaves):
        key, kf, kp, ka = jax.random.split(key, 4)
        base = 0.35 * detail * (2.0 ** o)
        freqs = jax.random.uniform(
            kf, (n_per, 2), minval=base, maxval=2.0 * base
        )
        phases = jax.random.uniform(kp, (n_per,), minval=0.0, maxval=6.28)
        amps = jax.random.uniform(
            ka, (n_per,), minval=0.5, maxval=1.0
        ) * (0.55 ** o)
        for i in range(n_per):
            acc = acc + amps[i] * jnp.sin(
                freqs[i, 0] * x + freqs[i, 1] * y + phases[i]
            )
    return (acc + bound) / (2.0 * bound) * 255.0


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


class PlaneSpec(NamedTuple):
    """A finite textured plane patch: point p0, in-plane axes e1/e2 (unit,
    orthogonal), half-extents (a1, a2) in plane coords (<=0 means infinite),
    and a texture seed. Used by render_scene_view for multi-plane scenes
    with real occlusion boundaries."""

    p0: jax.Array       # (3,) a point on the plane (world frame)
    e1: jax.Array       # (3,) in-plane axis
    e2: jax.Array       # (3,) in-plane axis
    a1: float           # half extent along e1 (<=0: infinite)
    a2: float           # half extent along e2 (<=0: infinite)
    seed: int = 0
    detail: float = 1.0
    octaves: int = 1    # 1: narrowband smooth_texture; >1: broadband
    #                     fractal_texture (1/f octaves — realistic pyramid
    #                     behavior; see fractal_texture's docstring)


def make_plane(
    center, normal=(0.0, 0.0, -1.0), extent=(0.0, 0.0), seed=0, detail=1.0,
    octaves=1,
) -> PlaneSpec:
    """Build a PlaneSpec from a center point + outward normal.

    The in-plane axes are any orthonormal completion of the normal; texture
    coordinates are measured along them."""
    n = jnp.asarray(normal, jnp.float32)
    n = n / jnp.linalg.norm(n)
    up = jnp.where(jnp.abs(n[1]) < 0.9,
                   jnp.asarray([0.0, 1.0, 0.0]), jnp.asarray([1.0, 0.0, 0.0]))
    e1 = jnp.cross(up, n)
    e1 = e1 / jnp.linalg.norm(e1)
    e2 = jnp.cross(n, e1)
    return PlaneSpec(
        p0=jnp.asarray(center, jnp.float32), e1=e1, e2=e2,
        a1=float(extent[0]), a2=float(extent[1]),
        seed=seed, detail=detail, octaves=octaves,
    )


def default_scene() -> tuple[PlaneSpec, ...]:
    """A canonical non-planar test scene: infinite background plane at z=4,
    a large tilted mid plane, and two closer occluding patches. Every view
    from near the origin sees occlusion boundaries and >=3 distinct depths —
    the structure a constant-z mono assumption gets badly wrong."""
    return (
        # Background: infinite wall at z=4 (slightly tilted).
        make_plane((0.0, 0.0, 4.0), normal=(0.05, -0.02, -1.0), seed=3,
                   detail=0.9),
        # Mid: big tilted slab on the left half.
        make_plane((-0.9, 0.1, 2.6), normal=(0.35, 0.1, -1.0),
                   extent=(1.1, 1.4), seed=7, detail=1.2),
        # Near: small patch right-of-center.
        make_plane((0.55, -0.25, 1.8), normal=(-0.1, 0.05, -1.0),
                   extent=(0.45, 0.5), seed=11, detail=1.5),
        # Near-bottom strip.
        make_plane((-0.1, 0.75, 2.1), normal=(0.0, -0.3, -1.0),
                   extent=(0.9, 0.25), seed=5, detail=1.3),
    )


def _ray_grid(cam: PinholeCamera):
    v, u = jnp.meshgrid(
        jnp.arange(cam.height, dtype=jnp.float32),
        jnp.arange(cam.width, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, jnp.ones_like(u)],
        axis=-1,
    )  # (H, W, 3) camera-frame ray directions with unit z


def _raycast_scene(cam, T_cam_world, scene, rays=None):
    """Shared ray-cast: returns (t, px, py, plane_idx) of the nearest hit.

    t is the ray parameter == camera-frame depth (rays have unit z).
    `rays` overrides the pinhole ray grid (distorted-camera rendering)."""
    d = _ray_grid(cam) if rays is None else rays
    T_world_cam = se3.inverse(T_cam_world)
    Rwc = se3.rotation(T_world_cam)
    twc = se3.translation(T_world_cam)
    d_w = jnp.einsum("ij,hwj->hwi", Rwc, d)

    BIG = 1e9
    t_best = jnp.full(d.shape[:2], BIG)
    px_best = jnp.zeros(d.shape[:2])
    py_best = jnp.zeros(d.shape[:2])
    idx_best = jnp.full(d.shape[:2], -1, jnp.int32)
    for i, pl in enumerate(scene):
        n = jnp.cross(pl.e1, pl.e2)
        denom = jnp.einsum("hwi,i->hw", d_w, n)
        denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        t = jnp.dot(pl.p0 - twc, n) / denom
        X = twc[None, None, :] + t[..., None] * d_w
        rel = X - pl.p0
        s1 = jnp.einsum("hwi,i->hw", rel, pl.e1)
        s2 = jnp.einsum("hwi,i->hw", rel, pl.e2)
        inside = jnp.ones_like(t, bool)
        if pl.a1 > 0:
            inside &= jnp.abs(s1) <= pl.a1
        if pl.a2 > 0:
            inside &= jnp.abs(s2) <= pl.a2
        hit = (t > 1e-4) & inside & (t < t_best)
        t_best = jnp.where(hit, t, t_best)
        px_best = jnp.where(hit, s1, px_best)
        py_best = jnp.where(hit, s2, py_best)
        idx_best = jnp.where(hit, i, idx_best)
    return t_best, px_best, py_best, idx_best


def _plane_texture(px, py, pl: PlaneSpec):
    if pl.octaves > 1:
        return fractal_texture(px * 3.0, py * 3.0, seed=pl.seed,
                               detail=pl.detail, octaves=pl.octaves)
    return smooth_texture(px * 3.0, py * 3.0, seed=pl.seed, detail=pl.detail)


def render_scene_view(
    cam: PinholeCamera,
    T_cam_world: jax.Array,
    scene: tuple[PlaneSpec, ...] | None = None,
) -> jax.Array:
    """Render a multi-plane occluding scene (nearest-hit ray cast against
    every PlaneSpec). Unlike render_plane_view / render_two_plane_view this
    produces real occlusion boundaries, depth discontinuities, and per-plane
    textures — the geometry VERDICT.md flagged the single-plane scenes as
    too easy without."""
    scene = default_scene() if scene is None else scene
    t, px, py, idx = _raycast_scene(cam, T_cam_world, scene)
    img = jnp.zeros(t.shape)
    for i, pl in enumerate(scene):
        tex = _plane_texture(px, py, pl)
        img = jnp.where(idx == i, tex, img)
    return jnp.where(idx >= 0, img, 0.0)


def scene_depth(
    cam: PinholeCamera,
    T_cam_world: jax.Array,
    scene: tuple[PlaneSpec, ...] | None = None,
) -> jax.Array:
    """Exact camera-frame depth (z along the optical axis) of the
    render_scene_view geometry; 0 where no plane is hit."""
    scene = default_scene() if scene is None else scene
    t, _, _, idx = _raycast_scene(cam, T_cam_world, scene)
    return jnp.where(idx >= 0, t, 0.0)


def render_scene_view_distorted(
    cam: PinholeCamera,
    T_cam_world: jax.Array,
    scene: tuple[PlaneSpec, ...] | None = None,
) -> jax.Array:
    """Multi-plane scene seen through a DISTORTED camera (cam carries radtan
    coefficients): each raw pixel's ray is the undistorted normalized
    coordinate. The EUROC-style input for exercising the rectification path
    (reference src/CameraModel.cpp:89-103) on occluding geometry."""
    scene = default_scene() if scene is None else scene
    v, u = jnp.meshgrid(
        jnp.arange(cam.height, dtype=jnp.float32),
        jnp.arange(cam.width, dtype=jnp.float32),
        indexing="ij",
    )
    xy_d = jnp.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy], axis=-1
    )
    xy = cam.undistort_normalized(xy_d)
    rays = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    t, px, py, idx = _raycast_scene(cam, T_cam_world, scene, rays=rays)
    img = jnp.zeros(t.shape)
    for i, pl in enumerate(scene):
        tex = _plane_texture(px, py, pl)
        img = jnp.where(idx == i, tex, img)
    return jnp.where(idx >= 0, img, 0.0)


def apply_photometric(
    image: jax.Array,
    key: jax.Array,
    noise_sigma: float = 2.0,
    gain: float = 1.0,
    bias: float = 0.0,
) -> jax.Array:
    """Photometric degradation: brightness drift (gain/bias — the underwater
    attenuation / exposure-change model the affine-brightness tracker
    compensates) + additive Gaussian sensor noise, clipped to [0, 255]."""
    img = image * gain + bias
    if noise_sigma > 0:
        img = img + noise_sigma * jax.random.normal(key, image.shape)
    return jnp.clip(img, 0.0, 255.0)


def depth_holes(
    depth: jax.Array,
    key: jax.Array,
    hole_frac: float = 0.2,
    block: int = 16,
) -> jax.Array:
    """Knock out random blocks of a depth map (depth=0 == invalid), modeling
    the holes real TUM depth PNGs carry at occlusion boundaries and
    reflective surfaces. hole_frac is the expected fraction of blocks lost."""
    H, W = depth.shape
    Hb, Wb = -(-H // block), -(-W // block)
    drop = jax.random.uniform(key, (Hb, Wb)) < hole_frac
    drop_full = jnp.repeat(jnp.repeat(drop, block, 0), block, 1)[:H, :W]
    return jnp.where(drop_full, 0.0, depth)


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
