"""Detector repeatability + descriptor match precision, quantified.

VERDICT r1 weak #8: Harris + random-projection patch descriptors replace the
reference's SURF/ORB (/root/reference/src/Tracker.cpp:187-223), but nothing
measured whether they are repeatable under viewpoint change or whether the
ratio+symmetry matcher's surviving matches are geometrically correct.

This test renders the occluding multi-plane scene from two poses (exact
ray-cast geometry => exact ground-truth correspondences, with occlusion
handled by depth-consistency), degrades the second view photometrically
(sensor noise + brightness drift), and asserts:

- repeatability: a keypoint detected in view A whose ground-truth projection
  is visible in view B has a view-B detection within 2 px;
- match precision: a ratio+symmetry-surviving descriptor match lands within
  3 px of its ground-truth correspondence.
"""
import jax
import jax.numpy as jnp
import numpy as np

from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.features import describe, detect_multiscale, match_descriptors
from uwslam_tpu.image import build_pyramid
from uwslam_tpu.lie import se3
from uwslam_tpu.utils.synthetic import (
    apply_photometric,
    render_scene_view,
    scene_depth,
)

CAM = PinholeCamera(fx=260.0, fy=260.0, cx=159.5, cy=119.5, width=320, height=240)
# A real viewpoint change: ~6 cm translation + ~1.7 deg mixed rotation.
T_A = jnp.eye(4)
T_B = se3.exp(jnp.asarray([0.05, -0.02, 0.015, 0.012, -0.02, 0.018]))


def _detect_describe(img):
    pyr = build_pyramid(img, levels=3)
    kps = detect_multiscale(pyr.grad_x, pyr.grad_y, per_level=192, levels=3)
    desc = describe(pyr.images, kps.uv, kps.level, kps.valid)
    return kps, desc


def _gt_correspondence(uv_a, depth_a):
    """Ground-truth view-B pixel of each view-A keypoint + visibility.

    Visibility = in front, inside view B with a margin, and depth-consistent
    (the ray-cast depth at the projected pixel matches the transferred point's
    camera-B depth => not occluded by a nearer plane)."""
    u = uv_a[:, 0].astype(jnp.int32).clip(0, CAM.width - 1)
    v = uv_a[:, 1].astype(jnp.int32).clip(0, CAM.height - 1)
    z_a = depth_a[v, u]
    p_a = CAM.unproject(uv_a, z_a)
    p_b = se3.apply(se3.compose(T_B, se3.inverse(T_A)), p_a)
    uv_b = CAM.project(p_b)
    depth_b = scene_depth(CAM, T_B)
    ub = uv_b[:, 0].astype(jnp.int32).clip(0, CAM.width - 1)
    vb = uv_b[:, 1].astype(jnp.int32).clip(0, CAM.height - 1)
    zmap_b = depth_b[vb, ub]
    m = 8.0
    inside = (
        (uv_b[:, 0] >= m) & (uv_b[:, 0] <= CAM.width - 1 - m)
        & (uv_b[:, 1] >= m) & (uv_b[:, 1] <= CAM.height - 1 - m)
    )
    visible = (
        (z_a > 0)
        & (p_b[:, 2] > 0.1)
        & inside
        & (jnp.abs(zmap_b - p_b[:, 2]) < 0.05 * p_b[:, 2])
    )
    return uv_b, visible


def test_repeatability_and_match_precision():
    img_a = render_scene_view(CAM, T_A)
    img_b = render_scene_view(CAM, T_B)
    # Photometric degradation on view B only: sensor noise + exposure drift.
    img_b = apply_photometric(
        img_b, jax.random.PRNGKey(0), noise_sigma=2.0, gain=0.93, bias=4.0
    )
    depth_a = scene_depth(CAM, T_A)

    kps_a, desc_a = _detect_describe(img_a)
    kps_b, desc_b = _detect_describe(img_b)

    uv_b_gt, visible = _gt_correspondence(kps_a.uv, depth_a)
    cand = np.asarray(kps_a.valid & visible)
    assert cand.sum() >= 100, f"too few visible keypoints: {cand.sum()}"

    # Repeatability: nearest view-B detection within 2 px of the GT location.
    d2 = jnp.sum(
        (uv_b_gt[:, None, :] - kps_b.uv[None, :, :]) ** 2, axis=-1
    )
    d2 = jnp.where(kps_b.valid[None, :], d2, jnp.inf)
    nearest = jnp.sqrt(jnp.min(d2, axis=1))
    repeated = np.asarray(nearest < 2.0) & cand
    repeatability = repeated.sum() / cand.sum()

    # Match precision: surviving matches within 3 px of GT correspondence.
    m = match_descriptors(desc_a, desc_b, kps_a.valid, kps_b.valid)
    mv = np.asarray(m.valid) & cand  # judge only matches with known GT
    assert mv.sum() >= 50, f"too few evaluable matches: {mv.sum()}"
    err = np.linalg.norm(
        np.asarray(kps_b.uv)[np.asarray(m.idx_b)] - np.asarray(uv_b_gt),
        axis=-1,
    )
    precision = (err[mv] < 3.0).mean()

    print(
        f"repeatability={repeatability:.3f} ({repeated.sum()}/{cand.sum()}), "
        f"match precision={precision:.3f} ({mv.sum()} matches)"
    )
    assert repeatability >= 0.5, f"repeatability {repeatability:.3f} < 0.5"
    assert precision >= 0.8, f"match precision {precision:.3f} < 0.8"


def test_matcher_rejects_unrelated_scene():
    """Against a DIFFERENT scene's descriptors the ratio+symmetry gauntlet
    must pass almost nothing (the false-positive pressure case: similar
    texture statistics, zero true correspondences)."""
    from uwslam_tpu.utils.synthetic import make_plane

    img_a = render_scene_view(CAM, T_A)
    other = (
        make_plane((0.0, 0.0, 3.0), seed=21, detail=1.1),
        make_plane((0.4, -0.2, 2.0), extent=(0.5, 0.6), seed=33, detail=1.4),
    )
    img_c = render_scene_view(CAM, T_A, scene=other)

    kps_a, desc_a = _detect_describe(img_a)
    kps_c, desc_c = _detect_describe(img_c)
    m = match_descriptors(desc_a, desc_c, kps_a.valid, kps_c.valid)
    n_valid_a = int(np.asarray(kps_a.valid).sum())
    n_false = int(np.asarray(m.valid).sum())
    rate = n_false / max(n_valid_a, 1)
    print(f"false-match rate vs unrelated scene: {rate:.3f} ({n_false})")
    assert rate < 0.05, f"matcher passes {rate:.1%} on an unrelated scene"
