"""Feature pipeline tests: detection repeatability, matching, RANSAC, pose."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.features import (
    describe,
    detect_multiscale,
    essential_ransac,
    fundamental_ransac,
    match_descriptors,
    recover_pose,
    sampson_distance,
    triangulate_linear,
)
from uwslam_tpu.image import build_pyramid
from uwslam_tpu.lie import se3
from uwslam_tpu.utils.synthetic import render_plane_view as _rpv


def render_plane_view(cam, T, z):
    # Higher-detail texture: feature tests need corner-rich structure.
    return _rpv(cam, T, z, detail=3.0)

CAM = PinholeCamera(fx=150.0, fy=150.0, cx=95.5, cy=71.5, width=192, height=144)


def detect_and_describe(img):
    pyr = build_pyramid(img, levels=3)
    kps = detect_multiscale(pyr.grad_x, pyr.grad_y, per_level=128, levels=2)
    desc = describe(pyr.images, kps.uv, kps.level, kps.valid)
    return kps, desc


class TestDetection:
    def test_detects_corners(self):
        img = render_plane_view(CAM, jnp.eye(4), 2.0)
        kps, desc = detect_and_describe(img)
        assert int(kps.valid.sum()) > 50
        # Keypoints in-bounds.
        uv = np.asarray(kps.uv)[np.asarray(kps.valid)]
        assert (uv[:, 0] >= 0).all() and (uv[:, 0] < CAM.width).all()

    def test_repeatability_under_shift(self):
        # Same plane, slightly shifted camera: most detections should recur
        # within a couple of pixels of the geometrically-warped position.
        T = se3.exp(jnp.asarray([0.02, 0.0, 0.0, 0.0, 0.0, 0.0]))
        a = render_plane_view(CAM, jnp.eye(4), 2.0)
        b = render_plane_view(CAM, T, 2.0)
        ka, _ = detect_and_describe(a)
        kb, _ = detect_and_describe(b)
        # Expected disparity: du = fx * tx / z = 150*0.02/2 = 1.5 px.
        ua = np.asarray(ka.uv)[np.asarray(ka.valid)]
        ub = np.asarray(kb.uv)[np.asarray(kb.valid)]
        shifted = ua + np.array([1.5, 0.0])
        d = np.abs(shifted[:, None, :] - ub[None, :, :]).sum(-1).min(1)
        assert (d < 2.0).mean() > 0.6


class TestMatching:
    def make_pair(self, xi):
        T = se3.exp(jnp.asarray(xi, jnp.float32))
        a = render_plane_view(CAM, jnp.eye(4), 2.0)
        b = render_plane_view(CAM, T, 2.0)
        ka, da = detect_and_describe(a)
        kb, db = detect_and_describe(b)
        m = match_descriptors(da, db, ka.valid, kb.valid)
        return ka, kb, m, T

    def test_match_count_and_accuracy(self):
        ka, kb, m, T = self.make_pair([0.02, 0.0, 0.0, 0.0, 0.0, 0.0])
        n = int(m.valid.sum())
        assert n > 30
        # Matched pairs should be displaced ~1.5px in -u.
        ua = np.asarray(ka.uv)[np.asarray(m.idx_a)[np.asarray(m.valid)]]
        ub = np.asarray(kb.uv)[np.asarray(m.idx_b)[np.asarray(m.valid)]]
        disp = ub - ua
        med = np.median(disp, axis=0)
        assert abs(med[0] - 1.5) < 1.0 and abs(med[1]) < 1.0

    def test_ransac_rejects_outliers(self):
        ka, kb, m, T = self.make_pair([0.03, 0.01, 0.0, 0.0, 0.0, 0.01])
        uv_a = ka.uv[m.idx_a]
        uv_b = kb.uv[m.idx_b]
        # Inject 20% wrong matches.
        key = jax.random.PRNGKey(7)
        n = uv_a.shape[0]
        bad = jax.random.uniform(key, (n,)) < 0.2
        uv_b_corrupt = jnp.where(
            bad[:, None],
            jax.random.uniform(key, (n, 2)) * jnp.asarray([CAM.width, CAM.height]),
            uv_b,
        )
        res = fundamental_ransac(
            uv_a, uv_b_corrupt, m.valid, jax.random.PRNGKey(3)
        )
        assert bool(res.ok)
        # Outlier-corrupted rows should mostly be excluded.
        frac_bad_kept = float((res.inliers & bad & m.valid).sum()) / max(
            1.0, float((bad & m.valid).sum())
        )
        assert frac_bad_kept < 0.25

    def test_essential_recover_pose_direction(self):
        # NOTE: planar scenes are degenerate for the 8-point algorithm, so
        # this test uses a synthetic non-planar 3D cloud (the renderer's
        # single plane would make E ambiguous up to a homography).
        xi = [0.3, 0.05, 0.0, 0.0, 0.0, 0.02]
        T_gt = se3.exp(jnp.asarray(xi, jnp.float32))
        key = jax.random.PRNGKey(11)
        k1, k2, k3 = jax.random.split(key, 3)
        n = 128
        pts = jnp.stack(
            [
                jax.random.uniform(k1, (n,), minval=-1.5, maxval=1.5),
                jax.random.uniform(k2, (n,), minval=-1.0, maxval=1.0),
                jax.random.uniform(k3, (n,), minval=2.0, maxval=6.0),
            ],
            axis=-1,
        )
        pa = pts
        pb = se3.apply(T_gt, pts)
        xa = pa[:, :2] / pa[:, 2:3]
        xb = pb[:, :2] / pb[:, 2:3]
        # Small detection noise in normalized coords (~0.3 px / f).
        xa = xa + 0.001 * jax.random.normal(k1, xa.shape)
        xb = xb + 0.001 * jax.random.normal(k2, xb.shape)

        class m:
            valid = jnp.ones((n,), bool)
        res = essential_ransac(xa, xb, m.valid, jax.random.PRNGKey(5))
        assert bool(res.ok)
        rec = recover_pose(res.F, xa, xb, res.inliers)
        # Translation direction (up to scale): should align with gt.
        t_est = np.asarray(se3.translation(rec.T))
        t_gt = np.asarray(se3.translation(T_gt))
        cos = abs(
            float(t_est @ t_gt / (np.linalg.norm(t_est) * np.linalg.norm(t_gt)))
        )
        assert cos > 0.95
        # Rotation close to gt.
        dR = se3.rotation(rec.T).T @ se3.rotation(T_gt)
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.05


class TestTriangulation:
    def test_triangulate_exact(self):
        T_a = jnp.eye(4)
        T_b = se3.exp(jnp.asarray([0.2, 0.0, 0.0, 0.0, 0.05, 0.0]))
        pts = jnp.asarray(
            [[0.3, -0.2, 3.0], [-0.5, 0.4, 4.0], [0.0, 0.0, 2.5]]
        )
        pa = se3.apply(T_a, pts)
        pb = se3.apply(T_b, pts)
        xa = pa[:, :2] / pa[:, 2:3]
        xb = pb[:, :2] / pb[:, 2:3]
        X = triangulate_linear(T_a, T_b, xa, xb)
        np.testing.assert_allclose(X, pts, atol=1e-3)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
