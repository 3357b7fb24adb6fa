"""Tests for PnP RANSAC and tracking-failure detection + relocalization."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.camera.calibration import Calibration
from uwslam_tpu.config import SlamConfig, TrackerConfig
from uwslam_tpu.features.pnp import pnp_ransac
from uwslam_tpu.lie import se3
from uwslam_tpu.system import SlamSystem
from uwslam_tpu.utils.synthetic import render_plane_view

CAM = PinholeCamera(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)


class TestPnPRansac:
    def test_exact_recovery_with_outliers(self):
        rng = np.random.default_rng(1)
        P = rng.uniform([-1, -1, 2], [1, 1, 5], (100, 3)).astype(np.float32)
        T_true = np.asarray(
            se3.exp(jnp.asarray([0.2, -0.1, 0.05, 0.03, -0.02, 0.04]))
        )
        pc = P @ T_true[:3, :3].T + T_true[:3, 3]
        xy = pc[:, :2] / pc[:, 2:3]
        xy += rng.normal(0, 0.3 / 500.0, xy.shape)
        out_idx = rng.choice(100, 20, replace=False)
        xy[out_idx] += rng.normal(0, 0.1, (20, 2))
        res = pnp_ransac(
            jnp.asarray(P), jnp.asarray(xy, jnp.float32),
            jnp.ones(100, bool), jax.random.PRNGKey(0),
            threshold_norm=2.0 / 500.0,
        )
        T = np.asarray(res.T)
        assert bool(res.ok) and int(res.num_inliers) >= 75
        assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.01
        cos = (np.trace(T[:3, :3] @ T_true[:3, :3].T) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos, -1, 1))) < 0.2

    def test_planar_scene(self):
        """Coplanar points are degenerate for 6-point DLT; the homography
        hypothesis family must recover the pose."""
        rng = np.random.default_rng(1)
        P = rng.uniform([-1, -1, 2], [1, 1, 2], (50, 3)).astype(np.float32)
        T_true = np.asarray(
            se3.exp(jnp.asarray([0.08, 0.03, 0.0, 0.0, 0.0, 0.008]))
        )
        pc = P @ T_true[:3, :3].T + T_true[:3, 3]
        xy = pc[:, :2] / pc[:, 2:3] + rng.normal(0, 0.3 / 120.0, (50, 2))
        res = pnp_ransac(
            jnp.asarray(P), jnp.asarray(xy, jnp.float32),
            jnp.ones(50, bool), jax.random.PRNGKey(0),
            threshold_norm=3.0 / 120.0, min_inliers=12,
        )
        T = np.asarray(res.T)
        assert bool(res.ok)
        assert np.linalg.norm(T[:3, 3] - T_true[:3, 3]) < 0.02

    def test_rejects_garbage(self):
        rng = np.random.default_rng(2)
        P = rng.uniform([-1, -1, 2], [1, 1, 5], (64, 3)).astype(np.float32)
        xy = rng.normal(0, 0.3, (64, 2)).astype(np.float32)  # uncorrelated
        res = pnp_ransac(
            jnp.asarray(P), jnp.asarray(xy), jnp.ones(64, bool),
            jax.random.PRNGKey(0), threshold_norm=2.0 / 500.0,
            min_inliers=30,
        )
        assert not bool(res.ok)


def _make_system():
    calib = Calibration(raw=CAM, out_width=CAM.width, out_height=CAM.height)
    return SlamSystem(
        calib,
        SlamConfig(
            tracker=TrackerConfig(
                pyramid_levels=4, track_levels=(2, 1, 0),
                num_points=512, mono_depth=2.0,
            ),
            use_reloc=True,
        ),
    )


class TestRelocalization:
    def test_garbage_frame_detected_and_recovered(self):
        sys_ = _make_system()
        rng = np.random.default_rng(0)
        poses = [
            se3.exp(jnp.asarray([0.02 * i, 0.008 * i, 0.0, 0.0, 0.0, 0.002 * i]))
            for i in range(6)
        ]
        # 4 good frames, 1 garbage frame, then a frame near the last good pose.
        for i in range(4):
            img = np.asarray(render_plane_view(CAM, poses[i], 2.0))
            st = sys_.process_frame(img)
            assert st.status == "ok"
        garbage = rng.uniform(0, 255, (CAM.height, CAM.width)).astype(np.float32)
        st = sys_.process_frame(garbage)
        assert st.status in ("lost", "relocalized")
        img = np.asarray(render_plane_view(CAM, poses[4], 2.0))
        st = sys_.process_frame(img)
        assert st.status in ("ok", "relocalized")
        # Pose should be close to ground truth again after recovery.
        img = np.asarray(render_plane_view(CAM, poses[5], 2.0))
        st = sys_.process_frame(img)
        T_gt_wc = np.asarray(se3.inverse(poses[5]))
        err = np.linalg.norm(st.T_wc[:3, 3] - T_gt_wc[:3, 3])
        assert err < 0.1, f"pose error after recovery: {err}"

    def test_clean_sequence_never_lost(self):
        sys_ = _make_system()
        for i in range(5):
            T = se3.exp(jnp.asarray([0.02 * i, 0.0, 0.0, 0.0, 0.0, 0.0]))
            st = sys_.process_frame(np.asarray(render_plane_view(CAM, T, 2.0)))
            assert st.status == "ok"


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
