"""Tests for batched sequence tracking, FeatureVO, viz export, checkpointing."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.io import ate_rmse
from uwslam_tpu.lie import se3
from uwslam_tpu.models import FeatureVO
from uwslam_tpu.tracking import (
    compose_trajectory,
    track_sequence,
    track_sequence_batched,
)
from uwslam_tpu.utils.checkpoint import load_session, save_session
from uwslam_tpu.utils.profiling import StageTimer
from uwslam_tpu.utils.synthetic import render_plane_view
from uwslam_tpu.viz import trajectory_svg, write_ply, write_trajectory_html

CAM = PinholeCamera(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)


def make_frames(n=6):
    poses, frames = [], []
    for i in range(n):
        xi = jnp.asarray(
            [0.02 * i, 0.008 * i, 0.004 * i, 0.001 * i, -0.002 * i, 0.003 * i],
            jnp.float32,
        )
        T = se3.exp(xi)
        poses.append(T)
        frames.append(render_plane_view(CAM, T, 2.0))
    return jnp.stack(frames), jnp.stack(poses)


class TestTrackSequence:
    def test_recovers_trajectory(self):
        frames, T_cw = make_frames(6)
        T_rel, inliers, errors = track_sequence(
            frames, CAM, mono_z=2.0, levels=4, track_levels=(2, 1, 0),
            num_points=512, max_iters=12, block=4,
        )
        assert T_rel.shape == (5, 4, 4)
        T_wc = compose_trajectory(T_rel)
        gt_wc = jnp.stack([se3.inverse(T) for T in T_cw])
        rmse = ate_rmse(
            np.asarray(T_wc[:, :3, 3]), np.asarray(gt_wc[:, :3, 3])
        )
        assert rmse < 0.01, f"ATE {rmse}"
        assert int(inliers.min()) > 200

    def test_batched_matches_scan(self):
        """Data-parallel pair tracking recovers the same trajectory as the
        sequential scan path (identity init is inside the convergence basin
        for adjacent-frame motion)."""
        frames, T_cw = make_frames(6)
        T_rel_b, inliers_b, _ = track_sequence_batched(
            frames, CAM, mono_z=2.0, levels=4, track_levels=(2, 1, 0),
            num_points=512, max_iters=12, block=4,
        )
        assert T_rel_b.shape == (5, 4, 4)
        T_wc = compose_trajectory(T_rel_b)
        gt_wc = jnp.stack([se3.inverse(T) for T in T_cw])
        rmse = ate_rmse(
            np.asarray(T_wc[:, :3, 3]), np.asarray(gt_wc[:, :3, 3])
        )
        assert rmse < 0.01, f"ATE {rmse}"
        assert int(inliers_b.min()) > 200

    def test_compose_trajectory_identity(self):
        T_rel = jnp.stack([jnp.eye(4)] * 4)
        T = compose_trajectory(T_rel)
        np.testing.assert_allclose(T, np.tile(np.eye(4), (5, 1, 1)), atol=1e-6)


class TestFeatureVO:
    def test_translation_direction_on_sequence(self):
        from uwslam_tpu.utils.synthetic import render_two_plane_view

        # Strong baseline + two-depth scene (single planes are degenerate
        # for essential estimation).
        vo = FeatureVO(cam=CAM, translation_scale=1.0)
        n = 4
        for i in range(n):
            T = se3.exp(jnp.asarray([0.25 * i, 0.0, 0.0, 0.0, 0.0, 0.0]))
            img = np.asarray(
                render_two_plane_view(CAM, T, 2.0, 3.5, detail=3.0)
            )
            state = vo.process_frame(img)
        # After n frames the camera moved in -x (world <- camera);
        # with unit-scale integration the direction must be consistent.
        t = state.T_wc[:3, 3]
        assert state.num_inliers > 15
        assert abs(t[0]) > 0.5 * abs(t[1]) and abs(t[0]) > 0.5 * abs(t[2])


class TestVizExport:
    def test_ply_and_html(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(50, 3))
        p = str(tmp_path / "cloud.ply")
        write_ply(p, pts)
        txt = open(p).read()
        assert "element vertex 50" in txt
        est = np.cumsum(np.ones((10, 3)) * 0.1, axis=0)
        svg = trajectory_svg(est, est + 0.01)
        assert "polyline" in svg
        h = str(tmp_path / "t.html")
        write_trajectory_html(h, est)
        assert os.path.getsize(h) > 100


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        state = {
            "poses": np.random.default_rng(0).normal(size=(5, 4, 4)),
            "frame_id": np.asarray(42),
        }
        p = str(tmp_path / "sess")
        save_session(p, state)
        loaded = load_session(p)
        np.testing.assert_allclose(loaded["poses"], state["poses"])
        assert int(loaded["frame_id"]) == 42


class TestProfiling:
    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            _ = sum(range(1000))
        with t.stage("a"):
            _ = sum(range(1000))
        s = t.summary()
        assert s["a"]["count"] == 2 and s["a"]["total_s"] > 0
        assert "a" in t.report()


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestVizServer:
    def test_live_server_serves_overlay(self):
        import urllib.request

        from uwslam_tpu.viz import VizServer

        srv = VizServer(port=0)  # ephemeral port
        try:
            est = np.cumsum(np.ones((10, 3)) * 0.1, axis=0)
            srv.update(est, est + 0.01)
            html = urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/", timeout=5
            ).read().decode()
            assert "polyline" in html and "10 poses" in html
            state = urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/state.json", timeout=5
            ).read().decode()
            assert '"frames": 10' in state
        finally:
            srv.close()
