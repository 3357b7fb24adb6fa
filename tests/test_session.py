"""Session-level capabilities: map export, checkpoint/resume, profiling."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.camera.calibration import Calibration
from uwslam_tpu.config import SlamConfig, TrackerConfig
from uwslam_tpu.lie import se3
from uwslam_tpu.system import SlamSystem
from uwslam_tpu.utils.synthetic import render_plane_view

CAM = PinholeCamera(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)


def _system(profile=False):
    calib = Calibration(raw=CAM, out_width=CAM.width, out_height=CAM.height)
    return SlamSystem(
        calib,
        SlamConfig(
            tracker=TrackerConfig(
                pyramid_levels=4, track_levels=(2, 1, 0),
                num_points=512, mono_depth=2.0,
            ),
            profile=profile,
        ),
    )


def _frame(i):
    T = se3.exp(jnp.asarray([0.02 * i, 0.008 * i, 0, 0, 0, 0.002 * i]))
    return np.asarray(render_plane_view(CAM, T, 2.0))


class TestMapExport:
    def test_ply_written(self, tmp_path):
        s = _system()
        for i in range(5):
            s.process_frame(_frame(i))
        p = str(tmp_path / "map.ply")
        n = s.export_map_ply(p)
        assert n > 100
        txt = open(p).read()
        assert f"element vertex {n}" in txt


class TestCheckpointResume:
    def test_roundtrip_continues_trajectory(self, tmp_path):
        s1 = _system()
        for i in range(6):
            s1.process_frame(_frame(i))
        ck = str(tmp_path / "sess")
        s1.save_checkpoint(ck)
        ts1, poses1 = s1.export_trajectory()

        s2 = _system()
        nxt = s2.resume_from(ck)
        assert nxt == 6
        np.testing.assert_allclose(
            np.asarray(s2._T_wc), np.asarray(s1._T_wc), atol=1e-6
        )
        # Continue tracking; trajectory extends seamlessly.
        for i in range(6, 9):
            st = s2.process_frame(_frame(i))
        ts2, poses2 = s2.export_trajectory()
        assert len(ts2) == 9
        np.testing.assert_allclose(poses2[:6], poses1, atol=1e-5)
        # Final pose should still be near ground truth.
        gt = np.asarray(se3.inverse(
            se3.exp(jnp.asarray([0.16, 0.064, 0, 0, 0, 0.016]))
        ))
        err = np.linalg.norm(poses2[-1][:3, 3] - gt[:3, 3])
        assert err < 0.05, err


class TestProfiling:
    def test_stage_report(self):
        s = _system(profile=True)
        for i in range(3):
            s.process_frame(_frame(i))
        rep = s.timers.report()
        assert "ingest" in rep and "track" in rep and "select" in rep


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestDebugVisualizers:
    def test_panels_written(self, tmp_path):
        from uwslam_tpu.image import build_pyramid
        from uwslam_tpu.tracking import topk_gradient_points
        from uwslam_tpu.viz.debug import (
            save_candidate_points,
            save_jacobian_panels,
            save_warped_panels,
        )

        ref = _frame(0)
        tgt = _frame(1)
        pyr = build_pyramid(jnp.asarray(ref), levels=3)
        pts = topk_gradient_points(
            pyr.images[0], pyr.grad_mag[0], CAM, num_points=256, mono_z=2.0
        )
        pts = pts._replace(p3d=CAM.unproject(pts.uv, jnp.full(256, 2.0)))
        T = jnp.eye(4)
        pfx = str(tmp_path / "dbg")
        save_candidate_points(pfx + "_cand.png", ref, pts.uv, pts.valid)
        save_warped_panels(pfx, ref, tgt, pts, T, CAM)
        save_jacobian_panels(
            pfx, (np.asarray(pyr.images[0]), np.asarray(pyr.grad_x[0]),
                  np.asarray(pyr.grad_y[0])), pts, T, CAM,
        )
        for suffix in ("_cand.png", "_ref.png", "_tgt.png", "_warped.png",
                       "_residual.png", "_J_vx.png", "_J_wz.png"):
            assert os.path.getsize(pfx + suffix) > 500, suffix
