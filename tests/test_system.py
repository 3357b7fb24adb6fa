"""End-to-end SlamSystem test: synthetic sequence -> trajectory -> ATE."""
import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.camera.calibration import Calibration
from uwslam_tpu.config import SlamConfig, TrackerConfig
from uwslam_tpu.io import ate_rmse, write_trajectory_tum, read_groundtruth_tum
from uwslam_tpu.lie import se3
from uwslam_tpu.system import SlamSystem
from uwslam_tpu.utils.synthetic import render_plane_view

CAM = PinholeCamera(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)


def make_sequence(n=8):
    """Camera poses T_cw along a gentle path; returns (frames, gt T_wc)."""
    frames, gts = [], []
    for i in range(n):
        xi = jnp.asarray(
            [0.02 * i, 0.008 * i, 0.004 * i, 0.001 * i, -0.002 * i, 0.003 * i],
            jnp.float32,
        )
        T_cw = se3.exp(xi)
        frames.append(np.asarray(render_plane_view(CAM, T_cw, 2.0)))
        gts.append(np.asarray(se3.inverse(T_cw)))
    return frames, np.stack(gts)


class TestSlamSystem:
    def test_odometry_on_synthetic_sequence(self, tmp_path):
        calib = Calibration(raw=CAM, out_width=160, out_height=120)
        config = SlamConfig(
            tracker=TrackerConfig(
                pyramid_levels=4,
                track_levels=(2, 1, 0),
                num_points=512,
                point_block=4,
                mono_depth=2.0,  # plane at z=2: correct mono scale prior
            ),
        )
        system = SlamSystem(calib, config)
        frames, gt = make_sequence(8)
        for i, f in enumerate(frames):
            state = system.process_frame(f, timestamp=float(i))
            assert np.all(np.isfinite(state.T_wc))
        ts, poses = system.export_trajectory(str(tmp_path / "traj.txt"))
        assert len(poses) == 8
        # ATE after Sim3 alignment must be small (mono scale is aligned away;
        # with mono_z=2.0 matching the plane, even unaligned error is small).
        rmse = ate_rmse(poses[:, :3, 3], gt[:, :3, 3])
        assert rmse < 0.01, f"ATE {rmse}"
        # Trajectory file round-trips.
        rows = read_groundtruth_tum(str(tmp_path / "traj.txt"), skip_lines=1)
        assert rows.shape == (8, 8)

    def test_keyframe_insertion(self):
        calib = Calibration(raw=CAM, out_width=160, out_height=120)
        config = SlamConfig(
            tracker=TrackerConfig(
                pyramid_levels=4, track_levels=(2, 1, 0),
                num_points=512, point_block=4, mono_depth=2.0,
            ),
        )
        system = SlamSystem(calib, config)
        frames, _ = make_sequence(8)
        for i, f in enumerate(frames):
            system.process_frame(f)
        # First frame always a keyframe; movement should add more.
        kfs = [s for s in system.trajectory if s.is_keyframe]
        assert len(kfs) >= 1
        assert system.trajectory[0].is_keyframe


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
