"""Pipelined live loop (frames in flight) vs the synchronous path.

The pipelined driver (SlamSystem.process_frame_async + flush) must produce
the same trajectory as process_frame: the megastep fuses the identical
stages, and retirement replays the identical host policies a few frames
late. These tests pin that equivalence and the drain semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.camera.calibration import Calibration
from uwslam_tpu.config import SlamConfig, TrackerConfig
from uwslam_tpu.io import ate_rmse
from uwslam_tpu.lie import se3
from uwslam_tpu.system import SlamSystem
from uwslam_tpu.utils.synthetic import render_plane_view

CAM = PinholeCamera(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)


def make_sequence(n=12):
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


def make_config():
    return SlamConfig(
        tracker=TrackerConfig(
            pyramid_levels=4,
            track_levels=(2, 1, 0),
            num_points=512,
            point_block=4,
            mono_depth=2.0,
        ),
    )


def run(frames, pipelined: bool):
    calib = Calibration(raw=CAM, out_width=160, out_height=120)
    system = SlamSystem(calib, make_config())
    step = system.process_frame_async if pipelined else system.process_frame
    for i, f in enumerate(frames):
        step(f, timestamp=float(i))
    if pipelined:
        system.flush()
    return system


class TestPipelinedLoop:
    def test_matches_sync_trajectory(self):
        frames, gt = make_sequence(12)
        sys_sync = run(frames, pipelined=False)
        sys_pipe = run(frames, pipelined=True)
        _, poses_sync = sys_sync.export_trajectory()
        _, poses_pipe = sys_pipe.export_trajectory()
        assert len(poses_pipe) == len(frames)
        # Frame ids arrive in order despite batched retirement.
        assert [s.frame_id for s in sys_pipe.trajectory] == list(
            range(len(frames))
        )
        # The tracked poses agree to numerical noise: the megastep runs the
        # same programs; only keyframe decision TIMING may differ (a few
        # frames late), which perturbs nothing on this short easy sequence.
        rmse_sync = ate_rmse(poses_sync[:, :3, 3], gt[:, :3, 3])
        rmse_pipe = ate_rmse(poses_pipe[:, :3, 3], gt[:, :3, 3])
        assert rmse_pipe < 0.01, f"pipelined ATE {rmse_pipe}"
        assert abs(rmse_pipe - rmse_sync) < 5e-3, (rmse_sync, rmse_pipe)

    def test_matches_sync_on_long_fast_motion(self):
        """ADVICE r4: the 12-frame easy-sequence parity proof says little
        about retirement lag under load — keyframe decisions land ~5-9
        frames late in the pipelined driver. This runs a 40-frame sequence
        with 3-4x faster motion (multiple keyframes, direction reversals)
        and requires the same accuracy from both drivers."""
        n = 40
        frames, gts = [], []
        for i in range(n):
            # Fast sinusoidal motion with reversals: adjacent-frame motion
            # ~3x the easy sequence's, multiple keyframe triggers.
            s = np.sin(0.35 * i)
            c = np.cos(0.22 * i)
            xi = jnp.asarray(
                [0.28 * s, 0.10 * c, 0.05 * s, 0.010 * c, -0.012 * s,
                 0.015 * c],
                jnp.float32,
            )
            T_cw = se3.exp(xi)
            frames.append(np.asarray(render_plane_view(CAM, T_cw, 2.0)))
            gts.append(np.asarray(se3.inverse(T_cw)))
        gt = np.stack(gts)
        sys_sync = run(frames, pipelined=False)
        sys_pipe = run(frames, pipelined=True)
        _, poses_sync = sys_sync.export_trajectory()
        _, poses_pipe = sys_pipe.export_trajectory()
        assert len(poses_pipe) == n
        assert [s.frame_id for s in sys_pipe.trajectory] == list(range(n))
        rmse_sync = ate_rmse(poses_sync[:, :3, 3], gt[:, :3, 3])
        rmse_pipe = ate_rmse(poses_pipe[:, :3, 3], gt[:, :3, 3])
        # Keyframe TIMING differs by the retirement lag, so exact pose
        # equality is not expected — but accuracy must hold on both paths.
        assert rmse_pipe < 0.02, f"pipelined ATE {rmse_pipe}"
        assert rmse_pipe < max(0.015, 1.5 * rmse_sync), (
            rmse_sync, rmse_pipe,
        )

    def test_flush_mid_sequence_then_sync(self):
        """A sync fallback mid-stream (e.g. an RGBD frame) drains the
        in-flight frames in order before processing synchronously."""
        frames, _ = make_sequence(10)
        calib = Calibration(raw=CAM, out_width=160, out_height=120)
        system = SlamSystem(calib, make_config())
        for i, f in enumerate(frames[:6]):
            system.process_frame_async(f, timestamp=float(i))
        system.flush()
        assert [s.frame_id for s in system.trajectory] == list(range(6))
        # Continue synchronously from the drained state.
        for i, f in enumerate(frames[6:], start=6):
            system.process_frame(f, timestamp=float(i))
        assert [s.frame_id for s in system.trajectory] == list(range(10))
        assert all(np.all(np.isfinite(s.T_wc)) for s in system.trajectory)

    def test_async_returns_lag_and_flush_completes(self):
        frames, _ = make_sequence(8)
        calib = Calibration(raw=CAM, out_width=160, out_height=120)
        system = SlamSystem(calib, make_config())
        returned = []
        for i, f in enumerate(frames):
            st = system.process_frame_async(f, timestamp=float(i))
            if st is not None:
                returned.append(st.frame_id)
        system.flush()
        # Retired states lag dispatch but arrive strictly in order.
        assert returned == sorted(returned)
        assert len(system.trajectory) == len(frames)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
