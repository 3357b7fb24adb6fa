"""SlamSystem with feature front-end + windowed BA (BASELINE configs 2 & 4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.camera.calibration import Calibration
from uwslam_tpu.config import (
    BAConfig,
    KeyframeConfig,
    SlamConfig,
    TrackerConfig,
)
from uwslam_tpu.io import ate_rmse
from uwslam_tpu.lie import se3
from uwslam_tpu.system import SlamSystem
from uwslam_tpu.utils.synthetic import render_plane_view

CAM = PinholeCamera(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)


def make_sequence(n=10):
    frames, gts = [], []
    for i in range(n):
        xi = jnp.asarray(
            [0.03 * i, 0.01 * i, 0.005 * i, 0.002 * i, -0.002 * i, 0.004 * i],
            jnp.float32,
        )
        T_cw = se3.exp(xi)
        frames.append(np.asarray(render_plane_view(CAM, T_cw, 2.0, detail=2.0)))
        gts.append(np.asarray(se3.inverse(T_cw)))
    return frames, np.stack(gts)


def run_system(config, frames):
    calib = Calibration(raw=CAM, out_width=160, out_height=120)
    system = SlamSystem(calib, config)
    for i, f in enumerate(frames):
        system.process_frame(f, timestamp=float(i))
    return system


BASE_TRACKER = TrackerConfig(
    pyramid_levels=4, track_levels=(2, 1, 0),
    num_points=512, point_block=4, mono_depth=2.0,
)
# Aggressive keyframing so short synthetic sequences exercise the window.
KF = KeyframeConfig(min_gap=1, max_translation=0.02, max_rotation=0.02)


class TestFeatureFrontend:
    def test_config2_feature_slam(self):
        frames, gt = make_sequence(8)
        config = SlamConfig(
            tracker=BASE_TRACKER, keyframes=KF, use_features=True
        )
        system = run_system(config, frames)
        ts, poses = system.export_trajectory()
        rmse = ate_rmse(poses[:, :3, 3], gt[:, :3, 3])
        assert rmse < 0.02, f"ATE {rmse}"
        assert sum(s.is_keyframe for s in system.trajectory) >= 3


class TestWindowBA:
    def test_config4_windowed_ba(self):
        frames, gt = make_sequence(10)
        config = SlamConfig(
            tracker=BASE_TRACKER,
            keyframes=KF,
            ba=BAConfig(run_every_n_keyframes=2, max_iterations=10),
            use_features=True,
            use_ba=True,
        )
        system = run_system(config, frames)
        ts, poses = system.export_trajectory()
        rmse = ate_rmse(poses[:, :3, 3], gt[:, :3, 3])
        assert np.all(np.isfinite(poses))
        assert rmse < 0.02, f"ATE {rmse}"
        # BA actually ran: track graph populated.
        assert len(system._tracks.tracks) > 0

    def test_async_ba_matches_sync_ba(self):
        """VERDICT r4 next #2: the asynchronously dispatched window solve
        (retired through the pending-correction mechanism a few frames
        late) must produce the same trajectory as the round-3 synchronous
        write-back — on both the sync and the pipelined frame drivers."""
        from dataclasses import replace

        frames, gt = make_sequence(12)

        def run(asynchronous, pipelined):
            config = SlamConfig(
                tracker=BASE_TRACKER,
                keyframes=KF,
                ba=BAConfig(run_every_n_keyframes=2, max_iterations=10,
                            asynchronous=asynchronous),
                use_features=True,
                use_ba=True,
            )
            calib = Calibration(raw=CAM, out_width=160, out_height=120)
            system = SlamSystem(calib, config)
            step = (
                system.process_frame_async if pipelined
                else system.process_frame
            )
            for i, f in enumerate(frames):
                step(f, timestamp=float(i))
            if pipelined:
                system.flush()
            _, poses = system.export_trajectory()
            return system, poses

        sys_sync, poses_sync = run(asynchronous=False, pipelined=False)
        sys_async, poses_async = run(asynchronous=True, pipelined=False)
        sys_pipe, poses_pipe = run(asynchronous=True, pipelined=True)
        assert sys_async.ba_stats["runs"] >= 1
        assert sys_async._ba_inflight is None  # everything retired
        assert sys_pipe._ba_inflight is None
        r_sync = ate_rmse(poses_sync[:, :3, 3], gt[:, :3, 3])
        r_async = ate_rmse(poses_async[:, :3, 3], gt[:, :3, 3])
        r_pipe = ate_rmse(poses_pipe[:, :3, 3], gt[:, :3, 3])
        assert np.all(np.isfinite(poses_async))
        # Retirement timing may shift WHICH frame a correction lands on,
        # but accuracy must be preserved.
        assert r_async < max(0.02, r_sync * 1.5), (r_sync, r_async)
        assert r_pipe < max(0.02, r_sync * 1.5), (r_sync, r_pipe)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestFullStack:
    def test_all_subsystems_together(self):
        """Features + window BA + reloc + loop closure simultaneously on an
        out-and-back loop — exercises cross-subsystem pose write-backs."""
        from uwslam_tpu.config import LoopClosureConfig
        from uwslam_tpu.utils.synthetic import render_two_plane_view

        n = 20
        xs = [0.05 * i for i in range(n // 2)]
        xs += xs[::-1]
        frames, gts = [], []
        for x in xs:
            T_cw = se3.exp(jnp.asarray([x, 0.0, 0.0, 0.0, 0.0, 0.0]))
            frames.append(
                np.asarray(render_two_plane_view(CAM, T_cw, 2.0, 3.5, detail=3.0))
            )
            gts.append(np.asarray(se3.inverse(T_cw)))
        gt = np.stack(gts)
        config = SlamConfig(
            tracker=BASE_TRACKER,
            keyframes=KF,
            ba=BAConfig(run_every_n_keyframes=3, max_iterations=8),
            loop=LoopClosureConfig(
                min_gap=4, min_matches=15, pnp_min_inliers=12,
                min_similarity=0.5,
            ),
            use_features=True,
            use_ba=True,
            use_reloc=True,
            use_loop_closure=True,
        )
        system = run_system(config, frames)
        ts, poses = system.export_trajectory()
        assert np.all(np.isfinite(poses))
        rmse = ate_rmse(poses[:, :3, 3], gt[:, :3, 3])
        # The constant mono-depth assumption (2.0) is wrong for the far
        # plane (3.5), so this scenario has an irreducible geometry bias
        # (~0.065 ATE even with plain tracking) — the bound checks that the
        # subsystems COEXIST without compounding it, not metric accuracy.
        assert rmse < 0.12, f"ATE {rmse}"
        assert all(s.status != "lost" for s in system.trajectory)
        assert len(system._loops.loop_edges) >= 1
        assert len(system._tracks.tracks) > 0
