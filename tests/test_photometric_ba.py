"""Windowed photometric BA: direct alignment over a keyframe window.

The capability the reference's commented-out Ceres ResidualIntensity
scaffolding intended (/root/reference/include/Tracker.h:295-505): joint LM
over keyframe poses and per-point inverse depths with Schur elimination of
the diagonal depth block.
"""
import jax
import jax.numpy as jnp
import numpy as np

from uwslam_tpu.ba import (
    photo_ba_problem_from_keyframes,
    photometric_bundle_adjust,
)
from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.image import build_pyramid
from uwslam_tpu.lie import se3
from uwslam_tpu.tracking import topk_gradient_points
from uwslam_tpu.utils.synthetic import (
    plane_depth,
    render_plane_view,
    render_two_plane_view,
    two_plane_depth,
)

CAM = PinholeCamera(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)
PLANE_Z = 2.0
K = 4
LEVEL = 1


def _make_window(seed=0, two_plane=False):
    """K keyframes viewing a textured scene, exact points + depths.

    two_plane=True uses the two-depth scene — a single plane is degenerate
    for joint pose+depth refinement (plane-induced homography ambiguity),
    exactly like it is for essential-matrix estimation."""
    rng = np.random.default_rng(seed)
    T_cw_gt, pyrs, pts = [], [], []
    for k in range(K):
        xi = jnp.asarray(
            [0.05 * k, 0.02 * k, 0.01 * k, 0.004 * k, -0.006 * k, 0.008 * k],
            jnp.float32,
        )
        T = se3.exp(xi)
        if two_plane:
            img = render_two_plane_view(CAM, T)
            depth = two_plane_depth(CAM, T)
        else:
            img = render_plane_view(CAM, T, PLANE_Z)
            depth = plane_depth(CAM, T, PLANE_Z)
        pyr = build_pyramid(img, levels=3)
        p = topk_gradient_points(
            pyr.images[0], pyr.grad_mag[0], CAM, num_points=256,
            mono_z=1.0, block=4,
        )
        u = p.uv[:, 0].astype(jnp.int32).clip(0, CAM.width - 1)
        v = p.uv[:, 1].astype(jnp.int32).clip(0, CAM.height - 1)
        z = depth[v, u]
        ok = p.valid & (z > 0.1)
        if two_plane:
            # The gradient selector loves the x=0 depth seam, where depth is
            # ambiguous (bilinear mixes both planes) and small parallax
            # occludes the far surface — exclude a seam margin.
            X_c = CAM.unproject(p.uv, z)
            T_wc = se3.inverse(T)
            px_w = (se3.rotation(T_wc) @ X_c.T).T[:, 0] +                 se3.translation(T_wc)[0]
            ok = ok & (jnp.abs(px_w) > 0.25)
        p = p._replace(p3d=CAM.unproject(p.uv, z), valid=ok)
        T_cw_gt.append(T)
        pyrs.append(pyr)
        pts.append(p)
    return T_cw_gt, pyrs, pts, rng


def _pose_errs(T_est, T_gt, align_scale=False):
    """Gauge-aligned pose errors: express all poses relative to kf0.

    align_scale=True additionally removes the global monocular scale (free
    when inverse depths are optimized jointly — the textbook mono-BA gauge)
    by least-squares-fitting one scalar to the relative translations."""
    rel_est = [
        np.array(se3.compose(T_est[k], se3.inverse(T_est[0])))
        for k in range(K)
    ]
    rel_gt = [
        np.array(se3.compose(T_gt[k], se3.inverse(T_gt[0])))
        for k in range(K)
    ]
    if align_scale:
        te = np.concatenate([a[:3, 3] for a in rel_est])
        tg = np.concatenate([a[:3, 3] for a in rel_gt])
        s = float(te @ tg) / max(float(te @ te), 1e-12)
        for a in rel_est:
            a[:3, 3] *= s
    return [
        float(np.linalg.norm(np.asarray(se3.log(
            jnp.asarray(np.linalg.inv(a) @ b, jnp.float32)))))
        for a, b in zip(rel_est, rel_gt)
    ]


class TestPhotometricBA:
    def test_recovers_perturbed_poses(self):
        T_gt, pyrs, pts, rng = _make_window()
        T_noisy = [T_gt[0]] + [
            se3.compose(se3.exp(jnp.asarray(
                rng.normal(scale=0.01, size=6), jnp.float32)), T_gt[k])
            for k in range(1, K)
        ]
        prob = photo_ba_problem_from_keyframes(pyrs, T_noisy, pts, level=LEVEL)
        out = photometric_bundle_adjust(
            prob, CAM.scaled(LEVEL), max_iters=15, optimize_depths=False,
        )
        assert float(out.cost) < float(out.initial_cost) * 0.2, (
            float(out.cost), float(out.initial_cost))
        errs_before = _pose_errs(T_noisy, T_gt)
        errs_after = _pose_errs(list(out.T_cw), T_gt)
        assert max(errs_after) < 0.005, (errs_before, errs_after)

    def test_recovers_perturbed_depths_and_poses(self):
        T_gt, pyrs, pts, rng = _make_window(seed=1, two_plane=True)
        T_noisy = [T_gt[0]] + [
            se3.compose(se3.exp(jnp.asarray(
                rng.normal(scale=0.008, size=6), jnp.float32)), T_gt[k])
            for k in range(1, K)
        ]
        # Level 0: the sharpest photometric constraint for the joint problem.
        prob = photo_ba_problem_from_keyframes(pyrs, T_noisy, pts, level=0)
        # Multiplicative depth noise on every point.
        noise = jnp.asarray(
            rng.normal(scale=0.05, size=prob.inv_depth.shape), jnp.float32)
        prob = prob._replace(inv_depth=prob.inv_depth * (1.0 + noise))
        out = photometric_bundle_adjust(
            prob, CAM, max_iters=20, optimize_depths=True,
        )
        # With per-point free depths, individual absolute poses are only
        # weakly observable (depth can absorb pose error — the standard
        # mono-BA gauge/observability caveat); what the optimizer must
        # deliver: photometric consistency, no pose degradation on average,
        # and depths pulled back toward truth.
        assert float(out.cost) < float(out.initial_cost) * 0.1, (
            float(out.cost), float(out.initial_cost))
        errs_before = _pose_errs(T_noisy, T_gt, align_scale=True)
        errs_after = _pose_errs(list(out.T_cw), T_gt, align_scale=True)
        assert np.mean(errs_after) < np.mean(errs_before), (
            errs_before, errs_after)
        gt_prob = photo_ba_problem_from_keyframes(pyrs, T_noisy, pts, level=0)
        d_gt = np.asarray(gt_prob.inv_depth)
        valid = np.asarray(prob.valid)
        err_before = np.abs(np.asarray(prob.inv_depth) - d_gt)[valid].mean()
        err_after = np.abs(np.asarray(out.inv_depth) - d_gt)[valid].mean()
        assert err_after < err_before * 0.9, (err_before, err_after)

    def test_noop_at_ground_truth(self):
        T_gt, pyrs, pts, _ = _make_window(seed=2)
        prob = photo_ba_problem_from_keyframes(pyrs, T_gt, pts, level=LEVEL)
        # optimize_depths=False: with free depths even the ground-truth
        # optimum sits in a near-flat valley (interpolation noise moves the
        # iterate along weakly-observable directions — see the joint test);
        # the pose-only problem must be a strict no-op at truth.
        out = photometric_bundle_adjust(
            prob, CAM.scaled(LEVEL), max_iters=8, optimize_depths=False,
        )
        errs = _pose_errs(list(out.T_cw), T_gt)
        assert max(errs) < 1e-3, errs


class TestSystemPhotometricBA:
    def test_live_system_with_photometric_window_ba(self):
        """SlamSystem end-to-end with the direct window BA enabled: the
        trajectory must stay accurate (BA must not corrupt tracking)."""
        import numpy as np

        from uwslam_tpu.camera.calibration import Calibration
        from uwslam_tpu.config import (
            BAConfig,
            KeyframeConfig,
            SlamConfig,
            TrackerConfig,
        )
        from uwslam_tpu.io import ate_rmse
        from uwslam_tpu.system import SlamSystem

        calib = Calibration(
            raw=CAM, out_width=CAM.width, out_height=CAM.height
        )
        config = SlamConfig(
            tracker=TrackerConfig(
                pyramid_levels=3, track_levels=(2, 1, 0),
                mono_depth=2.0, num_points=256, point_block=4,
            ),
            keyframes=KeyframeConfig(min_gap=2, max_gap=4),
            use_ba=True,
            ba=BAConfig(photometric=True, max_iterations=8,
                        run_every_n_keyframes=2),
        )
        system = SlamSystem(calib, config)
        gt_wc = []
        for i in range(12):
            xi = jnp.asarray(
                [0.02 * i, 0.008 * i, 0.004 * i, 0.001 * i, -0.002 * i,
                 0.003 * i], jnp.float32)
            T = se3.exp(xi)
            img = np.asarray(render_plane_view(CAM, T, PLANE_Z))
            system.process_frame(img, timestamp=float(i))
            gt_wc.append(np.asarray(se3.inverse(T)))
        _, poses = system.export_trajectory()
        rmse = ate_rmse(poses[:, :3, 3], np.stack(gt_wc)[:, :3, 3])
        assert rmse < 0.02, rmse


class TestDistributedPhotometricBA:
    def test_matches_single_device(self):
        """Observer-sharded photometric BA over a 4-device mesh produces the
        same refinement as the single-device optimizer (up to float
        reduction order)."""
        import numpy as np
        from jax.sharding import Mesh

        from uwslam_tpu.parallel import PHOTO_AXIS, distributed_photometric_ba

        T_gt, pyrs, pts, rng = _make_window(seed=3)
        T_noisy = [T_gt[0]] + [
            se3.compose(se3.exp(jnp.asarray(
                rng.normal(scale=0.01, size=6), jnp.float32)), T_gt[k])
            for k in range(1, K)
        ]
        prob = photo_ba_problem_from_keyframes(pyrs, T_noisy, pts, level=LEVEL)
        single = photometric_bundle_adjust(
            prob, CAM.scaled(LEVEL), max_iters=10, optimize_depths=False,
        )
        mesh = Mesh(np.array(jax.devices()[:4]), (PHOTO_AXIS,))
        dist = distributed_photometric_ba(
            prob, CAM.scaled(LEVEL), mesh, max_iters=10,
            optimize_depths=False,
        )
        assert float(dist.cost) < float(dist.initial_cost) * 0.2
        np.testing.assert_allclose(
            np.asarray(dist.T_cw), np.asarray(single.T_cw),
            rtol=1e-3, atol=1e-4,
        )

    def test_joint_depths_on_mesh(self):
        import numpy as np
        from jax.sharding import Mesh

        from uwslam_tpu.parallel import PHOTO_AXIS, distributed_photometric_ba

        T_gt, pyrs, pts, rng = _make_window(seed=4, two_plane=True)
        prob = photo_ba_problem_from_keyframes(pyrs, T_gt, pts, level=0)
        noise = jnp.asarray(
            rng.normal(scale=0.04, size=prob.inv_depth.shape), jnp.float32)
        prob = prob._replace(inv_depth=prob.inv_depth * (1.0 + noise))
        mesh = Mesh(np.array(jax.devices()[:2]), (PHOTO_AXIS,))
        out = distributed_photometric_ba(
            prob, CAM, mesh, max_iters=15, optimize_depths=True,
        )
        assert float(out.cost) < float(out.initial_cost) * 0.2, (
            float(out.initial_cost), float(out.cost))
