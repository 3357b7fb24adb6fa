"""Photometric tracker golden tests on synthetic plane scenes.

Known SE(3) motion rendered from a textured plane (SURVEY.md §4 test plan);
the tracker must recover the ground-truth relative pose.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.image import build_pyramid
from uwslam_tpu.lie import se3
from uwslam_tpu.tracking import (
    WeightKind,
    topk_gradient_points,
    track,
)
from uwslam_tpu.tracking.photometric import residuals_and_jacobian
from uwslam_tpu.utils.synthetic import plane_depth, render_plane_view

CAM = PinholeCamera(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)
PLANE_Z = 2.0


def make_pair(xi):
    """Render (ref, tgt) views: ref at identity, tgt at exp(xi) (cam<-world)."""
    T_ref = jnp.eye(4)
    T_tgt = se3.exp(jnp.asarray(xi, jnp.float32))
    ref = render_plane_view(CAM, T_ref, PLANE_Z)
    tgt = render_plane_view(CAM, T_tgt, PLANE_Z)
    return ref, tgt, T_tgt


def select_points(ref_img):
    pyr = build_pyramid(ref_img, levels=4)
    depth = plane_depth(CAM, jnp.eye(4), PLANE_Z)
    # depth in native units (no TUM factor): supply via p3d directly
    pts = topk_gradient_points(
        pyr.images[0], pyr.grad_mag[0], CAM, depth_image=None,
        num_points=512, mono_z=1.0, block=4,
    )
    # Replace the mono z=1 with the exact plane depth at each uv.
    u = pts.uv[:, 0].astype(jnp.int32).clip(0, CAM.width - 1)
    v = pts.uv[:, 1].astype(jnp.int32).clip(0, CAM.height - 1)
    z = depth[v, u]
    p3d = CAM.unproject(pts.uv, z)
    return pyr, pts._replace(p3d=p3d)


class TestResidualJacobian:
    def test_zero_at_identity_motion(self):
        ref, tgt, _ = make_pair(np.zeros(6))
        pyr, pts = select_points(ref)
        tpyr = build_pyramid(tgt, levels=4)
        r, J, valid = residuals_and_jacobian(
            jnp.eye(4), pts, pts.intensity, tpyr.images[0],
            tpyr.grad_x[0], tpyr.grad_y[0], CAM,
        )
        assert int(valid.sum()) > 400
        assert float(jnp.abs(r[valid]).max()) < 1e-2

    def test_jacobian_matches_finite_difference(self):
        ref, tgt, T_gt = make_pair([0.01, -0.005, 0.004, 0.002, -0.003, 0.001])
        pyr, pts = select_points(ref)
        tpyr = build_pyramid(tgt, levels=4)

        def res(T):
            r, _, valid = residuals_and_jacobian(
                T, pts, pts.intensity, tpyr.images[0],
                tpyr.grad_x[0], tpyr.grad_y[0], CAM,
            )
            return r, valid

        T0 = jnp.eye(4)
        r0, J, valid = residuals_and_jacobian(
            T0, pts, pts.intensity, tpyr.images[0],
            tpyr.grad_x[0], tpyr.grad_y[0], CAM,
        )
        eps = 1e-4
        for k in range(6):
            d = jnp.zeros(6).at[k].set(eps)
            rp, vp = res(se3.compose(T0, se3.exp(d)))
            rm, vm = res(se3.compose(T0, se3.exp(-d)))
            fd = (rp - rm) / (2 * eps)
            m = valid & vp & vm
            # Compare where all valid; bilinear interp is piecewise-linear so
            # tolerate a few percent of mismatching points at cell boundaries.
            err = np.abs(np.asarray(fd - J[:, k]))[np.asarray(m)]
            scale = max(1.0, float(jnp.abs(J[:, k]).max()))
            assert np.quantile(err, 0.9) < 0.05 * scale, f"col {k}"


class TestTracking:
    def check_recovery(self, xi, atol_t=2e-3, atol_r=2e-3):
        ref, tgt, T_gt = make_pair(xi)
        pyr, pts = select_points(ref)
        tpyr = build_pyramid(tgt, levels=4)
        out = track(pyr, tpyr, pts, CAM, levels=(2, 1, 0), max_iters=15)
        T_est = out.T
        err = se3.log(se3.compose(se3.inverse(T_gt), T_est))
        t_err = float(jnp.linalg.norm(err[:3]))
        r_err = float(jnp.linalg.norm(err[3:]))
        assert t_err < atol_t, f"translation error {t_err}"
        assert r_err < atol_r, f"rotation error {r_err}"
        return out

    def test_small_translation(self):
        self.check_recovery([0.02, 0.0, 0.0, 0.0, 0.0, 0.0])

    def test_small_rotation(self):
        self.check_recovery([0.0, 0.0, 0.0, 0.0, 0.0, 0.02])

    def test_general_motion(self):
        self.check_recovery([0.03, -0.02, 0.01, 0.01, -0.008, 0.015])

    def test_larger_motion_coarse_to_fine(self):
        self.check_recovery(
            [0.08, 0.05, -0.04, 0.02, 0.03, -0.02], atol_t=5e-3, atol_r=5e-3
        )

    def test_tukey_weights(self):
        ref, tgt, T_gt = make_pair([0.02, 0.01, 0.0, 0.0, 0.0, 0.01])
        pyr, pts = select_points(ref)
        # Corrupt 10% of target pixels to test robustness.
        rng = np.random.default_rng(1)
        tgt_np = np.array(tgt)  # writable copy
        mask = rng.random(tgt_np.shape) < 0.05
        tgt_np[mask] = rng.uniform(0, 255, mask.sum())
        tpyr = build_pyramid(jnp.asarray(tgt_np), levels=4)
        out = track(
            pyr, tpyr, pts, CAM, levels=(2, 1, 0), max_iters=15,
            weight_kind=WeightKind.TUKEY,
        )
        err = se3.log(se3.compose(se3.inverse(T_gt), out.T))
        assert float(jnp.linalg.norm(err[:3])) < 2e-2
        assert float(jnp.linalg.norm(err[3:])) < 2e-2


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


class TestDensePoints:
    def test_dense_mode_tracks(self):
        """ObtainAllPoints parity: dense (strided) point selection tracks a
        synthetic pair as accurately as semi-dense."""
        import numpy as np
        from uwslam_tpu.tracking.points import dense_points
        from uwslam_tpu.tracking import track
        from uwslam_tpu.image import build_pyramid
        from uwslam_tpu.utils.synthetic import render_plane_view
        from uwslam_tpu.lie import se3
        from uwslam_tpu.camera import PinholeCamera
        import jax.numpy as jnp

        cam = PinholeCamera(fx=120.0, fy=120.0, cx=79.5, cy=59.5,
                            width=160, height=120)
        T_gt = se3.exp(jnp.asarray([0.02, -0.01, 0.005, 0.004, -0.003, 0.008]))
        ref = render_plane_view(cam, jnp.eye(4), 2.0)
        tgt = render_plane_view(cam, T_gt, 2.0)
        ref_pyr = build_pyramid(ref, levels=4)
        tgt_pyr = build_pyramid(tgt, levels=4)
        pts = dense_points(ref_pyr.images[0], cam, mono_z=2.0, stride=2)
        assert int(pts.valid.sum()) > 3000
        out = track(ref_pyr, tgt_pyr, pts, cam, levels=(2, 1, 0), max_iters=10)
        err = np.asarray(se3.log(se3.compose(se3.inverse(out.T), T_gt)))
        assert np.linalg.norm(err) < 1e-3, err


class TestInverseCompositional:
    def test_ic_matches_fc_accuracy(self):
        """IC (constant reference-side Jacobian) must converge to the same
        pose as FC on a synthetic pair."""
        import numpy as np
        import jax.numpy as jnp
        from uwslam_tpu.camera import PinholeCamera
        from uwslam_tpu.image import build_pyramid
        from uwslam_tpu.lie import se3
        from uwslam_tpu.tracking import track, topk_gradient_points
        from uwslam_tpu.utils.synthetic import plane_depth, render_plane_view

        cam = PinholeCamera(fx=120.0, fy=120.0, cx=79.5, cy=59.5,
                            width=160, height=120)
        T_gt = se3.exp(jnp.asarray([0.02, -0.01, 0.005, 0.004, -0.003, 0.008]))
        ref = render_plane_view(cam, jnp.eye(4), 2.0)
        tgt = render_plane_view(cam, T_gt, 2.0)
        rp = build_pyramid(ref, levels=4)
        tp = build_pyramid(tgt, levels=4)
        depth = plane_depth(cam, jnp.eye(4), 2.0)
        pts = topk_gradient_points(rp.images[0], rp.grad_mag[0], cam,
                                   num_points=512)
        u = pts.uv[:, 0].astype(jnp.int32).clip(0, 159)
        v = pts.uv[:, 1].astype(jnp.int32).clip(0, 119)
        pts = pts._replace(p3d=cam.unproject(pts.uv, depth[v, u]))
        for mode in ("fc", "ic"):
            out = track(rp, tp, pts, cam, levels=(2, 1, 0), max_iters=10,
                        mode=mode)
            err = np.asarray(se3.log(se3.compose(se3.inverse(out.T), T_gt)))
            assert np.linalg.norm(err) < 5e-4, (mode, err)


class TestCholeskySolve6:
    def test_matches_linalg_solve(self):
        import numpy as np

        from uwslam_tpu.tracking.photometric import _cholesky_solve6

        rng = np.random.default_rng(0)
        A = rng.normal(size=(32, 6, 6)).astype(np.float32)
        A = A @ np.swapaxes(A, -1, -2) + 6 * np.eye(6, dtype=np.float32)
        b = rng.normal(size=(32, 6)).astype(np.float32)
        x = np.asarray(_cholesky_solve6(jnp.asarray(A), jnp.asarray(b)))
        x_ref = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(x, x_ref, rtol=2e-4, atol=2e-4)


class TestAffineBrightness:
    """DSO-style affine brightness compensation: I_tgt = (1+a) I_ref + b."""

    @pytest.mark.parametrize("mode", ["fc", "ic"])
    def test_recovers_pose_and_brightness(self, mode):
        xi = [0.02, -0.01, 0.008, 0.004, -0.003, 0.006]
        ref, tgt, T_gt = make_pair(xi)
        # Target with a strong brightness violation (underwater lighting).
        tgt_bright = jnp.clip(1.25 * tgt + 12.0, 0.0, 255.0)
        pyr, pts = select_points(ref)
        tpyr = build_pyramid(tgt_bright, levels=4)

        out_aff = track(
            pyr, tpyr, pts, CAM, levels=(2, 1, 0), max_iters=15,
            mode=mode, affine=True,
        )
        err_aff = float(jnp.linalg.norm(
            se3.log(se3.compose(se3.inverse(T_gt), out_aff.T))
        ))
        out_plain = track(
            pyr, tpyr, pts, CAM, levels=(2, 1, 0), max_iters=15, mode=mode,
        )
        err_plain = float(jnp.linalg.norm(
            se3.log(se3.compose(se3.inverse(T_gt), out_plain.T))
        ))
        assert err_aff < 0.01, f"{mode}: affine pose err {err_aff}"
        assert err_aff < err_plain, (
            f"{mode}: affine ({err_aff}) should beat plain ({err_plain}) "
            f"under a brightness change"
        )
        a, b = float(out_aff.affine[0]), float(out_aff.affine[1])
        # Saturation clips some pixels; accept the gain/offset loosely.
        assert 0.15 < a < 0.35, a
        assert 5.0 < b < 20.0, b

    def test_identity_without_brightness_change(self):
        """With no brightness violation the estimate should stay near 0."""
        xi = [0.015, -0.008, 0.004, 0.002, -0.002, 0.004]
        ref, tgt, T_gt = make_pair(xi)
        pyr, pts = select_points(ref)
        tpyr = build_pyramid(tgt, levels=4)
        out = track(
            pyr, tpyr, pts, CAM, levels=(2, 1, 0), max_iters=15,
            mode="ic", affine=True,
        )
        err = float(jnp.linalg.norm(
            se3.log(se3.compose(se3.inverse(T_gt), out.T))
        ))
        assert err < 0.01, err
        assert abs(float(out.affine[0])) < 0.05
        assert abs(float(out.affine[1])) < 3.0
