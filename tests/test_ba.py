"""Bundle adjustment tests: synthetic multi-view problems with exact optima."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.ba import BAProblem, bundle_adjust, reproject_residuals
from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.lie import se3

CAM = PinholeCamera(fx=300.0, fy=300.0, cx=159.5, cy=119.5, width=320, height=240)


def make_problem(key, num_kf=5, num_lm=128, noise_px=0.0, pose_noise=0.0,
                 point_noise=0.0):
    """Ground-truth scene: landmarks in a box in front of a slowly moving cam."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    pts_gt = jnp.stack(
        [
            jax.random.uniform(k1, (num_lm,), minval=-1.5, maxval=1.5),
            jax.random.uniform(k2, (num_lm,), minval=-1.0, maxval=1.0),
            jax.random.uniform(k3, (num_lm,), minval=3.0, maxval=6.0),
        ],
        axis=-1,
    )
    xs = jnp.linspace(0, 0.4, num_kf)
    T_gt = jnp.stack(
        [
            se3.exp(jnp.array([x, 0.02 * i, 0.01 * i, 0.0, 0.01 * i, 0.0]))
            for i, x in enumerate(xs)
        ]
    )
    # Fully-connected observations.
    kf_idx = jnp.repeat(jnp.arange(num_kf), num_lm).astype(jnp.int32)
    lm_idx = jnp.tile(jnp.arange(num_lm), num_kf).astype(jnp.int32)
    p_c = se3.apply(T_gt[kf_idx], pts_gt[lm_idx])
    uv = CAM.project(p_c)
    uv = uv + noise_px * jax.random.normal(k4, uv.shape)
    inb = (
        (uv[:, 0] >= 0) & (uv[:, 0] <= CAM.width - 1)
        & (uv[:, 1] >= 0) & (uv[:, 1] <= CAM.height - 1)
        & (p_c[:, 2] > 0.1)
    )
    # Perturb initial state.
    kp, kq = jax.random.split(k5)
    dT = pose_noise * jax.random.normal(kp, (num_kf, 6))
    dT = dT.at[0].set(0.0)  # keep gauge anchor exact
    T_init = jax.vmap(lambda T, d: se3.compose(se3.exp(d), T))(T_gt, dT)
    pts_init = pts_gt + point_noise * jax.random.normal(kq, pts_gt.shape)
    problem = BAProblem(
        T_cw=T_init,
        points=pts_init,
        obs_kf=kf_idx,
        obs_lm=lm_idx,
        obs_uv=uv,
        obs_valid=inb,
    )
    return problem, T_gt, pts_gt


class TestBA:
    def test_zero_residual_at_ground_truth(self):
        problem, T_gt, pts_gt = make_problem(jax.random.PRNGKey(0))
        r, valid = reproject_residuals(
            problem._replace(T_cw=T_gt, points=pts_gt), CAM
        )
        assert float(jnp.abs(r).max()) < 1e-3
        assert int(valid.sum()) > 400

    def test_recovers_from_perturbation(self):
        problem, T_gt, pts_gt = make_problem(
            jax.random.PRNGKey(1), pose_noise=0.02, point_noise=0.05
        )
        out = bundle_adjust(problem, CAM, max_iters=25)
        assert float(out.cost) < float(out.initial_cost) * 1e-3
        # Pose error vs ground truth (gauge = first pose fixed at its init,
        # which equals gt).
        for i in range(T_gt.shape[0]):
            err = se3.log(se3.compose(se3.inverse(T_gt[i]), out.T_cw[i]))
            assert float(jnp.linalg.norm(err)) < 5e-3, f"kf {i}"

    def test_noisy_observations_converge(self):
        problem, T_gt, pts_gt = make_problem(
            jax.random.PRNGKey(2), noise_px=0.5, pose_noise=0.01,
            point_noise=0.02,
        )
        out = bundle_adjust(problem, CAM, max_iters=25)
        # Final mean Huber cost should be at the noise floor (~0.5 px)^2/2.
        assert float(out.cost) < 0.5
        for i in range(T_gt.shape[0]):
            err = se3.log(se3.compose(se3.inverse(T_gt[i]), out.T_cw[i]))
            assert float(jnp.linalg.norm(err)) < 2e-2, f"kf {i}"

    def test_robust_to_outliers(self):
        problem, T_gt, pts_gt = make_problem(
            jax.random.PRNGKey(3), noise_px=0.3, pose_noise=0.01,
            point_noise=0.02,
        )
        # Corrupt 8% of observations with gross errors.
        key = jax.random.PRNGKey(99)
        k1, k2 = jax.random.split(key)
        n_obs = problem.obs_uv.shape[0]
        outlier = jax.random.uniform(k1, (n_obs,)) < 0.08
        bad_uv = problem.obs_uv + jnp.where(
            outlier[:, None], 40.0 * jax.random.normal(k2, (n_obs, 2)), 0.0
        )
        problem = problem._replace(obs_uv=bad_uv)
        out = bundle_adjust(problem, CAM, max_iters=30)
        # Monocular BA with one gauge-fixed pose leaves global scale free:
        # evaluate with Sim3-aligned ATE over camera centers.
        from uwslam_tpu.io import ate_rmse

        centers_est = np.asarray(se3.translation(se3.inverse(out.T_cw)))
        centers_gt = np.asarray(se3.translation(se3.inverse(T_gt)))
        assert ate_rmse(centers_est, centers_gt) < 1e-2


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
