"""Pose-graph optimization tests: drift correction with loop closures."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.ba.pose_graph import (
    add_loop_edge,
    edge_residuals,
    odometry_edges,
    optimize_pose_graph,
)
from uwslam_tpu.lie import se3


def circle_trajectory(n=12, radius=1.0):
    """Ground-truth poses around a circle, closing the loop."""
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        xi = jnp.asarray(
            [radius * np.cos(a), radius * np.sin(a), 0.0, 0.0, 0.0, a],
            jnp.float32,
        )
        poses.append(se3.exp(xi))
    return jnp.stack(poses)


class TestPoseGraph:
    def test_zero_residual_consistent_graph(self):
        T = circle_trajectory()
        g = odometry_edges(T)
        r = edge_residuals(g, jnp.zeros((T.shape[0], 6)))
        np.testing.assert_allclose(r, 0.0, atol=1e-4)

    def test_loop_closure_corrects_drift(self):
        T_gt = circle_trajectory()
        n = T_gt.shape[0]
        # Simulate accumulated odometry drift: perturb each consecutive
        # relative measurement is exact, but initial poses drift.
        key = jax.random.PRNGKey(0)
        noise = 0.05 * jax.random.normal(key, (n, 6))
        noise = noise.at[0].set(0.0)
        T_drift = jax.vmap(lambda T, d: se3.compose(T, se3.exp(d)))(T_gt, noise)
        g = odometry_edges(T_gt)          # edges = exact gt relatives
        g = g._replace(T_wc=T_drift)      # but nodes start drifted
        # Loop closure: node n-1 <-> node 0 with the exact relative pose.
        T_loop = se3.compose(se3.inverse(T_gt[n - 1]), T_gt[0])
        g = add_loop_edge(g, n - 1, 0, T_loop, weight=2.0)

        out = optimize_pose_graph(g, max_iters=40)
        assert float(out.cost) < float(out.initial_cost) * 1e-3
        for i in range(n):
            err = se3.log(se3.compose(se3.inverse(T_gt[i]), out.T_wc[i]))
            assert float(jnp.linalg.norm(err)) < 1e-2, f"node {i}"

    def test_gauge_anchor_fixed(self):
        T_gt = circle_trajectory(8)
        g = odometry_edges(T_gt)
        key = jax.random.PRNGKey(1)
        T_n = jax.vmap(lambda T, d: se3.compose(T, se3.exp(d)))(
            T_gt, 0.03 * jax.random.normal(key, (8, 6)).at[0].set(0.0)
        )
        g = g._replace(T_wc=T_n)
        out = optimize_pose_graph(g, max_iters=30)
        np.testing.assert_allclose(out.T_wc[0], T_n[0], atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
