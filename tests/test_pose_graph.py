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


class TestSim3PoseGraph:
    def test_scale_drift_corrected(self):
        """Monocular scale drift: odometry edges measured with a wrong scale
        drift; a Sim(3) loop edge carrying the true scale must pull both the
        poses and the per-node scales back (SE(3) PGO cannot absorb this)."""
        import numpy as np
        import jax.numpy as jnp
        from uwslam_tpu.ba import Sim3PoseGraph, optimize_pose_graph_sim3
        from uwslam_tpu.lie import sim3, se3

        n = 8
        # Ground truth: unit-scale poses out and back along x.
        gt = []
        for i in range(n):
            x = 0.5 * i if i < n // 2 else 0.5 * (n - 1 - i)
            T = np.eye(4, dtype=np.float32)
            T[0, 3] = x
            gt.append(T)
        # Odometry: each relative step measured with scale drift 1.08^k.
        S = [jnp.asarray(gt[0])]
        ei, ej, Sij, w, valid = [], [], [], [], []
        for k in range(n - 1):
            rel = np.linalg.inv(gt[k]) @ gt[k + 1]
            drift = 1.08 ** (k + 1)
            rel_drifted = sim3.from_rst(
                jnp.asarray(rel[:3, :3]), jnp.asarray(drift),
                jnp.asarray(rel[:3, 3] * drift),
            )
            S.append(sim3.compose(S[-1], rel_drifted))
            ei.append(k); ej.append(k + 1)
            Sij.append(np.asarray(rel_drifted))
            w.append(10.0); valid.append(True)
        # Loop edge 0 <-> last with TRUE relative Sim(3) (scale 1).
        rel_true = np.linalg.inv(gt[0]) @ gt[-1]
        ei.append(0); ej.append(n - 1)
        Sij.append(rel_true.astype(np.float32))
        w.append(100.0); valid.append(True)

        graph = Sim3PoseGraph(
            S_wc=jnp.stack(S),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            S_ij=jnp.asarray(np.stack(Sij)),
            weight=jnp.asarray(w),
            valid=jnp.asarray(valid),
        )
        out = optimize_pose_graph_sim3(graph, max_iters=40)
        assert float(out.cost) < 0.1 * float(out.initial_cost)
        # Last node must be back near the ground truth position and scale ~1.
        S_last = np.asarray(out.T_wc[-1])
        t_err = np.linalg.norm(S_last[:3, 3] - gt[-1][:3, 3])
        drift0 = np.asarray(sim3.scale(graph.S_wc[-1]))
        s_last = float(np.asarray(sim3.scale(out.T_wc[-1])))
        assert t_err < 0.2, t_err
        assert abs(s_last - 1.0) < 0.5 * abs(float(drift0) - 1.0), (
            drift0, s_last
        )
