"""TrackGraph: union-find track building + landmark initialization policy.

Covers the global-BA problem builder (map.tracks) directly: the multi-view
DLT-vs-seed candidate scoring must pick triangulation when the pose chain is
good and fall back to the seed lift when the chain has drifted (the policy
that made BASELINE config 5's end-of-run global BA strictly improve the
loop-closed trajectory in round 3 — see RESULTS_r03).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from uwslam_tpu.camera import PinholeCamera  # noqa: E402
from uwslam_tpu.lie import se3  # noqa: E402
from uwslam_tpu.map.tracks import TrackGraph  # noqa: E402

CAM = PinholeCamera(fx=300.0, fy=300.0, cx=159.5, cy=119.5,
                    width=320, height=240)


def _make_scene(n_kf=5, n_pts=40, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-1.0, 1.0, n_pts),
        rng.uniform(-0.8, 0.8, n_pts),
        rng.uniform(2.0, 4.0, n_pts),
    ], axis=-1).astype(np.float64)
    T_cw = []
    for i in range(n_kf):
        xi = jnp.asarray([0.15 * i, 0.02 * i, 0.0, 0.0, 0.02 * i, 0.0])
        T_cw.append(np.asarray(se3.exp(xi), np.float64))
    return pts, np.stack(T_cw)


def _project(T, X):
    pc = T[:3, :3] @ X + T[:3, 3]
    return np.array([CAM.fx * pc[0] / pc[2] + CAM.cx,
                     CAM.fy * pc[1] / pc[2] + CAM.cy]), pc[2]


def _graph_from_scene(pts, T_cw):
    """Chain every point through consecutive keyframe 'matches'."""
    g = TrackGraph()
    n_kf = len(T_cw)
    n_pts = len(pts)
    for b in range(1, n_kf):
        a = b - 1
        uv_a = np.stack([_project(T_cw[a], X)[0] for X in pts])
        uv_b = np.stack([_project(T_cw[b], X)[0] for X in pts])
        idx = np.arange(n_pts)
        g.add_keyframe_matches(a, b, idx, idx, uv_a, uv_b,
                               np.ones(n_pts, bool))
    return g


class TestTrackBuilding:
    def test_tracks_span_all_keyframes(self):
        pts, T_cw = _make_scene()
        g = _graph_from_scene(pts, T_cw)
        assert len(g.tracks) == len(pts)
        assert all(len(t.obs) == len(T_cw) for t in g.tracks.values())

    def test_skip_pair_matches_merge_into_same_track(self):
        pts, T_cw = _make_scene(n_kf=3)
        g = _graph_from_scene(pts, T_cw)
        # Extra skip-pair (kf0 -> kf2) matches must extend existing tracks,
        # not open duplicates.
        uv_a = np.stack([_project(T_cw[0], X)[0] for X in pts])
        uv_c = np.stack([_project(T_cw[2], X)[0] for X in pts])
        idx = np.arange(len(pts))
        g.add_keyframe_matches(0, 2, idx, idx, uv_a, uv_c,
                               np.ones(len(pts), bool))
        assert len(g.tracks) == len(pts)


class TestLandmarkInit:
    def test_triangulation_beats_corrupted_seed_under_good_poses(self):
        """With an exact pose chain, multi-view DLT must win over a seed
        whose depths are 30% off, recovering near-exact landmarks."""
        pts, T_cw = _make_scene()
        g = _graph_from_scene(pts, T_cw)
        # Seeds: keyframe-0 camera-frame points with corrupted depth.
        p3d_c0 = np.stack([
            T_cw[0][:3, :3] @ X + T_cw[0][:3, 3] for X in pts
        ]) * np.array([1.0, 1.0, 1.3])
        seed = {0: (p3d_c0.astype(np.float32), np.ones(len(pts), bool))}
        built = g.build_problem(
            list(range(len(T_cw))), T_cw.astype(np.float32), CAM,
            max_landmarks=64, max_obs=512, min_views=2,
            obs_gate_px=30.0, seed_p3d=seed,
        )
        assert built is not None
        problem, order = built
        est = np.asarray(problem.points)[: len(order)]
        # Triangulated landmarks match ground truth to sub-mm; the corrupted
        # seed would sit ~0.9 units off in depth.
        errs = []
        for slot, tid in enumerate(order):
            errs.append(np.linalg.norm(est[slot] - pts[tid]))
        assert np.median(errs) < 1e-2

    def test_seed_survives_drifted_poses(self):
        """With a badly drifted pose chain, triangulation reprojects poorly
        and the builder must keep seed-lifted landmarks instead (>= 2 sane
        views per landmark under the per-observation gate)."""
        pts, T_cw = _make_scene()
        g = _graph_from_scene(pts, T_cw)
        p3d_c0 = np.stack([
            T_cw[0][:3, :3] @ X + T_cw[0][:3, 3] for X in pts
        ])
        seed = {0: (p3d_c0.astype(np.float32), np.ones(len(pts), bool))}
        # Corrupt every pose after the first by a large rotation drift.
        T_bad = T_cw.copy()
        for i in range(1, len(T_bad)):
            xi = jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.08 * i, 0.0])
            T_bad[i] = np.asarray(se3.compose(se3.exp(xi), jnp.asarray(T_bad[i])))
        built = g.build_problem(
            list(range(len(T_bad))), T_bad.astype(np.float32), CAM,
            max_landmarks=64, max_obs=512, min_views=2,
            obs_gate_px=40.0, seed_p3d=seed,
        )
        assert built is not None
        problem, order = built
        assert len(order) >= 8  # the problem still forms from seeds
