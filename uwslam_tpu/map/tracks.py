"""Feature-track graph across keyframes — observations for windowed BA.

The reference never builds landmark tracks (its Map is a dead stub,
src/Map.cpp:33-45). This host-side structure chains descriptor matches
between consecutive keyframes into multi-view tracks and emits a
fixed-capacity BAProblem:

- match(kf_prev, kf_new) pairs extend existing tracks or open new ones;
- tracks with >= 2 observations become landmarks, initialized by linear
  triangulation from their first and last view;
- the BAProblem is padded to static (L, O) capacities for jit.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..ba.schur import BAProblem
from ..camera.model import PinholeCamera
from ..lie import se3


@dataclass
class Track:
    obs: list  # list[(kf_window_pos_at_add_time, kf_id, uv np(2,))]
    last_kp_index: int  # keypoint slot in the newest keyframe it reaches
    last_kf_id: int


@dataclass
class TrackGraph:
    max_tracks: int = 4096
    tracks: dict = field(default_factory=dict)
    _next_id: int = 0
    # keypoint-slot -> track-id mapping for the latest keyframe
    _tail: dict = field(default_factory=dict)

    def add_keyframe_matches(
        self,
        kf_id_prev: int,
        kf_id_new: int,
        idx_prev: np.ndarray,
        idx_new: np.ndarray,
        uv_prev: np.ndarray,
        uv_new: np.ndarray,
        valid: np.ndarray,
    ) -> None:
        """Extend tracks with matches (prev-kf keypoint i -> new-kf keypoint j)."""
        new_tail: dict = {}
        for a, b, ua, ub, ok in zip(
            idx_prev, idx_new, uv_prev, uv_new, valid
        ):
            if not ok:
                continue
            a = int(a); b = int(b)
            tid = self._tail.get(a)
            if tid is None:
                tid = self._next_id
                self._next_id += 1
                self.tracks[tid] = Track(
                    obs=[(kf_id_prev, np.asarray(ua, np.float64))],
                    last_kp_index=a,
                    last_kf_id=kf_id_prev,
                )
            tr = self.tracks[tid]
            tr.obs.append((kf_id_new, np.asarray(ub, np.float64)))
            tr.last_kp_index = b
            tr.last_kf_id = kf_id_new
            new_tail[b] = tid
        self._tail = new_tail
        # Cap memory: drop oldest finished tracks beyond capacity.
        if len(self.tracks) > self.max_tracks:
            active = set(new_tail.values())
            for tid in sorted(self.tracks.keys()):
                if len(self.tracks) <= self.max_tracks:
                    break
                if tid not in active:
                    del self.tracks[tid]

    def prune_outside_window(self, kf_ids_in_window: set) -> None:
        dead = [
            tid
            for tid, tr in self.tracks.items()
            if not any(k in kf_ids_in_window for k, _ in tr.obs)
        ]
        for tid in dead:
            del self.tracks[tid]

    def build_problem(
        self,
        kf_ids: list[int],
        T_cw: np.ndarray,
        cam: PinholeCamera,
        max_landmarks: int = 1024,
        max_obs: int = 8192,
        min_views: int = 3,
        max_init_reproj_px: float = 4.0,
    ) -> tuple[BAProblem, list[int]] | None:
        """Emit a fixed-capacity BAProblem over the window keyframes.

        kf_ids: ordered keyframe ids in the window; T_cw their current poses
        (camera-from-world). Returns (problem, track_ids in landmark order)
        or None if too few tracks."""
        import jax.numpy as jnp

        kf_pos = {k: i for i, k in enumerate(kf_ids)}
        sel = []
        for tid, tr in self.tracks.items():
            views = [(kf_pos[k], uv) for k, uv in tr.obs if k in kf_pos]
            if len(views) >= min_views:
                sel.append((tid, views))
        if len(sel) < 8:
            return None
        sel = sel[:max_landmarks]

        # Triangulate each track from its first/last view.
        pts = np.zeros((max_landmarks, 3), np.float32)
        obs_kf = np.zeros(max_obs, np.int32)
        obs_lm = np.zeros(max_obs, np.int32)
        obs_uv = np.zeros((max_obs, 2), np.float32)
        obs_valid = np.zeros(max_obs, bool)
        o = 0
        track_order = []
        T_wc = np.stack([np.asarray(se3.inverse(jnp.asarray(t))) for t in T_cw])
        for l, (tid, views) in enumerate(sel):
            (ia, uva), (ib, uvb) = views[0], views[-1]
            X = _triangulate_np(T_cw[ia], T_cw[ib], uva, uvb, cam)
            pts[l] = np.where(np.isfinite(X), X, 0.0)
            track_order.append(tid)
            # Sanity-gate the landmark: finite, in front of every view, and
            # consistent with the initial poses (small-baseline two-view
            # triangulations can be wildly wrong — they must not steer BA).
            ok = bool(np.isfinite(X).all())
            if ok:
                for pos, uv in views:
                    pc = T_cw[pos][:3, :3] @ X + T_cw[pos][:3, 3]
                    if pc[2] < 1e-3:
                        ok = False
                        break
                    pu = cam.fx * pc[0] / pc[2] + cam.cx
                    pv = cam.fy * pc[1] / pc[2] + cam.cy
                    if np.hypot(pu - uv[0], pv - uv[1]) > max_init_reproj_px:
                        ok = False
                        break
            for pos, uv in views:
                if o >= max_obs:
                    break
                obs_kf[o] = pos
                obs_lm[o] = l
                obs_uv[o] = uv
                obs_valid[o] = ok
                o += 1
        problem = BAProblem(
            T_cw=jnp.asarray(T_cw),
            points=jnp.asarray(pts),
            obs_kf=jnp.asarray(obs_kf),
            obs_lm=jnp.asarray(obs_lm),
            obs_uv=jnp.asarray(obs_uv),
            obs_valid=jnp.asarray(obs_valid),
        )
        return problem, track_order


def _triangulate_np(
    T_cw_a: np.ndarray, T_cw_b: np.ndarray, uv_a, uv_b, cam: PinholeCamera
) -> np.ndarray:
    """Host-side linear triangulation in normalized coords."""
    xa = np.array(
        [(uv_a[0] - cam.cx) / cam.fx, (uv_a[1] - cam.cy) / cam.fy]
    )
    xb = np.array(
        [(uv_b[0] - cam.cx) / cam.fx, (uv_b[1] - cam.cy) / cam.fy]
    )
    Pa = np.asarray(T_cw_a)[:3, :]
    Pb = np.asarray(T_cw_b)[:3, :]
    A = np.stack(
        [
            xa[0] * Pa[2] - Pa[0],
            xa[1] * Pa[2] - Pa[1],
            xb[0] * Pb[2] - Pb[0],
            xb[1] * Pb[2] - Pb[1],
        ]
    )
    _, _, Vt = np.linalg.svd(A)
    X = Vt[-1]
    if abs(X[3]) < 1e-12:
        return np.full(3, np.nan, np.float32)
    return (X[:3] / X[3]).astype(np.float32)
