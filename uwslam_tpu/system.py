"""SlamSystem — the pipeline orchestrator (reference System re-imagined).

Capability parity with /root/reference/src/System.cpp + src/main_uw_slam.cpp:
calibration load (:77-89), system init (:91-146), per-frame ingest
(AddFrame :225-262: grayscale + rectify + ROI crop + pyramid), per-frame
tracking (Tracking :193-223), keyframe bookkeeping (:264-278, functional
here), and trajectory output (Visualizer CSV, src/Visualizer.cpp:386-400).

TPU-first shape: the per-frame hot path is a handful of jitted programs
(pyramid build, point selection, coarse-to-fine LM track) operating on
device-resident arrays; host code only decodes images, makes keyframe
policy decisions, and logs trajectory rows.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .camera.calibration import Calibration
from .camera.model import (
    PinholeCamera,
    compute_roi,
    optimal_new_camera,
    remap_bilinear,
    undistort_map,
)
from .config import SlamConfig
from .image.pyramid import build_pyramid
from .lie import se3
from .map.keyframes import Keyframe, KeyframeDecision, KeyframeStore
from .tracking.photometric import track
from .tracking.points import TrackPoints, patch_points, topk_gradient_points
from .io.trajectory import write_trajectory_tum


@dataclass
class FrameState:
    """Per-frame results exposed to callers (diagnostics included)."""

    frame_id: int
    timestamp: float
    T_wc: np.ndarray          # world <- camera
    tracked_inliers: int
    track_error: float
    is_keyframe: bool


class SlamSystem:
    """Monocular (optionally RGB-D) direct SLAM pipeline."""

    def __init__(self, calibration: Calibration, config: SlamConfig | None = None):
        self.config = config or SlamConfig()
        self.calib = calibration

        raw = calibration.raw
        if calibration.needs_rectification:
            rect = optimal_new_camera(
                raw, calibration.out_width, calibration.out_height
            )
            self._rect_map = undistort_map(raw, rect)
            # ROI: valid pixels of the rectified image (reference CalculateROI,
            # src/System.cpp:148-191).
            m = np.asarray(self._rect_map)
            valid = (
                (m[..., 0] >= 0) & (m[..., 0] <= raw.width - 1)
                & (m[..., 1] >= 0) & (m[..., 1] <= raw.height - 1)
            )
            x0, y0, w, h = compute_roi(valid)
            self._roi = (x0, y0, w, h)
            self.cam = PinholeCamera(
                fx=rect.fx, fy=rect.fy,
                cx=rect.cx - x0, cy=rect.cy - y0,
                width=w, height=h,
            )
        else:
            self._rect_map = None
            # Crop to a multiple of 2^(levels-1) so pyramids divide evenly
            # (the reference requires even dims, src/System.cpp:81-89).
            div = 1 << (self.config.tracker.pyramid_levels - 1)
            w = raw.width - raw.width % div
            h = raw.height - raw.height % div
            self._roi = (0, 0, w, h)
            self.cam = PinholeCamera(
                fx=raw.fx, fy=raw.fy, cx=raw.cx, cy=raw.cy, width=w, height=h
            )

        self.keyframes = KeyframeStore(
            capacity=self.config.keyframes.window_size,
            decision=KeyframeDecision(
                min_inlier_ratio=self.config.keyframes.min_inlier_ratio,
                max_translation=self.config.keyframes.max_translation,
                max_rotation=self.config.keyframes.max_rotation,
                min_gap=self.config.keyframes.min_gap,
                max_gap=self.config.keyframes.max_gap,
            ),
        )

        self._prev = None           # (pyramid, points, depth) of previous frame
        self._prev_feats = None     # (Keypoints, descriptors) when use_features
        self._T_wc = jnp.eye(4)     # current world<-camera pose
        self._velocity = jnp.eye(4) # constant-velocity motion model T_prev<-cur
        self._frame_id = 0
        self.trajectory: list[FrameState] = []

    # ------------------------------------------------------------------ ingest

    def _ingest(self, image: np.ndarray) -> jax.Array:
        """Grayscale f32 -> rectified + cropped device image (AddFrame)."""
        img = jnp.asarray(image, jnp.float32)
        if self._rect_map is not None:
            img = remap_bilinear(img, self._rect_map)
        x0, y0, w, h = self._roi
        return jax.lax.dynamic_slice(img, (y0, x0), (h, w))

    def _select_points(self, pyr, depth_image):
        cfg = self.config.tracker
        return topk_gradient_points(
            pyr.images[0],
            pyr.grad_mag[0],
            self.cam,
            depth_image=depth_image,
            num_points=cfg.num_points,
            mono_z=cfg.mono_depth,
            block=cfg.point_block,
        )

    def _detect_features(self, pyr):
        """Feature front-end: multi-scale detection + descriptors
        (reference RobustMatcher detect stage, src/Tracker.cpp:187-223)."""
        from .features import describe, detect_multiscale

        fcfg = self.config.features
        kps = detect_multiscale(
            pyr.grad_x, pyr.grad_y,
            per_level=fcfg.per_level, levels=fcfg.detect_levels,
        )
        desc = describe(pyr.images, kps.uv, kps.level, kps.valid)
        return kps, desc

    def _feature_points(self, prev, cur, depth_image):
        """Match previous->current features (ratio+symmetry+RANSAC) and build
        patch points around the matched PREVIOUS keypoints — the reference's
        active pipeline (DetectAndTrackFeatures -> ObtainPatchesPoints,
        src/System.cpp:211-213). Returns (TrackPoints, n_matches)."""
        import jax.random as jrandom

        from .features import fundamental_ransac, match_descriptors

        (kp_a, desc_a), (kp_b, desc_b) = prev, cur
        fcfg = self.config.features
        m = match_descriptors(
            desc_a, desc_b, kp_a.valid, kp_b.valid, ratio=fcfg.ratio
        )
        uv_a = kp_a.uv[m.idx_a]
        uv_b = kp_b.uv[m.idx_b]
        res = fundamental_ransac(
            uv_a, uv_b, m.valid,
            jrandom.PRNGKey(self._frame_id),
            threshold=fcfg.ransac_threshold_px,
            num_hypotheses=fcfg.ransac_hypotheses,
            min_inliers=fcfg.min_matches,
        )
        good = m.valid & res.inliers
        n_matches = int(good.sum())
        pts = patch_points(
            self._prev[0].images[0],
            uv_a,
            good,
            self.cam,
            depth_image=depth_image,
            mono_z=self.config.tracker.mono_depth,
            patch_size=fcfg.patch_size,
            max_keypoints=fcfg.max_keypoints,
        )
        return pts, n_matches

    # ----------------------------------------------------------------- process

    def process_frame(
        self,
        image: np.ndarray,
        depth: np.ndarray | None = None,
        timestamp: float | None = None,
    ) -> FrameState:
        """Run the per-frame pipeline; returns the tracked camera pose."""
        cfg = self.config
        ts = float(timestamp) if timestamp is not None else float(self._frame_id)
        img = self._ingest(image)
        pyr = build_pyramid(img, levels=cfg.tracker.pyramid_levels)
        depth_dev = None
        if depth is not None:
            ddev = jnp.asarray(depth, jnp.float32)
            x0, y0, w, h = self._roi
            depth_dev = jax.lax.dynamic_slice(ddev, (y0, x0), (h, w))

        cur_feats = self._detect_features(pyr) if cfg.use_features else None

        if self._prev is None:
            pts = self._select_points(pyr, depth_dev)
            state = FrameState(
                frame_id=self._frame_id,
                timestamp=ts,
                T_wc=np.asarray(self._T_wc),
                tracked_inliers=int(pts.valid.sum()),
                track_error=0.0,
                is_keyframe=True,
            )
            kf = Keyframe(self._frame_id, ts, self._T_wc, pyr, pts)
            if cur_feats is not None:
                kf = kf._replace(
                    kp_uv=cur_feats[0].uv,
                    kp_desc=cur_feats[1],
                    kp_valid=cur_feats[0].valid,
                )
            self.keyframes.insert(kf)
            self._prev = (pyr, pts, depth_dev)
            self._prev_feats = cur_feats
        else:
            prev_pyr, prev_pts, prev_depth = self._prev
            if cfg.use_features and self._prev_feats is not None:
                # Reference active path: match features, patch points around
                # matched previous keypoints (src/System.cpp:211-213).
                feat_pts, n_matches = self._feature_points(
                    self._prev_feats, cur_feats, prev_depth
                )
                if n_matches >= self.config.features.min_matches:
                    prev_pts = feat_pts
            # Constant-velocity init: T_cur<-prev ~ last relative motion.
            T_init = self._velocity
            out = track(
                prev_pyr,
                pyr,
                prev_pts,
                self.cam,
                T_init=T_init,
                levels=cfg.tracker.track_levels,
                max_iters=cfg.tracker.max_iterations,
                weight_kind=cfg.tracker.weight_kind,
            )
            T_rel = out.T                     # cur <- prev
            self._velocity = T_rel
            self._T_wc = se3.normalize(
                se3.compose(self._T_wc, se3.inverse(T_rel))
            )
            inliers = int(out.inliers)
            capacity = int(prev_pts.valid.sum())
            ratio = inliers / max(capacity, 1)
            pts = self._select_points(pyr, depth_dev)
            is_kf = self.keyframes.should_insert(
                self._frame_id, self._T_wc, ratio
            )
            if is_kf:
                kf = Keyframe(self._frame_id, ts, self._T_wc, pyr, pts)
                if cur_feats is not None:
                    kf = kf._replace(
                        kp_uv=cur_feats[0].uv,
                        kp_desc=cur_feats[1],
                        kp_valid=cur_feats[0].valid,
                    )
                self.keyframes.insert(kf)
            state = FrameState(
                frame_id=self._frame_id,
                timestamp=ts,
                T_wc=np.asarray(self._T_wc),
                tracked_inliers=inliers,
                track_error=float(out.error),
                is_keyframe=is_kf,
            )
            self._prev = (pyr, pts, depth_dev)
            self._prev_feats = cur_feats

        self.trajectory.append(state)
        self._frame_id += 1
        return state

    # ------------------------------------------------------------------ export

    def export_trajectory(self, path: str | None = None):
        path = path or self.config.trajectory_csv
        ts = [s.timestamp for s in self.trajectory]
        poses = np.stack([s.T_wc for s in self.trajectory])
        if path:
            write_trajectory_tum(path, ts, poses)
        return np.asarray(ts), poses
