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
    """Per-frame results exposed to callers (diagnostics included).

    Poses are additionally recorded RELATIVE to the frame's reference
    keyframe so that window-BA refinements of keyframe poses retroactively
    improve the exported trajectory (export recomposes ref_kf pose @
    T_kf_frame)."""

    frame_id: int
    timestamp: float
    T_wc: np.ndarray          # world <- camera (as tracked live)
    tracked_inliers: int
    track_error: float
    is_keyframe: bool
    ref_kf_id: int = -1
    T_kf_frame: np.ndarray | None = None   # ref-kf <- frame
    status: str = "ok"        # "ok" | "lost" | "relocalized"


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
        from .map.tracks import TrackGraph

        self._tracks = TrackGraph()  # feature tracks across keyframes (BA)
        self._loops = None           # LoopCloser (lazy, use_loop_closure)
        if self.config.use_loop_closure:
            from dataclasses import asdict

            from .map.loop_closure import LoopCloser, LoopConfig

            self._loops = LoopCloser(
                cam=self.cam, config=LoopConfig(**asdict(self.config.loop))
            )
        self._kf_since_ba = 0
        self._kf_poses: dict[int, np.ndarray] = {}  # latest refined kf poses
        self._T_wc = jnp.eye(4)     # current world<-camera pose
        self._velocity = jnp.eye(4) # constant-velocity motion model T_prev<-cur
        self._frame_id = 0
        self.trajectory: list[FrameState] = []
        from .utils.profiling import StageTimer

        # sync=True fences the device per stage — accurate breakdowns, but
        # only when profiling is requested (fencing costs throughput).
        self.timers = StageTimer(sync=self.config.profile)

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
        if cfg.point_mode == "dense":
            from .tracking.points import dense_points

            return dense_points(
                pyr.images[0], self.cam,
                depth_image=depth_image,
                mono_z=cfg.mono_depth,
                stride=cfg.dense_stride,
            )
        return topk_gradient_points(
            pyr.images[0],
            pyr.grad_mag[0],
            self.cam,
            depth_image=depth_image,
            num_points=cfg.num_points,
            mono_z=cfg.mono_depth,
            block=cfg.point_block,
        )

    def _make_keyframe(self, ts, pyr, pts, cur_feats, depth_dev) -> Keyframe:
        """Build a keyframe; attaches feature keypoints (+ their camera-frame
        3D via depth or mono_z) so later frames can relocalize with PnP."""
        kf = Keyframe(self._frame_id, ts, self._T_wc, pyr, pts)
        if cur_feats is None and self.config.use_reloc:
            cur_feats = self._detect_features(pyr)
        if cur_feats is not None:
            from .tracking.points import _depth_at

            kps, desc = cur_feats
            depth, depth_ok = _depth_at(
                depth_dev, kps.uv, self.config.tracker.mono_depth
            )
            kf = kf._replace(
                kp_uv=kps.uv,
                kp_desc=desc,
                # Keypoints over depth holes would carry the mono fallback
                # depth — wrong 3D that poisons PnP; mask them out.
                kp_valid=kps.valid & depth_ok,
                kp_p3d=self.cam.unproject(kps.uv, depth),
            )
        return kf

    def _on_new_keyframe(self, kf) -> None:
        """Loop-closure hook: record the keyframe, try to close a loop, and
        on success propagate the pose-graph correction to the keyframe
        window, the exported trajectory, and the live pose."""
        if self._loops is None or kf.kp_desc is None:
            return
        self._loops.add_keyframe(kf)
        if self._loops.detect() is None:
            return
        corrected = self._loops.optimize()
        if not corrected:
            return
        for fid, T in corrected.items():
            self._kf_poses[fid] = T
        kfs = self.keyframes.keyframes
        last_old = np.asarray(kfs[-1].T_wc)
        for i, k in enumerate(kfs):
            Tn = corrected.get(k.frame_id)
            if Tn is not None:
                kfs[i] = k._replace(T_wc=jnp.asarray(Tn))
        last_new = corrected.get(kfs[-1].frame_id)
        if last_new is not None:
            corr = jnp.asarray(last_new) @ se3.inverse(jnp.asarray(last_old))
            self._T_wc = se3.normalize(se3.compose(corr, self._T_wc))

    def _relocalize(self, cur_feats, pyr):
        """Try PnP against the most recent keyframes (newest first).

        Returns (T_wc, kf_id, cur_feats) on success, None otherwise — the
        detected features are returned so the caller can reuse them instead
        of re-running the front-end. The reference has no equivalent —
        tracking failure goes undetected (SURVEY.md §5)."""
        import jax.random as jrandom

        from .features import match_descriptors, pnp_from_pixels

        rcfg = self.config.reloc
        if cur_feats is None:
            cur_feats = self._detect_features(pyr)
        kps, desc = cur_feats
        for kf in reversed(self.keyframes.keyframes[-rcfg.max_candidates:]):
            if kf.kp_desc is None or kf.kp_p3d is None:
                continue
            m = match_descriptors(
                kf.kp_desc, desc, kf.kp_valid, kps.valid,
                ratio=self.config.features.ratio,
            )
            if int(m.valid.sum()) < rcfg.pnp_min_inliers:
                continue
            res = pnp_from_pixels(
                self.cam, kf.kp_p3d[m.idx_a], kps.uv[m.idx_b], m.valid,
                jrandom.PRNGKey(self._frame_id),
                threshold_px=rcfg.pnp_threshold_px,
                min_inliers=rcfg.pnp_min_inliers,
            )
            if bool(res.ok):
                T_cam_kf = res.T   # current camera <- keyframe camera
                T_wc = se3.normalize(
                    se3.compose(kf.T_wc, se3.inverse(jnp.asarray(T_cam_kf)))
                )
                if bool(jnp.isfinite(T_wc).all()):
                    return T_wc, kf.frame_id, cur_feats
        return None

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

        def _sync(x):
            if cfg.profile:
                jax.block_until_ready(x)
            return x

        ts = float(timestamp) if timestamp is not None else float(self._frame_id)
        with self.timers.stage("ingest"):
            img = self._ingest(image)
            pyr = _sync(build_pyramid(img, levels=cfg.tracker.pyramid_levels))
        depth_dev = None
        if depth is not None:
            ddev = jnp.asarray(depth, jnp.float32)
            x0, y0, w, h = self._roi
            depth_dev = jax.lax.dynamic_slice(ddev, (y0, x0), (h, w))

        with self.timers.stage("features"):
            cur_feats = (
                _sync(self._detect_features(pyr)) if cfg.use_features else None
            )

        if self._prev is None:
            pts = self._select_points(pyr, depth_dev)
            state = FrameState(
                frame_id=self._frame_id,
                timestamp=ts,
                T_wc=np.asarray(self._T_wc),
                tracked_inliers=int(pts.valid.sum()),
                track_error=0.0,
                is_keyframe=True,
                ref_kf_id=self._frame_id,
                T_kf_frame=np.eye(4, dtype=np.float32),
            )
            kf = self._make_keyframe(ts, pyr, pts, cur_feats, depth_dev)
            self.keyframes.insert(kf)
            self._kf_poses[kf.frame_id] = np.asarray(kf.T_wc)
            self._on_new_keyframe(kf)
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
            with self.timers.stage("track"):
                out = track(
                    prev_pyr,
                    pyr,
                    prev_pts,
                    self.cam,
                    T_init=T_init,
                    levels=cfg.tracker.track_levels,
                    max_iters=cfg.tracker.max_iterations,
                    weight_kind=cfg.tracker.weight_kind,
                    mode=cfg.tracker.track_mode,
                    affine=cfg.tracker.affine_brightness,
                )
                _sync(out.T)
            T_rel = out.T                     # cur <- prev
            inliers = int(out.inliers)
            capacity = int(prev_pts.valid.sum())
            ratio = inliers / max(capacity, 1)

            # Failure detection (reference: none — a diverged GN writes a bad
            # pose, SURVEY.md §5). A frame is LOST when inliers collapse, the
            # error explodes, or the pose goes non-finite.
            rcfg = cfg.reloc
            # Absolute floor, clamped with slack when the point budget is
            # small (a 64-point budget with 63 inliers is healthy tracking,
            # not a failure).
            inlier_floor = min(rcfg.min_inliers, int(0.5 * capacity))
            lost = cfg.use_reloc and (
                inliers < inlier_floor
                or ratio < rcfg.min_inlier_ratio
                or not bool(jnp.isfinite(out.error))
                or float(out.error) > rcfg.max_error
                or not bool(jnp.isfinite(T_rel).all())
            )
            status = "ok"
            if lost:
                reloc = self._relocalize(cur_feats, pyr)
                if reloc is not None:
                    self._T_wc, _, cur_feats = reloc
                    self._velocity = jnp.eye(4)
                    status = "relocalized"
                else:
                    # Coast on the constant-velocity model and stay lost.
                    self._T_wc = se3.normalize(
                        se3.compose(self._T_wc, se3.inverse(self._velocity))
                    )
                    status = "lost"
            else:
                self._velocity = T_rel
                self._T_wc = se3.normalize(
                    se3.compose(self._T_wc, se3.inverse(T_rel))
                )
            with self.timers.stage("select"):
                pts = _sync(self._select_points(pyr, depth_dev))
            is_kf = status != "lost" and (
                status == "relocalized"
                or self.keyframes.should_insert(self._frame_id, self._T_wc, ratio)
            )
            if is_kf:
                kf = self._make_keyframe(ts, pyr, pts, cur_feats, depth_dev)
                prev_kf = self.keyframes.latest
                self.keyframes.insert(kf)
                self._kf_poses[kf.frame_id] = np.asarray(kf.T_wc)
                self._on_new_keyframe(kf)
                # Photometric window BA needs no feature tracks; the
                # reprojection path builds its track graph from matches.
                ba_ready = cfg.use_ba and prev_kf is not None and (
                    cfg.ba.photometric or prev_kf.kp_desc is not None
                )
                if ba_ready:
                    if not cfg.ba.photometric:
                        self._extend_tracks(prev_kf, kf)
                    self._kf_since_ba += 1
                    if self._kf_since_ba >= cfg.ba.run_every_n_keyframes:
                        with self.timers.stage("ba"):
                            self._run_window_ba()
                        self._kf_since_ba = 0
            ref_kf = self.keyframes.latest
            T_kf_frame = np.asarray(
                se3.compose(se3.inverse(ref_kf.T_wc), self._T_wc)
            )
            state = FrameState(
                frame_id=self._frame_id,
                timestamp=ts,
                T_wc=np.asarray(self._T_wc),
                tracked_inliers=inliers,
                track_error=float(out.error),
                is_keyframe=is_kf,
                ref_kf_id=ref_kf.frame_id,
                T_kf_frame=T_kf_frame,
                status=status,
            )
            self._prev = (pyr, pts, depth_dev)
            self._prev_feats = cur_feats

        self.trajectory.append(state)
        self._frame_id += 1
        return state

    # --------------------------------------------------------------- window BA

    def _extend_tracks(self, prev_kf, new_kf):
        """Match keyframe features and extend the BA track graph."""
        import jax.random as jrandom

        from .features import fundamental_ransac, match_descriptors

        fcfg = self.config.features
        m = match_descriptors(
            prev_kf.kp_desc, new_kf.kp_desc,
            prev_kf.kp_valid, new_kf.kp_valid, ratio=fcfg.ratio,
        )
        uv_a = prev_kf.kp_uv[m.idx_a]
        uv_b = new_kf.kp_uv[m.idx_b]
        res = fundamental_ransac(
            uv_a, uv_b, m.valid, jrandom.PRNGKey(new_kf.frame_id),
            threshold=fcfg.ransac_threshold_px,
            num_hypotheses=fcfg.ransac_hypotheses,
            min_inliers=fcfg.min_matches,
        )
        good = np.asarray(m.valid & res.inliers)
        self._tracks.add_keyframe_matches(
            prev_kf.frame_id, new_kf.frame_id,
            np.asarray(m.idx_a), np.asarray(m.idx_b),
            np.asarray(uv_a), np.asarray(uv_b), good,
        )

    def _run_window_photo_ba(self):
        """Direct photometric window BA over keyframe pyramids (the exact
        cost the reference's ResidualIntensity Ceres scaffolding intended,
        include/Tracker.h:295-505): joint LM over keyframe poses and
        per-point inverse depths, Schur-eliminating the diagonal depth
        block. Refined poses propagate like the reprojection path's."""
        import jax.numpy as jnp

        from .ba import (
            photo_ba_problem_from_keyframes,
            photometric_bundle_adjust,
        )

        kfs = self.keyframes.keyframes
        if len(kfs) < 3:
            return
        lvl = self.config.ba.photometric_level
        prob = photo_ba_problem_from_keyframes(
            [k.pyramid for k in kfs],
            [se3.inverse(k.T_wc) for k in kfs],
            [k.points for k in kfs],
            level=lvl,
        )
        out = photometric_bundle_adjust(
            prob,
            self.cam.scaled(lvl),
            max_iters=self.config.ba.max_iterations,
            huber_delta=self.config.ba.photometric_huber,
        )
        if not bool(jnp.isfinite(out.cost)) or float(out.cost) > float(
            out.initial_cost
        ):
            return
        T_new_wc = [se3.inverse(out.T_cw[i]) for i in range(len(kfs))]
        last_old = kfs[-1].T_wc
        for i, k in enumerate(kfs):
            kfs[i] = k._replace(T_wc=T_new_wc[i])
            self._kf_poses[k.frame_id] = np.asarray(T_new_wc[i])
        if self._loops is not None:
            self._loops.update_poses(
                {k.frame_id: np.asarray(T_new_wc[i])
                 for i, k in enumerate(kfs)}
            )
        correction = se3.compose(T_new_wc[-1], se3.inverse(last_old))
        self._T_wc = se3.normalize(se3.compose(correction, self._T_wc))

    def _run_window_ba(self):
        """Sliding-window bundle adjustment over the keyframe window
        (BASELINE config 4; the capability the reference's commented-out
        Ceres scaffolding intended, include/Tracker.h:295-505)."""
        import jax.numpy as jnp

        from .ba import bundle_adjust

        if self.config.ba.photometric:
            return self._run_window_photo_ba()

        kfs = self.keyframes.keyframes
        if len(kfs) < 3:
            return
        kf_ids = [k.frame_id for k in kfs]
        self._tracks.prune_outside_window(set(kf_ids))
        T_cw = np.stack(
            [np.asarray(se3.inverse(k.T_wc)) for k in kfs]
        )
        built = self._tracks.build_problem(
            kf_ids, T_cw, self.cam,
            max_landmarks=min(self.config.ba.landmark_capacity, 1024),
            max_obs=min(self.config.ba.obs_capacity, 8192),
        )
        if built is None:
            return
        problem, _ = built
        out = bundle_adjust(
            problem, self.cam,
            max_iters=self.config.ba.max_iterations,
            huber_delta=self.config.ba.huber_delta_px,
            num_fixed_poses=2,  # monocular: anchor frame gauge AND scale
            pose_prior_weight=self.config.ba.pose_prior_weight,
        )
        if not bool(jnp.isfinite(out.cost)) or float(out.cost) > float(
            out.initial_cost
        ):
            return
        # Write back refined keyframe poses; propagate the newest keyframe's
        # correction to the live pose.
        T_new_wc = [se3.inverse(out.T_cw[i]) for i in range(len(kfs))]
        last_old = kfs[-1].T_wc
        for i, k in enumerate(kfs):
            kfs[i] = k._replace(T_wc=T_new_wc[i])
            self._kf_poses[k.frame_id] = np.asarray(T_new_wc[i])
        if self._loops is not None:
            # Keep the loop-closure history consistent with BA refinements,
            # or the next pose-graph run would revert them.
            self._loops.update_poses(
                {k.frame_id: np.asarray(T_new_wc[i])
                 for i, k in enumerate(kfs)}
            )
        correction = se3.compose(T_new_wc[-1], se3.inverse(last_old))
        self._T_wc = se3.normalize(se3.compose(correction, self._T_wc))

    # ------------------------------------------------------------------ export

    def export_map_ply(self, path: str, max_points: int = 20000) -> int:
        """Write the current map as a PLY point cloud (the reference's
        Map::AddPointCloudFromRGBD + point_cloud topic capability,
        src/Visualizer.cpp:421-446 — it unprojects and subsamples; here the
        cloud is every keyframe's tracked points lifted to world frame).
        Returns the number of points written."""
        from .viz import write_ply

        clouds = []
        for kf in self.keyframes.keyframes:
            pts = np.asarray(kf.points.p3d)
            valid = np.asarray(kf.points.valid)
            p = pts[valid]
            T = np.asarray(self._kf_poses.get(kf.frame_id, kf.T_wc))
            clouds.append(p @ T[:3, :3].T + T[:3, 3])
        if not clouds:
            write_ply(path, np.zeros((0, 3), np.float32))
            return 0
        cloud = np.concatenate(clouds)
        if len(cloud) > max_points:
            step = -(-len(cloud) // max_points)
            cloud = cloud[::step]
        write_ply(path, cloud)
        return len(cloud)

    def save_checkpoint(self, path: str) -> None:
        """Persist the session (SURVEY.md §5 checkpoint/resume: the reference
        has none). Saved: trajectory records, keyframe poses, live pose,
        frame counter."""
        from .utils.checkpoint import save_session

        traj = self.trajectory
        state = {
            "frame_id": np.asarray(self._frame_id),
            "T_wc": np.asarray(self._T_wc),
            "velocity": np.asarray(self._velocity),
            "traj_ts": np.asarray([s.timestamp for s in traj]),
            "traj_T": np.stack([s.T_wc for s in traj])
            if traj else np.zeros((0, 4, 4), np.float32),
            "traj_ref_kf": np.asarray([s.ref_kf_id for s in traj]),
            "traj_T_kf": np.stack(
                [s.T_kf_frame if s.T_kf_frame is not None
                 else np.eye(4, dtype=np.float32) for s in traj]
            ) if traj else np.zeros((0, 4, 4), np.float32),
            "kf_ids": np.asarray(sorted(self._kf_poses.keys())),
            "kf_poses": np.stack(
                [self._kf_poses[k] for k in sorted(self._kf_poses.keys())]
            ) if self._kf_poses else np.zeros((0, 4, 4), np.float32),
        }
        save_session(path, state)

    def resume_from(self, path: str) -> int:
        """Restore a saved session. Tracking re-bootstraps on the next frame
        (pyramids are not checkpointed) but the trajectory, keyframe poses,
        and live pose continue seamlessly. Returns the next frame index."""
        from .utils.checkpoint import load_session

        st = load_session(path)
        self._frame_id = int(st["frame_id"])
        self._T_wc = jnp.asarray(st["T_wc"])
        self._velocity = jnp.asarray(st["velocity"])
        self._kf_poses = {
            int(k): np.asarray(T)
            for k, T in zip(st["kf_ids"], st["kf_poses"])
        }
        self.trajectory = [
            FrameState(
                frame_id=i,
                timestamp=float(st["traj_ts"][i]),
                T_wc=np.asarray(st["traj_T"][i]),
                tracked_inliers=0,
                track_error=0.0,
                is_keyframe=False,
                ref_kf_id=int(st["traj_ref_kf"][i]),
                T_kf_frame=np.asarray(st["traj_T_kf"][i]),
            )
            for i in range(len(st["traj_ts"]))
        ]
        self._prev = None       # re-bootstrap on the next frame
        self._prev_feats = None
        return self._frame_id

    def export_trajectory(self, path: str | None = None):
        """Export per-frame poses; frames are recomposed against the LATEST
        (BA-refined) pose of their reference keyframe."""
        path = path or self.config.trajectory_csv
        ts = [s.timestamp for s in self.trajectory]
        poses = []
        for s in self.trajectory:
            kf_pose = self._kf_poses.get(s.ref_kf_id)
            if kf_pose is not None and s.T_kf_frame is not None:
                poses.append(np.asarray(kf_pose @ s.T_kf_frame, np.float32))
            else:
                poses.append(s.T_wc)
        poses = np.stack(poses)
        if path:
            write_trajectory_tum(path, ts, poses)
        return np.asarray(ts), poses
