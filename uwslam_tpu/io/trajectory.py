"""Trajectory I/O and evaluation: ground-truth parsers, CSV export, ATE/RPE.

Replaces the reference's eyeball-Rviz validation with computed metrics:
- GT parsers mirror /root/reference/src/Visualizer.cpp:449-505 exactly
  (TUM: skip 3 header lines, space-separated, ts tx ty tz qx qy qz qw;
  EUROC: skip 1 header line, comma-separated state CSV, ts px py pz qw qx qy qz)
- CSV trajectory append mirrors src/Visualizer.cpp:386-400 (but to a
  caller-chosen path, not the reference's hardcoded /home/lujano/... one)
- ATE RMSE with Horn/Umeyama SE(3)/Sim(3) alignment; RPE per frame-pair.
"""
from __future__ import annotations

import numpy as np

from ..lie import se3, so3


def read_groundtruth_tum(path: str, skip_lines: int = 3) -> np.ndarray:
    """TUM groundtruth.txt -> (N, 8) [ts, tx, ty, tz, qx, qy, qz, qw].

    Mirrors Visualizer::ReadGroundTruthTUM (src/Visualizer.cpp:449-477):
    3 header lines skipped, space-separated."""
    rows = []
    with open(path) as f:
        for _ in range(skip_lines):
            f.readline()
        for line in f:
            parts = line.strip().split()
            if len(parts) >= 8 and not line.startswith("#"):
                rows.append([float(x) for x in parts[:8]])
    return np.asarray(rows, dtype=np.float64)


def read_groundtruth_euroc(path: str) -> np.ndarray:
    """EUROC state_groundtruth_estimate0/data.csv -> (N, 8)
    [ts_sec, px, py, pz, qw, qx, qy, qz].

    Mirrors Visualizer::ReadGroundTruthEUROC (src/Visualizer.cpp:479-505):
    1 header line skipped, comma-separated; timestamps are ns -> seconds."""
    rows = []
    with open(path) as f:
        f.readline()
        for line in f:
            parts = line.strip().split(",")
            if len(parts) >= 8:
                rows.append([float(x) for x in parts[:8]])
    arr = np.asarray(rows, dtype=np.float64)
    if len(arr):
        arr[:, 0] *= 1e-9
    return arr


def poses_from_tum_rows(rows: np.ndarray) -> np.ndarray:
    """(N, 8) TUM rows -> (N, 4, 4) transforms (world <- camera)."""
    t = rows[:, 1:4]
    qxyzw = rows[:, 4:8]
    q_wxyz = np.concatenate([qxyzw[:, 3:4], qxyzw[:, 0:3]], axis=1)
    R = np.asarray(so3.from_quaternion(q_wxyz.astype(np.float32)))
    return np.asarray(
        se3.from_rotation_translation(R, t.astype(np.float32))
    )


def poses_from_euroc_rows(rows: np.ndarray) -> np.ndarray:
    """(N, 8) EUROC rows (qw first) -> (N, 4, 4)."""
    t = rows[:, 1:4]
    q_wxyz = rows[:, 4:8]
    R = np.asarray(so3.from_quaternion(q_wxyz.astype(np.float32)))
    return np.asarray(
        se3.from_rotation_translation(R, t.astype(np.float32))
    )


def write_trajectory_tum(path: str, timestamps, poses) -> None:
    """Write (N, 4, 4) world<-camera poses in TUM format
    (ts tx ty tz qx qy qz qw) — the standard ATE-tool interchange format."""
    poses = np.asarray(poses)
    q, t = se3.to_quaternion_translation(poses.astype(np.float32))
    q = np.asarray(q); t = np.asarray(t)
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for i in range(len(poses)):
            ts = timestamps[i] if timestamps is not None else float(i)
            f.write(
                f"{ts:.6f} {t[i,0]:.6f} {t[i,1]:.6f} {t[i,2]:.6f} "
                f"{q[i,1]:.6f} {q[i,2]:.6f} {q[i,3]:.6f} {q[i,0]:.6f}\n"
            )


def read_trajectory_tum(path: str):
    """Read a TUM-format trajectory (ts tx ty tz qx qy qz qw; '#' comments)
    back into (timestamps (N,), poses (N, 4, 4)) — the inverse of
    write_trajectory_tum, used for session comparison and external ATE
    tooling interchange."""
    rows = []
    with open(path) as f:
        for ln in f:
            parts = ln.strip().split()
            if not parts or parts[0].startswith("#") or len(parts) < 8:
                continue  # skip comments and truncated rows (partial writes)
            rows.append([float(x) for x in parts[:8]])
    data = np.asarray(rows, np.float64)
    if data.size == 0:
        return np.zeros((0,)), np.zeros((0, 4, 4), np.float32)
    return data[:, 0], poses_from_tum_rows(data)


def associate(ts_a: np.ndarray, ts_b: np.ndarray, max_dt: float = 0.02):
    """Nearest-timestamp association -> (idx_a, idx_b) pairs within max_dt."""
    ia, ib = [], []
    j = 0
    for i, t in enumerate(ts_a):
        j = int(np.searchsorted(ts_b, t))
        best = None
        for k in (j - 1, j, j + 1):
            if 0 <= k < len(ts_b):
                dt = abs(ts_b[k] - t)
                if best is None or dt < best[1]:
                    best = (k, dt)
        if best is not None and best[1] <= max_dt:
            ia.append(i)
            ib.append(best[0])
    return np.asarray(ia, int), np.asarray(ib, int)


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform aligning src -> dst, both (N, 3).

    Returns (s, R, t) with dst ~ s R src + t. Horn/Umeyama closed form —
    the standard ATE alignment for monocular (scale-ambiguous) trajectories.
    """
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_s = (xs ** 2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var_s) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


# Machine-readable record of the last ate_rmse call's non-finite-pair drop
# (ADVICE r4: a largely-NaN trajectory must not pass health checks with only
# a stderr warning). eval.py also parses the WARNING line and fails a health
# check when the dropped fraction exceeds 2%.
ate_last_dropped = {"dropped": 0, "total": 0}


def ate_rmse(
    est_positions: np.ndarray,
    gt_positions: np.ndarray,
    align: bool = True,
    with_scale: bool = True,
) -> float:
    """Absolute trajectory error RMSE after (optional) Sim(3) alignment."""
    est = np.asarray(est_positions, np.float64)
    gt = np.asarray(gt_positions, np.float64)
    assert est.shape == gt.shape
    finite = np.isfinite(est).all(axis=1) & np.isfinite(gt).all(axis=1)
    ate_last_dropped["dropped"] = int((~finite).sum())
    ate_last_dropped["total"] = int(len(est))
    if not finite.all():
        # A non-finite pose must not kill the whole evaluation (LAPACK's
        # SVD refuses to converge on a NaN covariance) — but it must be
        # LOUD: the ATE is computed over the finite subset and the drop
        # count reported.
        import sys

        print(
            f"WARNING: ate_rmse dropping {int((~finite).sum())}/{len(est)} "
            "non-finite pose pairs",
            file=sys.stderr,
        )
        est = est[finite]
        gt = gt[finite]
    if align and len(est) >= 3:
        s, R, t = umeyama_alignment(est, gt, with_scale)
        est = (s * (R @ est.T)).T + t
    err = est - gt
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


def rpe(est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1):
    """Relative pose error per delta-frame pair -> (trans_rmse, rot_rmse_rad)."""
    est = np.asarray(est_poses); gt = np.asarray(gt_poses)
    n = len(est) - delta
    terrs, rerrs = [], []
    for i in range(n):
        de = np.linalg.inv(est[i]) @ est[i + delta]
        dg = np.linalg.inv(gt[i]) @ gt[i + delta]
        e = np.linalg.inv(dg) @ de
        terrs.append(np.linalg.norm(e[:3, 3]))
        cos = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rerrs.append(np.arccos(cos))
    return (
        float(np.sqrt(np.mean(np.square(terrs)))),
        float(np.sqrt(np.mean(np.square(rerrs)))),
    )
