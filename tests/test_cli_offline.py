"""CLI --offline throughput mode: batched odometry over a dataset directory.

Covers the data-parallel path end-to-end through the CLI: chunked
track_sequence_batched with one-frame overlap, TUM trajectory export, and
computed ATE against ground truth (the reference has no offline mode at all;
its loop is strictly sequential, src/main_uw_slam.cpp:139-151).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.io import read_trajectory_tum
from uwslam_tpu.lie import se3, so3
from uwslam_tpu.utils.synthetic import render_plane_view

CAM = PinholeCamera(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)


def _write_dataset(tmp_path, n=18):
    from PIL import Image

    rgb = tmp_path / "rgb"
    os.makedirs(rgb)
    gt_lines = ["# gt\n# synthetic\n# ts tx ty tz qx qy qz qw\n"]
    for i in range(n):
        xi = jnp.asarray(
            [0.02 * i, 0.008 * i, 0.004 * i, 0.001 * i, -0.002 * i, 0.003 * i],
            jnp.float32,
        )
        T = se3.exp(xi)
        img = np.asarray(render_plane_view(CAM, T, 2.0))
        ts = f"{1.0 + 0.033 * i:.6f}"
        Image.fromarray(img.clip(0, 255).astype(np.uint8)).save(rgb / f"{ts}.png")
        Twc = np.asarray(se3.inverse(T))
        q = np.asarray(so3.to_quaternion(jnp.asarray(Twc[:3, :3])))
        t = Twc[:3, 3]
        gt_lines.append(
            f"{ts} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n"
        )
    (tmp_path / "groundtruth.txt").write_text("".join(gt_lines))
    calib = tmp_path / "calib.xml"
    calib.write_text(f"""<?xml version="1.0"?>
<opencv_storage>
<in_width>{CAM.width}</in_width><in_height>{CAM.height}</in_height>
<out_width>{CAM.width}</out_width><out_height>{CAM.height}</out_height>
<calibration_values type_id="opencv-matrix"><rows>1</rows><cols>4</cols>
<dt>f</dt><data>{CAM.fx} {CAM.fy} {CAM.cx} {CAM.cy}</data>
</calibration_values>
<rectification type_id="opencv-matrix"><rows>1</rows><cols>4</cols>
<dt>f</dt><data>0 0 0 0</data>
</rectification>
</opencv_storage>""")
    return rgb, calib, tmp_path / "groundtruth.txt"


class TestOfflineCli:
    @pytest.mark.parametrize("mode", ["fc", "ic"])
    def test_offline_tracks_and_exports(self, tmp_path, mode, capsys):
        from uwslam_tpu.cli import main

        rgb, calib, gt = _write_dataset(tmp_path)
        out = tmp_path / "est.txt"
        rc = main([
            "-d", str(rgb), "-c", str(calib),
            "--tum-gt", str(gt),
            "--offline", "--chunk", "8",   # forces multi-chunk chaining
            "--track-mode", mode,
            "--mono-depth", "2.0", "--levels", "4", "--num-points", "512",
            "--trajectory-out", str(out),
        ])
        assert rc == 0
        ts, poses = read_trajectory_tum(str(out))
        assert len(ts) == 18 and poses.shape == (18, 4, 4)
        err = capsys.readouterr()
        assert "offline" in err.err
        # ATE line goes to stdout; chunk chaining must not break the chain
        assert "ATE RMSE" in err.out
        rmse = float(err.out.split("ATE RMSE (Sim3-aligned):")[1].split()[0])
        assert rmse < 0.01, rmse
