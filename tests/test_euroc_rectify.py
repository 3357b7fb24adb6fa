"""End-to-end rectification test: distorted input (EUROC-style radtan) through
the full SlamSystem, plus the EUROC CLI path (layout + gt reader + flags)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from uwslam_tpu.camera import PinholeCamera
from uwslam_tpu.camera.calibration import Calibration
from uwslam_tpu.config import SlamConfig, TrackerConfig
from uwslam_tpu.io import ate_rmse
from uwslam_tpu.lie import se3, so3
from uwslam_tpu.system import SlamSystem
from uwslam_tpu.utils.synthetic import render_plane_view_distorted

# EUROC-like distortion, scaled-down image for test speed.
RAW = PinholeCamera(
    fx=140.0, fy=140.0, cx=95.5, cy=63.5, width=192, height=128,
    k1=-0.28, k2=0.07, p1=2e-4, p2=1.8e-5,
)


def _gt_pose(i):
    return se3.exp(
        jnp.asarray([0.02 * i, 0.008 * i, 0.003 * i, 0.0, 0.0, 0.002 * i])
    )


class TestDistortedPipeline:
    def test_system_rectifies_and_tracks(self):
        calib = Calibration(raw=RAW, out_width=RAW.width, out_height=RAW.height)
        sys_ = SlamSystem(
            calib,
            SlamConfig(
                tracker=TrackerConfig(
                    pyramid_levels=4, track_levels=(2, 1, 0),
                    num_points=512, mono_depth=2.0,
                ),
            ),
        )
        # Rectification must be active and the ROI smaller than the raw image.
        assert sys_._rect_map is not None
        assert sys_.cam.width < RAW.width or sys_.cam.height < RAW.height

        est, gt = [], []
        for i in range(8):
            T = _gt_pose(i)
            img = np.asarray(render_plane_view_distorted(RAW, T, 2.0))
            st = sys_.process_frame(img)
            est.append(st.T_wc[:3, 3])
            gt.append(np.asarray(se3.inverse(T))[:3, 3])
        rmse = ate_rmse(np.stack(est), np.stack(gt))
        assert rmse < 0.02, f"ATE on distorted input: {rmse}"


class TestEurocCli:
    def test_euroc_layout_and_flags(self, tmp_path):
        from PIL import Image

        from uwslam_tpu.cli import main

        data = tmp_path / "mav0" / "cam0" / "data"
        os.makedirs(data)
        rows = ["#ts,px,py,pz,qw,qx,qy,qz\n"]
        for i in range(16):
            T = _gt_pose(i)
            img = np.asarray(render_plane_view_distorted(RAW, T, 2.0))
            ns = int(1e9 * 0.05 * i)
            Image.fromarray(img.clip(0, 255).astype(np.uint8)).save(
                data / f"{ns}.png"
            )
            Twc = np.asarray(se3.inverse(T))
            q = np.asarray(so3.to_quaternion(jnp.asarray(Twc[:3, :3])))
            t = Twc[:3, 3]
            # EUROC csv: qw first (reference reader src/Visualizer.cpp:479-505)
            rows.append(
                f"{ns},{t[0]},{t[1]},{t[2]},{q[3]},{q[0]},{q[1]},{q[2]}\n"
            )
        gt_csv = tmp_path / "gt.csv"
        gt_csv.write_text("".join(rows))

        calib_xml = tmp_path / "calib.xml"
        calib_xml.write_text(f"""<?xml version="1.0"?>
<opencv_storage>
<in_width>{RAW.width}</in_width><in_height>{RAW.height}</in_height>
<out_width>{RAW.width}</out_width><out_height>{RAW.height}</out_height>
<calibration_values type_id="opencv-matrix"><rows>1</rows><cols>4</cols>
<dt>f</dt><data>{RAW.fx} {RAW.fy} {RAW.cx} {RAW.cy}</data>
</calibration_values>
<rectification type_id="opencv-matrix"><rows>1</rows><cols>4</cols>
<dt>f</dt><data>{RAW.k1} {RAW.k2} {RAW.p1} {RAW.p2}</data>
</rectification>
</opencv_storage>""")

        out = tmp_path / "est.txt"
        rc = main([
            "-d", str(tmp_path / "mav0"), "--euroc",
            "-c", str(calib_xml),
            "--euroc-gt", str(gt_csv),
            "--trajectory-out", str(out),
            "--levels", "4", "--mono-depth", "2.0", "--num-points", "512",
        ])
        assert rc == 0
        lines = [
            ln for ln in out.read_text().strip().splitlines()
            if not ln.startswith("#")
        ]
        assert len(lines) == 16


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
