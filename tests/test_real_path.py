"""End-to-end proof of the `eval.py --real` runway (VERDICT r4 next #6).

Constructs miniature sequences in the EXACT on-disk layouts that
scripts/fetch_tum_euroc.sh downloads produce —

    <ROOT>/tum_seq01/rgb/<ts>.png + groundtruth.txt   (3 header lines,
        space-separated, reference reader src/Visualizer.cpp:449-477)
    <ROOT>/euroc_mh01/mav0/cam0/data/<ns>.png
        + mav0/state_groundtruth_estimate0/data.csv   (skip-1 comma CSV,
        reference reader src/Visualizer.cpp:479-505)

— WITHOUT pre-written calibration files, then drives eval.real_datasets()
(which must auto-write the reference calibrations) -> eval.run_cli end to
end, exactly the wiring `python eval.py --real ROOT` uses. No network
needed: the frames are synthetic renders saved in the real formats.
"""
import os
import shutil
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import eval as evalmod  # noqa: E402


@pytest.fixture(scope="module")
def real_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("real_layout"))

    # TUM: build via the synthetic generator, then strip everything the
    # real download would NOT contain (calib.xml, DONE marker).
    tum_dir = os.path.join(root, "tum_seq01")
    evalmod.make_tum_dataset(tum_dir, n_frames=20, seed=9)
    os.remove(os.path.join(tum_dir, "calib.xml"))
    os.remove(os.path.join(tum_dir, "DONE"))
    # tum_long shares the layout; point it at the same miniature so
    # real_datasets() finds all four sequence roots.
    shutil.copytree(tum_dir, os.path.join(root, "tum_long"))

    # EUROC: the generator already writes the mav0-internal layout
    # (cam0/data + state_groundtruth_estimate0/data.csv) — root it at
    # <seq>/mav0 and strip the extras, leaving exactly the unzip result.
    for name in ("euroc_mh01", "euroc_v101"):
        mav = os.path.join(root, name, "mav0")
        evalmod.make_euroc_dataset(mav, n_frames=16, kind="euroc_mh", seed=8)
        os.remove(os.path.join(mav, "calib.xml"))
        os.remove(os.path.join(mav, "DONE"))
    return root


def test_real_datasets_wires_and_writes_calibrations(real_root):
    tum, tum_long, mh01, v101 = evalmod.real_datasets(real_root)
    # Calibration auto-writing (eval.py real_datasets): the reference TUM
    # and EUROC calibrations must now exist next to each sequence.
    assert os.path.exists(tum["calib"])
    assert os.path.exists(mh01["calib"])
    # Wiring matches the downloaded layout.
    assert os.path.isdir(tum["rgb"])
    assert os.path.exists(tum["gt"])
    assert os.path.isdir(os.path.join(mh01["root"], "cam0", "data"))
    assert os.path.exists(mh01["gt"])
    # The EUROC calib carries the real cam0 radtan model (rectification
    # path exercised end-to-end in the CLI runs below).
    from uwslam_tpu import camera

    calib = camera.load(mh01["calib"])
    assert calib.needs_rectification


def test_real_tum_cli_end_to_end(real_root):
    tum = evalmod.real_datasets(real_root)[0]
    res = evalmod.run_cli(
        ["-d", tum["rgb"], "-c", tum["calib"], "--tum-gt", tum["gt"],
         "--levels", "3", "--mono-depth", "2.5",
         "--platform", "cpu"],
    )
    assert res["rc"] == 0, res.get("error", "")
    assert res.get("frames") == 20
    assert "ate_rmse_m" in res and res["ate_rmse_m"] < 1.0


def test_real_euroc_cli_end_to_end(real_root):
    mh01 = evalmod.real_datasets(real_root)[2]
    res = evalmod.run_cli(
        ["-d", mh01["root"], "--euroc", "-c", mh01["calib"],
         "--euroc-gt", mh01["gt"], "--levels", "3", "--mono-depth", "3.0",
         "--platform", "cpu"],
    )
    assert res["rc"] == 0, res.get("error", "")
    assert res.get("frames") == 16
    assert "ate_rmse_m" in res and res["ate_rmse_m"] < 1.0
