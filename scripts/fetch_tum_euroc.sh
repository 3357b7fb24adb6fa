#!/usr/bin/env bash
# Fetch the real TUM RGB-D and EUROC MAV sequences the eval harness uses,
# into the directory layout `python eval.py --real <ROOT>` expects.
#
# The development rig for this repo has NO network egress, so the committed
# RESULTS_r*.json tables run synthetic stand-ins (same on-disk formats,
# analytic ground truth — see eval.py's module docstring). On a machine with
# network access, run this script and then:
#
#     python eval.py --real "$ROOT" --round 4
#
# to reproduce the same 11-config table on the real sequences
# (reference datasets: /root/reference/README.md:101-129).
set -euo pipefail

ROOT="${1:-$HOME/datasets/uwslam}"
mkdir -p "$ROOT"
cd "$ROOT"

fetch() {  # fetch <url> <out>
    if [ -f "$2" ]; then echo "have $2"; return; fi
    echo "fetching $1"
    curl -L --fail -o "$2" "$1" || wget -O "$2" "$1"
}

# --- TUM freiburg1_desk (mono + depth + groundtruth.txt) -------------------
# https://cvg.cit.tum.de/data/datasets/rgbd-dataset/download
TUM_SEQ="rgbd_dataset_freiburg1_desk"
fetch "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/${TUM_SEQ}.tgz" \
      "${TUM_SEQ}.tgz"
if [ ! -d tum_seq01 ]; then
    tar xzf "${TUM_SEQ}.tgz"
    mv "$TUM_SEQ" tum_seq01
fi
# A long sequence with revisits for the loop-closure configs (5-7).
TUM_LONG="rgbd_dataset_freiburg2_desk"
fetch "https://cvg.cit.tum.de/rgbd/dataset/freiburg2/${TUM_LONG}.tgz" \
      "${TUM_LONG}.tgz"
if [ ! -d tum_long ]; then
    tar xzf "${TUM_LONG}.tgz"
    mv "$TUM_LONG" tum_long
fi

# --- EUROC MAV MH_01 + V1_01 (mav0 layout + state gt CSV) ------------------
# https://projects.asl.ethz.ch/datasets/doku.php?id=kmavvisualinertialdatasets
EUROC_BASE="http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset"
fetch "${EUROC_BASE}/machine_hall/MH_01_easy/MH_01_easy.zip" MH_01_easy.zip
if [ ! -d euroc_mh01 ]; then
    mkdir -p euroc_mh01 && (cd euroc_mh01 && unzip -q ../MH_01_easy.zip)
fi
fetch "${EUROC_BASE}/vicon_room1/V1_01_easy/V1_01_easy.zip" V1_01_easy.zip
if [ ! -d euroc_v101 ]; then
    mkdir -p euroc_v101 && (cd euroc_v101 && unzip -q ../V1_01_easy.zip)
fi

echo
echo "done. layout under $ROOT:"
echo "  tum_seq01/rgb + groundtruth.txt      (TUM fr1/desk)"
echo "  tum_long/rgb + groundtruth.txt       (TUM fr2/desk, revisits)"
echo "  euroc_mh01/mav0/...                  (EUROC MH_01_easy)"
echo "  euroc_v101/mav0/...                  (EUROC V1_01_easy)"
echo
echo "run: python eval.py --real $ROOT"
