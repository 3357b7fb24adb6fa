"""Checkpoint / resume — SLAM session state persistence (SURVEY.md §5: the
reference has none; its closest analogue is the -s start-index flag,
/root/reference/src/main_uw_slam.cpp:118-122).

Saves {keyframe poses, landmark blocks, trajectory, frame counter} with orbax
when available, falling back to numpy .npz (same schema) so resume works in
minimal environments.
"""
from __future__ import annotations

import os

import numpy as np


def save_session(path: str, state: dict) -> None:
    """state: flat dict of arrays + scalars. Writes <path>.npz atomically."""
    arrays = {}
    for k, v in state.items():
        arrays[k] = np.asarray(v)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path if path.endswith(".npz") else path + ".npz")


def load_session(path: str) -> dict:
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as f:
        return {k: f[k] for k in f.files}


def save_session_orbax(path: str, state: dict) -> None:
    """Orbax-backed variant for large device-resident states."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_session_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
