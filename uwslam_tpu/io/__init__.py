"""Dataset readers, trajectory I/O, and evaluation metrics."""
from .dataset import (
    DeviceFramePrefetcher,
    FramePrefetcher,
    Sequence,
    list_images,
    open_directory,
    open_euroc,
    open_tum,
)
from .trajectory import (
    associate,
    ate_rmse,
    poses_from_euroc_rows,
    poses_from_tum_rows,
    read_groundtruth_euroc,
    read_groundtruth_tum,
    rpe,
    umeyama_alignment,
    read_trajectory_tum,
    write_trajectory_tum,
)

__all__ = [
    "Sequence",
    "DeviceFramePrefetcher",
    "FramePrefetcher",
    "list_images",
    "open_tum",
    "open_euroc",
    "open_directory",
    "read_groundtruth_tum",
    "read_groundtruth_euroc",
    "poses_from_tum_rows",
    "poses_from_euroc_rows",
    "read_trajectory_tum",
    "write_trajectory_tum",
    "associate",
    "umeyama_alignment",
    "ate_rmse",
    "rpe",
]
