"""Image pyramids, gradients, sampling."""
from .pyramid import (
    PYRAMID_LEVELS,
    FramePyramid,
    bilinear_sample,
    bilinear_sample_dense,
    build_depth_pyramid,
    build_pyramid,
    downsample2x,
    scharr_gradients,
)

__all__ = [
    "PYRAMID_LEVELS",
    "FramePyramid",
    "build_pyramid",
    "build_depth_pyramid",
    "downsample2x",
    "scharr_gradients",
    "bilinear_sample",
    "bilinear_sample_dense",
]
