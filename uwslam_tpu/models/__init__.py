"""Model families / pipeline presets.

The reference ships two pipelines: the main direct SLAM binary and the
standalone feature-VO prototype (SURVEY.md §1). This package mirrors and
extends that surface:

- direct odometry / SLAM  -> uwslam_tpu.system.SlamSystem (presets below)
- feature essential-matrix VO -> FeatureVO (feature_detector.cpp parity)
- batched offline odometry -> uwslam_tpu.tracking.track_sequence
"""
from ..config import (
    BAConfig,
    FeatureConfig,
    KeyframeConfig,
    SlamConfig,
    TrackerConfig,
)
from .feature_vo import FeatureVO, FeatureVOState


def direct_odometry_config(**overrides) -> SlamConfig:
    """BASELINE config 1: direct GN tracking, no features, no BA."""
    return SlamConfig(**overrides)


def feature_slam_config(**overrides) -> SlamConfig:
    """BASELINE config 2: feature detection + patch matching + keyframes."""
    return SlamConfig(use_features=True, **overrides)


def windowed_ba_config(**overrides) -> SlamConfig:
    """BASELINE config 4: sliding-window Schur BA on keyframes."""
    return SlamConfig(use_features=True, use_ba=True, **overrides)


def full_slam_config(**overrides) -> SlamConfig:
    """Everything on: features, window BA, relocalization, loop closure."""
    return SlamConfig(
        use_features=True, use_ba=True, use_reloc=True,
        use_loop_closure=True, **overrides
    )


__all__ = [
    "FeatureVO",
    "FeatureVOState",
    "direct_odometry_config",
    "feature_slam_config",
    "windowed_ba_config",
    "full_slam_config",
    "SlamConfig",
    "TrackerConfig",
    "FeatureConfig",
    "KeyframeConfig",
    "BAConfig",
]
