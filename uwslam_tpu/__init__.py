"""uwslam_tpu — a TPU-native monocular SLAM framework.

Brand-new JAX/XLA/Pallas implementation covering the full capability surface
of MecatronicaUSB/uw-slam (see SURVEY.md): image pyramids + gradients, feature
detection/robust matching, direct photometric Gauss-Newton/LM tracking over
SE(3), camera calibration/undistortion, keyframe map management, sliding-window
bundle adjustment, and multi-device scaling via jax.sharding meshes.
"""
from . import lie

__version__ = "0.1.0"

__all__ = ["lie"]
