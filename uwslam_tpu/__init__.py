"""uwslam_tpu — a TPU-native monocular SLAM framework.

Brand-new JAX/XLA/Pallas implementation covering the full capability surface
of MecatronicaUSB/uw-slam (see SURVEY.md): image pyramids + gradients, feature
detection/robust matching, direct photometric Gauss-Newton/LM tracking over
SE(3), camera calibration/undistortion, keyframe map management, sliding-window
bundle adjustment, and multi-device scaling via jax.sharding meshes.
"""
import os as _os


def _setup_compile_cache() -> None:
    """Persistent XLA compilation cache (opt-out: UWSLAM_NO_CACHE=1).

    The tracking/BA programs are large jitted graphs (coarse-to-fine LM under
    scan/while_loop) whose first compile costs tens of seconds — and minutes
    for Pallas kernels through a remote-TPU tunnel. Caching compiled
    executables on disk makes every process after the first warm-start:
    fresh CLI runs, the eval harness's subprocesses, and the driver's
    bench.py all hit the same cache."""
    if _os.environ.get("UWSLAM_NO_CACHE"):
        return
    try:
        import jax

        path = _os.environ.get(
            "UWSLAM_CACHE_DIR",
            _os.path.join(
                _os.path.expanduser("~"), ".cache", "uwslam_jax"
            ),
        )
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compile_cache()

from . import lie  # noqa: E402

__version__ = "0.2.0"

__all__ = ["lie"]
