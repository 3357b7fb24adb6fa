"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without real TPU hardware via
xla_force_host_platform_device_count (SURVEY.md §4 test plan).

NOTE: this environment preloads jax at interpreter start through a
sitecustomize hook that registers the TPU ("axon") PJRT plugin and pins
JAX_PLATFORMS=axon, so plain env vars are too late — the platform must be
overridden through jax.config before the first backend use.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compile cache: recompiles dominate wall-time on the 2-core CI box.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402  (already imported by sitecustomize; config still open)

jax.config.update("jax_platforms", "cpu")
