"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports.

This is the TPU-era substitute for a fake backend (SURVEY.md §4): every
sharding/collective test runs over a real 8-device mesh on CPU, and the
same code paths compile for TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache keeps repeated test runs fast on the
# single-core CI host.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The environment's sitecustomize pins jax_platforms to the TPU tunnel at
# interpreter start; the env var alone is too late. Override the config
# directly (backends initialize lazily, so this sticks).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
