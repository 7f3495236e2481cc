"""Test configuration: force JAX onto CPU with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware (SURVEY.md §4)."""
import os

# NOTE: JAX_PLATFORMS gets force-set to "axon" by the environment, so use the
# config API (and the legacy env name) to pin tests to CPU with 8 virtual
# devices for multi-chip sharding tests.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite re-jits the same programs across
# test files; caching compiled executables cuts suite time dramatically.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
