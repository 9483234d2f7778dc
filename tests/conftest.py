"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4).

Note: this environment registers the TPU PJRT plugin from sitecustomize and
force-sets ``jax_platforms``; a plain JAX_PLATFORMS env var is not enough, so
we override the config directly before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: jit programs recompile across test processes
# and re-runs otherwise (the dominant cost of this suite is XLA CPU compiles,
# not test logic).  Keyed by HLO, so code changes invalidate naturally.
_cache_dir = os.environ.get("RTPOSE_TEST_CACHE_DIR", "/tmp/rtpose_jax_test_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", "tests must not run over the TPU tunnel"
assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"
