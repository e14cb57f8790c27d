"""Test harness: force JAX onto CPU with 8 fake devices.

This is the TPU-native analogue of a fake-backend harness (SURVEY.md
section 4): ``xla_force_host_platform_device_count=8`` gives 8 virtual CPU
devices so the pjit'd data-parallel step can be validated without a real
multi-chip slice. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the remote-TPU backend and forces
# jax_platforms="axon,cpu" via jax.config (which trumps the env var); every
# test compile would round-trip to the remote compile service (~60s each).
# Re-force CPU here, before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the (CPU-only) test programs: the suite is
# dominated by XLA compiles that are identical run over run, so repeat
# runs get them for free. NOTE: this cache is safe precisely because the
# tests never touch the axon backend -- with the remote-TPU relay the
# persistent cache deadlocks result fetches (docs/DESIGN.md section 7);
# do NOT copy this setting into TPU-facing code.
_cache_dir = os.path.join(os.path.dirname(__file__), ".xla_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

