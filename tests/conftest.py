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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual devices share ONE physical core here: a heavy program's
    # per-participant work can exceed XLA:CPU's collective-rendezvous
    # watchdog, which CHECK-fails the whole process ("Termination
    # timeout for all reduce ... Fatal Python error: Aborted" -- seen
    # flakily on the shard_map'd cycle-term test under suite load).
    # The collectives are in-process; a stuck rendezvous here means a
    # slow core, not a lost peer -- give it the room a real run needs.
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = flags

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
# The cache dir is keyed on the HOST CPU's feature set: this VM
# migrates between physical hosts, and XLA:CPU AOT results compiled
# with one host's features can SIGILL on another (cpu_aot_loader logs
# a machine-type mismatch). See mmvae_tpu/utils/cpu_cache.py.
from mmvae_tpu.utils.cpu_cache import enable_cpu_cache  # noqa: E402

enable_cpu_cache(os.path.dirname(__file__))

