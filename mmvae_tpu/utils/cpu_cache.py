"""Persistent XLA compile cache for CPU-backend runs, host-keyed.

The test suite and the CPU-side tools (trajectory parity, flop
counting) are dominated by XLA compiles that are identical run over
run, so a persistent cache pays for itself immediately. Two hazards
shape this helper:

  * This VM migrates between physical hosts; XLA:CPU AOT executables
    compiled with one host's CPU features can SIGILL on another
    (cpu_aot_loader logs a machine-type mismatch). The cache directory
    is therefore keyed on a fingerprint of the host CPU's feature
    flags -- a migrated run recompiles instead of loading a
    mismatched executable.
  * The cache is safe ONLY off the axon remote-TPU relay: with the
    relay, persistent-cache lookups deadlock result fetches
    (docs/DESIGN.md section 7). Callers must be CPU-pinned before
    enabling it.
"""

from __future__ import annotations

import hashlib
import os

__all__ = ["cpu_cache_dir", "enable_cpu_cache"]


def _cpu_fingerprint() -> str | None:
    """Hash of the host CPU's feature flags, or None when undetectable
    (x86 /proc/cpuinfo says ``flags``, aarch64 says ``Features``)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return None


def cpu_cache_dir(base: str | None = None) -> str | None:
    """Host-feature-keyed cache directory (under ``tests/`` by default,
    matching the historical location the suite gitignores) -- or None
    when the host has no readable fingerprint: a shared un-keyed dir
    would reintroduce the cross-host SIGILL hazard, so no fingerprint
    means no persistent cache."""
    fp = _cpu_fingerprint()
    if fp is None:
        return None
    if base is None:
        base = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)
            ))),
            "tests",
        )
    return os.path.join(base, f".xla_cache-{fp}")


def enable_cpu_cache(base: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at the host-keyed dir
    (a no-op returning None on hosts with no readable CPU fingerprint).

    Caller responsibility: only call when the backend is (or will be)
    CPU -- never with the axon relay live (see module docstring).
    """
    import jax

    path = cpu_cache_dir(base)
    if path is None:
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
