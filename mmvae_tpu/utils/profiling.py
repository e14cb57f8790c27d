"""Tracing and throughput measurement (SURVEY.md section 5, tracing row).

The reference has no profiling beyond wall-clock prints; the TPU-native
equivalents are ``jax.profiler`` traces (viewable in XProf/Perfetto) and
an honest samples/sec harness for the [B:2] metric.

IMPORTANT quirk of this environment, baked in here so callers don't
rediscover it: ``jax.block_until_ready`` returns EARLY through the axon
remote-TPU relay -- a host fetch (``np.asarray``) of a result is the only
reliable completion barrier. ``device_barrier`` does that.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import numpy as np

__all__ = ["trace", "measure_samples_per_sec", "device_barrier"]


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """``jax.profiler`` trace context; view with XProf/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_barrier(tree) -> float:
    """Force completion by fetching one scalar per leaf to the host.

    Returns the fetched sum (cheap: one element per leaf)."""
    import jax

    total = 0.0
    for leaf in jax.tree.leaves(tree):
        total += float(np.asarray(leaf).reshape(-1)[0])
    return total


def measure_samples_per_sec(
    step_fn: Callable,
    state,
    batch_iter: Callable[[], Iterator],
    samples_per_step: int,
    *,
    warmup: int = 3,
    n_chips: int | None = None,
) -> float:
    """Throughput of a ``(state, batch) -> (state, metrics)`` step fn.

    ``batch_iter`` is a zero-arg callable returning a fresh batch
    iterator. Timing closes with a host fetch of the last metrics.
    """
    import jax

    it = batch_iter()
    for _ in range(warmup):
        state, metrics = step_fn(state, next(it))
    device_barrier(metrics)
    steps = 0
    t0 = time.perf_counter()
    for batch in batch_iter():
        state, metrics = step_fn(state, batch)
        steps += 1
    device_barrier(metrics)
    dt = time.perf_counter() - t0
    chips = n_chips or max(1, len(jax.devices()))
    return samples_per_step * steps / dt / chips
