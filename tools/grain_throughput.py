"""Measure the Grain data backend's training throughput vs the
device-resident path (round-2 VERDICT item #10: "record the Grain
throughput delta in BASELINE.md").

Same model/shapes as bench.py's reference point (MNIST f32, batch 100,
200 steps/epoch). The device path is the in-program shuffle+gather
runner; the grain path re-stacks the epoch on host (Grain shuffle +
per-epoch host->device transfer), which is exactly what
``api.train(data_backend="grain")`` does.

Usage: python tools/grain_throughput.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def measure_grain(batch: int = 100, steps: int = 200, n_epochs: int = 10):
    import numpy as np

    import jax

    from bench import N_LATENTS
    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import create_train_state, make_epoch_runner

    config = get_config("mnist").replace(
        n_latents=N_LATENTS,
        batch_size=batch,
        train_size=batch * steps,
        data_backend="grain",
    )
    model = MnistMVAE(n_latents=N_LATENTS)
    ds = load_dataset("mnist", n=batch * steps, seed=0)
    state = create_train_state(
        model,
        {k: v[:batch] for k, v in ds.arrays.items()},
        jax.random.key(0),
        1e-3,
    )
    runner = make_epoch_runner(model, annealing_steps=1000)

    def epoch_serial(seed):
        nonlocal state
        batches = api._grain_epoch(ds, config, model, seed)
        state, ms = runner(state, batches)
        # Host fetch = the only honest completion barrier on the relay.
        return float(np.asarray(ms["loss"]).sum())

    epoch_serial(0)  # compile + warmup
    t0 = time.perf_counter()
    for i in range(n_epochs):
        epoch_serial(i + 1)
    serial_dt = time.perf_counter() - t0

    # The prefetched path api.train actually runs (round 3): epoch k+1's
    # grain loading + host stacking overlap epoch k's device scan +
    # metrics fetch on a single worker thread; the transfer stays on
    # the main thread (see api._GrainPrefetcher on why).
    pf = api._GrainPrefetcher(ds, config, model)
    try:
        pf.schedule(100)
        t0 = time.perf_counter()
        for i in range(n_epochs):
            batches = pf.take(100 + i)
            # state is DONATED into the scan -- rebind, as api.train does.
            state, ms = runner(state, batches)
            pf.schedule(100 + i + 1)
            float(np.asarray(ms["loss"]).sum())
        prefetch_dt = time.perf_counter() - t0
    finally:
        pf.close()
    n = batch * steps * n_epochs
    return n / serial_dt, n / prefetch_dt


def main() -> None:
    from bench import measure_jax

    serial_sps, prefetch_sps = measure_grain()
    device = measure_jax(n_epochs=10)
    line = {
        "grain_samples_per_sec": round(prefetch_sps, 1),
        "grain_serial_samples_per_sec": round(serial_sps, 1),
        "prefetch_speedup": round(prefetch_sps / serial_sps, 3),
        "device_samples_per_sec": round(device["samples_per_sec"], 1),
        "grain_vs_device": round(
            prefetch_sps / device["samples_per_sec"], 3
        ),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
