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

    def epoch(seed):
        nonlocal state
        batches = api._grain_epoch(ds, config, model, seed)
        state, ms = runner(state, batches)
        # Host fetch = the only honest completion barrier on the relay.
        return float(np.asarray(ms["loss"]).sum())

    epoch(0)  # compile + warmup
    t0 = time.perf_counter()
    for i in range(n_epochs):
        epoch(i + 1)
    dt = time.perf_counter() - t0
    return batch * steps * n_epochs / dt


def main() -> None:
    from bench import measure_jax

    grain_sps = measure_grain()
    device = measure_jax(n_epochs=10)
    line = {
        "grain_samples_per_sec": round(grain_sps, 1),
        "device_samples_per_sec": round(device["samples_per_sec"], 1),
        "grain_vs_device": round(
            grain_sps / device["samples_per_sec"], 3
        ),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
