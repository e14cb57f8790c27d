"""Measure the Grain data backend's training throughput vs the
device-resident path.

Round 2 recorded the delta (grain 8.7k vs 366k on the MNIST point);
round 4 rebuilt the backend (vectorized batch assembly + segment-
streamed double buffering, api._GrainStream) with the VERDICT target:
grain-backed CelebA f32 within ~15% of the 37k device-resident rate,
or a measured proof of what binds.

Measures, per config (mnist f32/batch100 -- bench.py's reference
point -- and celeba f32/batch64 -- the flagship):
  * serial grain epochs (host gather inline, no overlap)
  * the production streamed path (_GrainStream.run_epoch: worker
    gathers ahead, main-thread transfers), whole-epoch and segmented
  * the device-resident in-program gather runner (the perf path)

Usage: python tools/grain_throughput.py  (prints one JSON line per config)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _setup(config_name: str, batch: int, steps: int, stream_steps: int):
    import jax

    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import CelebAMVAE, MnistMVAE
    from mmvae_tpu.train import create_train_state, make_epoch_runner

    if config_name == "mnist":
        from bench import N_LATENTS

        model = MnistMVAE(n_latents=N_LATENTS)
        n_sub = 0
    else:
        model = CelebAMVAE(n_latents=100)
        n_sub = 4
    config = get_config(config_name).replace(
        batch_size=batch,
        train_size=batch * steps,
        data_backend="grain",
        grain_stream_steps=stream_steps,
        n_random_subsets=n_sub,
    )
    ds = load_dataset(config_name, n=batch * steps, seed=0)
    state = create_train_state(
        model,
        {k: v[:batch] for k, v in ds.arrays.items()},
        jax.random.key(0),
        1e-3,
    )
    runner = make_epoch_runner(
        model, annealing_steps=1000, n_random_subsets=n_sub,
        term_fold="t",
    )
    return api, config, ds, model, state, runner


def measure_grain(
    config_name: str, batch: int, steps: int, n_epochs: int,
    stream_steps: int = 0,
):
    import numpy as np

    api, config, ds, model, state, runner = _setup(
        config_name, batch, steps, stream_steps
    )

    # --- serial: inline host gather each epoch, no overlap.
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

    # --- the streamed path api.train actually runs (round 4).
    st = api._GrainStream(ds, config, model)
    try:
        st.schedule((100, 0))
        t0 = time.perf_counter()
        for i in range(n_epochs):
            # state is DONATED into the scan -- rebind, as api.train does.
            state, ms = st.run_epoch(
                state, runner, 100 + i, next_seed=100 + i + 1
            )
            float(np.asarray(ms["loss"]).sum())
        stream_dt = time.perf_counter() - t0
    finally:
        st.close()
    n = batch * steps * n_epochs
    return n / serial_dt, n / stream_dt


def main() -> None:
    from bench import measure_jax, measure_jax_celeba

    out = {}
    for name, batch, steps, epochs, seg in (
        ("mnist", 100, 200, 10, 0),
        ("mnist", 100, 200, 10, 50),
        ("celeba", 64, 50, 8, 0),
        ("celeba", 64, 50, 8, 10),
    ):
        serial_sps, stream_sps = measure_grain(
            name, batch, steps, epochs, stream_steps=seg
        )
        key = f"{name}_seg{seg}" if seg else name
        out[key] = {
            "grain_stream_samples_per_sec": round(stream_sps, 1),
            "grain_serial_samples_per_sec": round(serial_sps, 1),
        }
    device_mnist = measure_jax(n_epochs=10)
    device_celeba = measure_jax_celeba()
    out["mnist"]["device_samples_per_sec"] = round(
        device_mnist["samples_per_sec"], 1
    )
    out["mnist"]["grain_vs_device"] = round(
        out["mnist"]["grain_stream_samples_per_sec"]
        / device_mnist["samples_per_sec"],
        3,
    )
    out["celeba"]["device_samples_per_sec"] = round(
        device_celeba["samples_per_sec"], 1
    )
    out["celeba"]["grain_vs_device"] = round(
        out["celeba"]["grain_stream_samples_per_sec"]
        / device_celeba["samples_per_sec"],
        3,
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
