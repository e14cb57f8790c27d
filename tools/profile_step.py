"""Capture a jax.profiler trace of the train step and summarize it.

Usage: python tools/profile_step.py [mnist|celeba] [float32|bfloat16]
                                    [batch] [logdir] [stacked|gather]

The 5th arg selects the epoch program: "stacked" (pre-stacked batches,
the historical default here) or "gather" -- the in-program
shuffle+gather runner ``bench.py``/``api.train`` actually run
single-device, i.e. the program behind the driver's headline
``BENCH_r*.json`` number (round-5: python tools/profile_step.py mnist
float32 100 /tmp/trace_driver gather traces the exact driver point).

Writes an XProf trace (view in Perfetto/XProf) and, when the trace
contains device lanes, prints the top ops by self time -- the
trace-backed answer to "where does the step time go". Through the axon
relay the device-side lanes may be unavailable; the script still
reports host-side dispatch timing and says so explicitly rather than
guessing.
"""

from __future__ import annotations

import glob
import gzip
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "mnist"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else (
        2048 if which == "mnist" else 256
    )
    logdir = sys.argv[4] if len(sys.argv) > 4 else f"/tmp/mmvae_trace_{which}"

    import jax
    import jax.numpy as jnp

    from mmvae_tpu.data import load_dataset, stacked_epoch
    from mmvae_tpu.train import create_train_state, make_epoch_runner
    from mmvae_tpu.utils import trace

    mode = sys.argv[5] if len(sys.argv) > 5 else "stacked"
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    # "gather" mirrors bench.measure_jax's program shape (200 steps at
    # the driver point); the pre-stacked program keeps the short epoch.
    steps = 200 if mode == "gather" else 16
    kwargs = dict(annealing_steps=1000)
    if which == "celeba":
        from mmvae_tpu.models import CelebAMVAE

        model = CelebAMVAE(n_latents=100, dtype=dt)
        kwargs["n_random_subsets"] = 4
    else:
        from mmvae_tpu.models import MnistMVAE

        model = MnistMVAE(n_latents=64, dtype=dt)
    ds = load_dataset(which, n=batch * steps, seed=0)
    state = create_train_state(
        model,
        {k: v[:batch] for k, v in ds.arrays.items()},
        jax.random.key(0),
        1e-3,
    )
    if mode == "gather":
        from mmvae_tpu.train import make_gather_epoch_runner

        runner = make_gather_epoch_runner(
            model, steps, batch, **kwargs
        )
        arrays = ds.arrays
        state, arrays, ms = runner(state, arrays)  # compile + warm
        float(np.asarray(ms["loss"]).sum())
        import time

        t0 = time.perf_counter()
        with trace(logdir):
            state, arrays, ms = runner(state, arrays)
            float(np.asarray(ms["loss"]).sum())  # host fetch in trace
        wall = time.perf_counter() - t0
        print(
            f"epoch wall inside trace: {wall:.4f}s "
            f"({batch * steps / wall:,.0f} samples/s)"
        )
    else:
        runner = make_epoch_runner(model, **kwargs)
        batches = stacked_epoch(ds, batch)
        state, ms = runner(state, batches)  # compile + warm
        float(np.asarray(ms["loss"]).sum())

        with trace(logdir):
            state, ms = runner(state, batches)
            float(np.asarray(ms["loss"]).sum())  # host fetch in trace

    print(f"trace written to {logdir}")
    _summarize(logdir)
    return 0


def _summarize(logdir: str) -> None:
    """Best-effort xplane summary: top ops by self time per plane."""
    # Some jax/platform combos gzip the xplane file -- match both.
    paths = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    ) + glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb.gz"), recursive=True
    )
    if not paths:
        print("no xplane files found (trace may be host-only)")
        return
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        print("xplane present but no parser available; open with "
              f"XProf/Perfetto: {logdir}")
        return
    for path in paths:
        raw = open(path, "rb").read()
        if path.endswith(".gz"):
            raw = gzip.decompress(raw)
        space = xplane_pb2.XSpace()
        space.ParseFromString(raw)
        for plane in space.planes:
            totals: dict[str, float] = {}
            for line in plane.lines:
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    totals[name] = totals.get(name, 0.0) + ev.duration_ps
            if not totals:
                continue
            top = sorted(totals.items(), key=lambda kv: -kv[1])[:12]
            tot = sum(totals.values())
            print(f"\n== plane: {plane.name} (total {tot/1e12:.3f}s of events)")
            for name, ps in top:
                print(f"  {ps/1e9:10.3f} ms  {100*ps/tot:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    sys.exit(main())
