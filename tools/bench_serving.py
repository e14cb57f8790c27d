"""Serving latency/throughput benchmark for exported generation artifacts.

    python tools/bench_serving.py [mnist celeba ...] \
        [--batches 1,8,64] [--requests 30] [--http] [--dtype bfloat16]

Measures the production inference path the reference never had
(SURVEY.md 2.13 is offline sampling only): the AOT-exported StableHLO
artifact (mmvae_tpu/serving.py) driven like a server would drive it —
per-request wall latency (p50/p95/max) and samples/sec at several batch
sizes, on whatever backend is attached (the v5e via axon here). With
``--http`` the same requests additionally go through the stdlib HTTP
host (tools/serve.py) on localhost, so the reported delta is the whole
serialize→HTTP→deserialize hosting overhead.

Params are random-init (latency is independent of param values), so the
bench needs no checkpoint. Prints one JSON object per (config, batch)
point and a trailing summary line for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def _percentiles(xs):
    xs = sorted(xs)
    return {
        "p50_ms": 1e3 * xs[len(xs) // 2],
        "p95_ms": 1e3 * xs[min(len(xs) - 1, int(0.95 * len(xs)))],
        "max_ms": 1e3 * xs[-1],
    }


def bench_artifact(
    config_name, batch_sizes, n_requests, dtype, http, http_batch=8
):
    import jax
    import jax.numpy as jnp

    from mmvae_tpu import serving
    from mmvae_tpu.configs import build_model, get_config
    from mmvae_tpu.train import create_train_state

    config = get_config(config_name)
    model = build_model(config, dtype=dtype)
    state = create_train_state(
        model, model.dummy_batch(2), jax.random.key(0), 1e-3
    )

    rows = []
    for bs in batch_sizes:
        path = f"/tmp/bench_{config_name}_{bs}.mmvaexp"
        serving.export_generate(
            config, path, batch_size=bs, params=state.params,
            model=model, dtype=dtype,
        )
        meta, call = serving.load_generate(path)
        # Condition on the label-like modality when there is one
        # (cross-modal generation, the artifact's production use);
        # otherwise prior samples (empty presence).
        batch = {
            k: np.asarray(v) for k, v in model.dummy_batch(bs).items()
        }
        names = [s.name for s in model.specs()]
        # Production shape of a request: condition on the cheap
        # modalities (label / attrs / text), generate the image.
        presence = np.asarray(
            [[0.0 if n == "image" else 1.0 for n in names]] * bs,
            np.float32,
        )
        out = call(batch, presence, 0, 1.0)  # warm (compile/load)
        jax.block_until_ready(out)

        times = []
        for i in range(n_requests):
            t0 = time.perf_counter()
            out = call(batch, presence, i, 1.0)
            # Full host fetch, not block_until_ready: on the axon
            # relay block_until_ready returns EARLY, so the old timing
            # excluded the device->host result fetch that any real
            # consumer (and the HTTP host) must pay -- which made the
            # HTTP rows look ~30 ms worse than in-process when most of
            # that was the fetch both sides actually share.
            for v in out.values():
                np.asarray(v)
            times.append(time.perf_counter() - t0)
        row = {
            "config": config_name,
            "transport": "in-process",
            "batch": bs,
            "requests": n_requests,
            **_percentiles(times),
            "samples_per_s": bs / float(np.median(times)),
            "artifact_mb": round(os.path.getsize(path) / 2**20, 2),
            "backend": jax.devices()[0].platform,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

        # One HTTP point per config: the hosting overhead (JSON +
        # localhost HTTP + padding) is a per-transport delta, not a
        # per-batch curve, and every server spawn pays a cold remote
        # compile (~4-7 min through the axon relay).
        if http and bs == http_batch:
            try:
                rows.append(
                    _bench_http(
                        path, config_name, bs, n_requests, names
                    )
                )
            except Exception as e:  # one dead server != a dead bench
                rows.append(
                    {
                        "config": config_name,
                        "transport": "http",
                        "batch": bs,
                        "error": repr(e),
                    }
                )
            print(json.dumps(rows[-1]), flush=True)
    return rows


def _bench_http(path, config_name, bs, n_requests, names):
    """Round-trip the same request through tools/serve.py on localhost."""
    import socket
    import subprocess
    import urllib.request

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    import jax

    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(__file__), "serve.py"),
        path, str(port),
    ]
    if jax.devices()[0].platform == "cpu":
        # Keep the server on the SAME backend as the in-process rows
        # it is compared against (the axon sitecustomize would
        # otherwise put the subprocess's artifact on the remote TPU
        # and the "hosting tax" would silently include a relay call).
        cmd += ["--platform", "cpu"]
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        url = f"http://127.0.0.1:{port}/generate"
        cond = {}
        if "label" in names:
            cond = {"label": [0] * bs}
        elif any(n.startswith("attr") for n in names):
            cond = {"attrs": [[0.0] * 18] * bs}
        body = json.dumps(
            {"condition": cond, "seed": 0, "temperature": 1.0}
        ).encode()
        # The server subprocess pays a fresh (remote, on axon) compile
        # of the artifact before its first reply -- measured 4m17s
        # through the relay under load; give cold bring-up real room.
        deadline = time.time() + 900
        warmed = False
        while time.time() < deadline and not warmed:
            try:
                urllib.request.urlopen(
                    urllib.request.Request(
                        url, body, {"Content-Type": "application/json"}
                    ),
                    timeout=900,
                ).read()
                warmed = True
            except (ConnectionError, OSError):
                time.sleep(0.5)
        if not warmed:
            raise RuntimeError(
                f"serve.py never came up for {path} (batch {bs})"
            )
        times = []
        for _ in range(n_requests):
            t0 = time.perf_counter()
            urllib.request.urlopen(
                urllib.request.Request(
                    url, body, {"Content-Type": "application/json"}
                ),
                timeout=300,
            ).read()
            times.append(time.perf_counter() - t0)
        # Binary wire format (round 4): the SAME request as npz arrays
        # in / npz arrays out -- measures what the JSON encode/decode
        # tax was actually costing.
        import io

        buf = io.BytesIO()
        npz_cond = {
            k: np.asarray(v) for k, v in cond.items()
        }
        np.savez(
            buf, seed=np.int64(0), temperature=np.float64(1.0),
            **npz_cond,
        )
        nbody = buf.getvalue()
        nheaders = {
            "Content-Type": "application/x-npz",
            "Accept": "application/x-npz",
        }
        ntimes = []
        for _ in range(n_requests):
            t0 = time.perf_counter()
            urllib.request.urlopen(
                urllib.request.Request(url, nbody, nheaders),
                timeout=300,
            ).read()
            ntimes.append(time.perf_counter() - t0)
        return {
            "config": config_name,
            "transport": "http",
            "batch": bs,
            "requests": n_requests,
            **_percentiles(times),
            "samples_per_s": bs / float(np.median(times)),
            "npz": {
                **_percentiles(ntimes),
                "samples_per_s": bs / float(np.median(ntimes)),
            },
        }
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=None)
    ap.add_argument("--batches", default="1,8,64")
    ap.add_argument("--requests", type=int, default=30)
    ap.add_argument("--http", action="store_true")
    ap.add_argument(
        "--http-batch", type=int, default=8,
        help="the single batch size measured over HTTP (cold server "
        "spawns pay a full remote compile each)",
    )
    ap.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"]
    )
    args = ap.parse_args()
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    configs = args.configs or ["mnist", "celeba"]
    batches = [int(b) for b in args.batches.split(",")]
    all_rows = []
    for c in configs:
        all_rows += bench_artifact(
            c, batches, args.requests, dtype, args.http,
            http_batch=args.http_batch,
        )
    print(json.dumps({"summary": all_rows}))


if __name__ == "__main__":
    main()
