"""Minimal serving host for an exported generation artifact.

    python tools/serve.py model.mmvaexp [port]

Loads a ``cli export`` artifact (mmvae_tpu/serving.py) and serves it
over HTTP with no dependencies beyond the stdlib + jax:

  GET  /meta      -> the artifact's JSON interface header
  POST /generate  -> body {"condition": {<modality>: [...], ...},
                           "seed": 0, "temperature": 1.0}
                     -> {"outputs": {<modality>: nested lists}}

Conditioning semantics match ``api.generate``: modalities present in
``condition`` are observed (their expert enters the PoE fusion); absent
ones are generated. Requests are padded to the artifact's fixed batch
size (AOT = static shapes) and the padding is stripped from the reply.

This is intentionally the thinnest possible host -- the point is that
the *artifact* carries the whole model (params + program), so a real
deployment can embed the same ``load_generate`` call in any stack.
"""

from __future__ import annotations

import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_handler(meta, call):
    dynamic = meta["batch_size"] == "dynamic"
    batch_size = None if dynamic else int(meta["batch_size"])
    modalities = list(meta["modalities"])
    shapes = {
        k: (tuple(v[0]), np.dtype(v[1]))
        for k, v in meta["batch_shapes"].items()
    }
    # batch key -> expert names it feeds (older artifacts: 1:1). A
    # stacked key like CelebA's "attrs" observes all its experts; its
    # per-column expert names ("attr_3") are ALSO accepted as condition
    # keys, writing one column + one presence bit (api.generate parity).
    groups = meta.get(
        "batch_modalities", {m: [m] for m in modalities if m in shapes}
    )
    column_of = {
        name: (bkey, j)
        for bkey, names in groups.items()
        if len(names) > 1
        for j, name in enumerate(names)
    }

    def run_generate(payload):
        cond = payload.get("condition", {}) or {}
        unknown = set(cond) - set(shapes) - set(column_of)
        if unknown:
            raise ValueError(
                f"unknown modalities {sorted(unknown)}; have "
                f"{sorted(set(shapes) | set(column_of))}"
            )
        lengths = {k: len(v) for k, v in cond.items()}
        if len(set(lengths.values())) > 1:
            raise ValueError(
                f"condition modalities disagree on batch size: {lengths}"
            )
        n = next(iter(lengths.values()), batch_size or 1)
        if not dynamic and n > batch_size:
            raise ValueError(
                f"request batch {n} exceeds the artifact's static "
                f"batch size {batch_size} (export with "
                f"--batch-size-export dynamic for arbitrary sizes)"
            )
        # Dynamic artifacts run at the request size (no padding);
        # fixed-size artifacts pad to their static batch.
        alloc = n if dynamic else batch_size
        batch = {
            k: np.zeros((alloc,) + shp[1:], dt)
            for k, (shp, dt) in shapes.items()
        }
        presence = np.zeros((alloc, len(modalities)), np.float32)
        idx = {m: i for i, m in enumerate(modalities)}
        for key, value in cond.items():
            if key in column_of:
                bkey, col = column_of[key]
                arr = np.asarray(value, shapes[bkey][1])
                batch[bkey][: len(arr), col] = arr
                presence[: len(arr), idx[key]] = 1.0
                continue
            arr = np.asarray(value, shapes[key][1])
            batch[key][: len(arr)] = arr
            for name in groups.get(key, []):
                presence[: len(arr), idx[name]] = 1.0
        out = call(
            batch,
            presence,
            seed=int(payload.get("seed", 0)),
            temperature=float(payload.get("temperature", 1.0)),
        )
        return {
            "outputs": {
                k: np.asarray(v)[:n].tolist() for k, v in out.items()
            },
            "n": n,
        }

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/meta":
                self._reply(200, meta)
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                self._reply(200, run_generate(payload))
            except (ValueError, KeyError, TypeError) as e:
                # Malformed request (bad JSON, unknown modality,
                # inconsistent batch) -> client error.
                self._reply(400, {"error": str(e)})
            except Exception as e:
                # Anything else (backend failure, OOM, wrong platform
                # for the artifact) is a SERVER error -- don't tell the
                # client their request was bad.
                self._reply(500, {"error": str(e)})

        def log_message(self, fmt, *args):  # quiet default logging
            pass

    return Handler


def main() -> int:
    from mmvae_tpu.serving import load_generate

    path = sys.argv[1]
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8901
    meta, call = load_generate(path)
    server = ThreadingHTTPServer(
        ("127.0.0.1", port), make_handler(meta, call)
    )
    print(
        json.dumps(
            {"serving": path, "port": port, "config": meta["config"]}
        ),
        flush=True,
    )
    server.serve_forever()
    return 0


if __name__ == "__main__":
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sys.exit(main())
