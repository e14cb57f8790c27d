"""Serving host for an exported generation artifact, with dynamic batching.

    python tools/serve.py model.mmvaexp [port] [--max-batch 64]
                          [--max-wait-ms 5] [--no-batch]

Loads a ``cli export`` artifact (mmvae_tpu/serving.py) and serves it
over HTTP with no dependencies beyond the stdlib + jax:

  GET  /meta      -> the artifact's JSON interface header
  GET  /stats     -> batching counters (requests, device calls, rows)
  POST /generate  -> body {"condition": {<modality>: [...], ...},
                           "seed": 0, "temperature": 1.0}
                     -> {"outputs": {<modality>: nested lists}}

Wire formats: JSON (above) or BINARY npz (round 4 -- the ~30ms/request
JSON encode/decode tax at batch 8 was ~2x the in-process p50,
BASELINE.md serving table). An npz POST body (detected by the zip
magic or ``Content-Type: application/x-npz``) carries each condition
modality as an array plus optional 0-d ``seed``/``temperature``; the
reply is an npz of output arrays + ``n`` whenever the request was npz
(or ``Accept: application/x-npz`` says so), JSON otherwise. Same
validation, same batcher, bit-identical outputs across formats
(tests/test_serving_batch.py).

Conditioning semantics match ``api.generate``: modalities present in
``condition`` are observed (their expert enters the PoE fusion); absent
ones are generated. Requests are padded to the artifact's fixed batch
size (AOT = static shapes) and the padding is stripped from the reply.

Dynamic batching: concurrent requests are coalesced into ONE device
call (up to the artifact's static batch, or ``--max-batch`` rows for a
batch-polymorphic artifact, waiting at most ``--max-wait-ms`` for
stragglers). Coalescing is EXACT — bit-identical to serving each
request alone — because ``seed_mode="per_row"`` artifacts make row i's
output a pure function of row i's (data, seed, temperature), not of its
batch position (mmvae_tpu/serving.py::make_generate_fn). A request with
scalar seed s and n rows uses row seeds s..s+n-1, the same expansion
``load_generate`` applies, so solo and coalesced replies agree.
Requests only coalesce with equal ``temperature`` (it is a whole-call
scalar). Legacy scalar-seed artifacts serve one request per call
(coalescing would change their draws); /stats says which mode is live.

This is intentionally a thin host -- the point is that the *artifact*
carries the whole model (params + program), so a real deployment can
embed the same ``load_generate`` call in any stack.
"""

from __future__ import annotations

import argparse
import json
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _npz_payload(raw: bytes) -> dict:
    """npz request body -> the same payload dict the JSON path builds.

    Arrays named after modalities are the condition; optional 0-d
    ``seed`` / ``temperature`` arrays are the scalars. The npz layer is
    pure transport — parse_rows applies the identical validation, so
    the two wire formats cannot drift.

    RESERVED NAMES: ``seed`` and ``temperature`` in requests, ``n`` in
    replies. A model family whose modality uses one of these names
    could not ride the npz format (the JSON format has no such
    collision — its condition lives under its own key); none of the
    current families does, and ``make_server`` refuses to start
    batching-enabled hosts for one rather than mis-parse requests."""
    import io

    try:
        with np.load(io.BytesIO(raw), allow_pickle=False) as z:
            files = {k: z[k] for k in z.files}
    except Exception as e:
        raise ClientError(f"bad npz body: {e}") from e
    payload = {}
    if "seed" in files:
        payload["seed"] = int(files.pop("seed"))
    if "temperature" in files:
        payload["temperature"] = float(files.pop("temperature"))
    payload["condition"] = files
    return payload


class ClientError(ValueError):
    """Malformed request (bad payload shape/keys) — maps to HTTP 400.

    Raised ONLY by request parsing; backend failures (wrong platform
    for the artifact, OOM, device errors) raise whatever they raise and
    map to 500 — classifying by exception TYPE at the handler level
    misfiled e.g. jax.export's platform-mismatch ValueError as a client
    error."""


class _Item:
    __slots__ = ("batch", "presence", "seeds", "temperature", "n",
                 "event", "out", "error")

    def __init__(self, batch, presence, seeds, temperature, n):
        self.batch = batch
        self.presence = presence
        self.seeds = seeds
        self.temperature = temperature
        self.n = n
        self.event = threading.Event()
        self.out = None
        self.error = None


class Batcher:
    """Coalesce concurrent requests into one artifact call.

    Correctness contract: only used with ``seed_mode="per_row"``
    artifacts, whose rows are position-independent, so splitting a
    coalesced call's outputs back per request is exact.
    """

    def __init__(self, call, shapes, n_modalities, *, static_batch,
                 max_batch=64, max_wait_ms=5.0):
        self.call = call
        self.shapes = shapes
        self.n_modalities = n_modalities
        self.static_batch = static_batch  # None for dynamic artifacts
        self.max_batch = static_batch or max_batch
        self.max_wait = max_wait_ms / 1e3
        self.q: queue.Queue[_Item] = queue.Queue()
        self.stats = {
            "requests": 0, "device_calls": 0, "rows": 0,
            "padded_rows": 0, "coalesced_calls": 0,
        }
        self._lock = threading.Lock()
        threading.Thread(target=self._worker, daemon=True).start()

    def submit(self, batch, presence, seeds, temperature, n):
        """Blocking: returns per-row outputs for this request's n rows."""
        with self._lock:
            self.stats["requests"] += 1
            self.stats["rows"] += n
        item = _Item(batch, presence, seeds, temperature, n)
        self.q.put(item)
        item.event.wait()
        if item.error is not None:
            raise item.error
        return item.out

    def _alloc(self, total):
        if self.static_batch:
            return self.static_batch
        # Dynamic artifact: every distinct shape is a fresh compile, so
        # round up to a power-of-two bucket to bound the program count.
        b = 1
        while b < total:
            b *= 2
        return min(b, self.max_batch) if total <= self.max_batch else total

    def _worker(self):
        pending = None
        while True:
            first = pending if pending is not None else self.q.get()
            pending = None
            group, total = [first], first.n
            deadline = time.monotonic() + self.max_wait
            while total < self.max_batch:
                timeout = deadline - time.monotonic()
                try:
                    nxt = (self.q.get(timeout=timeout) if timeout > 0
                           else self.q.get_nowait())
                except queue.Empty:
                    break
                if (nxt.temperature != first.temperature
                        or total + nxt.n > self.max_batch):
                    pending = nxt  # next cycle leads with it
                    break
                group.append(nxt)
                total += nxt.n
            self._run(group, total)

    def _run(self, group, total):
        alloc = self._alloc(total)
        try:
            batch = {
                k: np.zeros((alloc,) + shp[1:], dt)
                for k, (shp, dt) in self.shapes.items()
            }
            presence = np.zeros((alloc, self.n_modalities), np.float32)
            seeds = np.zeros((alloc,), np.int32)
            off = 0
            for it in group:
                for k, v in it.batch.items():
                    batch[k][off:off + it.n] = v
                presence[off:off + it.n] = it.presence
                seeds[off:off + it.n] = it.seeds
                off += it.n
            out = self.call(
                batch, presence, seed=seeds,
                temperature=group[0].temperature,
            )
            out = {k: np.asarray(v) for k, v in out.items()}
            with self._lock:
                self.stats["device_calls"] += 1
                self.stats["padded_rows"] += alloc - total
                if len(group) > 1:
                    self.stats["coalesced_calls"] += 1
            off = 0
            for it in group:
                it.out = {k: v[off:off + it.n] for k, v in out.items()}
                off += it.n
            # Wake waiters only after EVERY item's output is assigned:
            # setting events inside the loop opens a race where a later
            # item's slicing error re-marks an already-woken item as
            # failed (or a waiter reads a half-split group).
            for it in group:
                it.event.set()
        except Exception as e:  # noqa: BLE001 — surface to every waiter
            for it in group:
                if not it.event.is_set():
                    it.error = e
                    it.event.set()


def make_handler(meta, call, batcher=None):
    dynamic = meta["batch_size"] == "dynamic"
    batch_size = None if dynamic else int(meta["batch_size"])
    per_row = meta.get("seed_mode", "scalar") == "per_row"
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

    def parse_rows(payload):
        """Request body -> (n, row arrays, presence rows, seeds, temp)."""
        if not isinstance(payload, dict):
            raise ClientError("request body must be a JSON object")
        cond = payload.get("condition", {}) or {}
        if not isinstance(cond, dict):
            raise ClientError("'condition' must map modality -> rows")
        unknown = set(cond) - set(shapes) - set(column_of)
        if unknown:
            raise ClientError(
                f"unknown modalities {sorted(unknown)}; have "
                f"{sorted(set(shapes) | set(column_of))}"
            )
        try:
            lengths = {k: len(v) for k, v in cond.items()}
        except TypeError as e:
            raise ClientError(f"condition rows must be arrays: {e}")
        if len(set(lengths.values())) > 1:
            raise ClientError(
                f"condition modalities disagree on batch size: {lengths}"
            )
        n = next(iter(lengths.values()), batch_size or 1)
        if not dynamic and n > batch_size:
            raise ClientError(
                f"request batch {n} exceeds the artifact's static "
                f"batch size {batch_size} (export with "
                f"--batch-size-export dynamic for arbitrary sizes)"
            )
        batch = {
            k: np.zeros((n,) + shp[1:], dt)
            for k, (shp, dt) in shapes.items()
        }
        presence = np.zeros((n, len(modalities)), np.float32)
        idx = {m: i for i, m in enumerate(modalities)}
        try:
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
            seed = int(payload.get("seed", 0))
            # Same expansion load_generate applies to a scalar seed, so
            # a coalesced reply is bit-identical to the solo reply.
            seeds = seed + np.arange(n, dtype=np.int32)
            temperature = float(payload.get("temperature", 1.0))
        except (ValueError, TypeError) as e:
            # Wrong row shapes/dtypes, non-numeric seed/temperature.
            raise ClientError(str(e)) from e
        return n, batch, presence, seeds, temperature

    def run_generate_arrays(payload):
        """Request payload -> ({modality: (n, ...) ndarray}, n).

        The array core shared by both wire formats; JSON pays its
        ``tolist`` tax and npz its ``savez`` on top of this."""
        n, batch, presence, seeds, temperature = parse_rows(payload)
        if batcher is not None:
            rows = batcher.submit(batch, presence, seeds, temperature, n)
            return rows, n
        # No batcher (legacy scalar-seed artifact): one call per
        # request, padded to the static batch when the artifact is
        # fixed-shape.
        alloc = n if dynamic else batch_size
        if alloc != n:
            batch = {
                k: np.concatenate(
                    [v, np.zeros((alloc - n,) + v.shape[1:], v.dtype)]
                )
                for k, v in batch.items()
            }
            presence = np.concatenate(
                [presence,
                 np.zeros((alloc - n, len(modalities)), np.float32)]
            )
            seeds = np.concatenate(
                [seeds, np.zeros((alloc - n,), np.int32)]
            )
        out = call(
            batch, presence,
            seed=seeds if per_row else int(payload.get("seed", 0)),
            temperature=temperature,
        )
        return {k: np.asarray(v)[:n] for k, v in out.items()}, n

    def run_generate(payload):
        rows, n = run_generate_arrays(payload)
        return {
            "outputs": {k: np.asarray(v).tolist() for k, v in rows.items()},
            "n": n,
        }

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive (Content-Length is always set below) and
        # no Nagle: the round-4 wire-format bench found a ~50 ms
        # constant per-request tax on localhost that was mostly TCP
        # behavior (Nagle x delayed-ACK on the split header/body
        # writes + a fresh connection per request), not serialization.
        protocol_version = "HTTP/1.1"
        disable_nagle_algorithm = True
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
            elif self.path == "/stats":
                if batcher is None:
                    self._reply(200, {"batching": "off"})
                else:
                    with batcher._lock:
                        self._reply(
                            200, {"batching": "on", **batcher.stats}
                        )
            else:
                self._reply(404, {"error": "unknown path"})

        def _reply_npz(self, rows, n):
            import io

            buf = io.BytesIO()
            np.savez(buf, n=np.int64(n), **rows)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-npz")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    raw = self.rfile.read(length)
                    # Binary wire format (round-4 VERDICT #8): an npz
                    # body (zip magic / x-npz content type) carries
                    # condition arrays + scalar seed/temperature;
                    # detection by magic keeps curl-with-JSON working
                    # with no headers. ~30 ms/request of JSON
                    # encode/decode at batch 8 goes away (BASELINE.md
                    # serving table).
                    is_npz = raw[:2] == b"PK" or "npz" in (
                        self.headers.get("Content-Type") or ""
                    )
                    if is_npz:
                        payload = _npz_payload(raw)
                    else:
                        payload = json.loads(raw or b"{}")
                except ClientError:
                    raise
                except (ValueError, TypeError) as e:
                    raise ClientError(f"bad request body: {e}") from e
                accept = self.headers.get("Accept") or ""
                want_npz = "npz" in accept or (
                    is_npz and "json" not in accept
                )
                if want_npz:
                    rows, n = run_generate_arrays(payload)
                    self._reply_npz(rows, n)
                else:
                    self._reply(200, run_generate(payload))
            except ClientError as e:
                # Malformed request (bad JSON, unknown modality,
                # inconsistent batch, wrong row shapes) -> 400. Only
                # parsing raises ClientError -- classifying by builtin
                # exception TYPE here misfiled backend ValueErrors
                # (e.g. jax.export platform mismatch) as client errors.
                self._reply(400, {"error": str(e)})
            except Exception as e:
                # Anything else (backend failure, OOM, wrong platform
                # for the artifact) is a SERVER error -- don't tell the
                # client their request was bad.
                self._reply(500, {"error": str(e)})

        def log_message(self, fmt, *args):  # quiet default logging
            pass

    return Handler


def make_server(path, port, *, max_batch=64, max_wait_ms=5.0,
                batching=True):
    """Build (server, meta, batcher) for an artifact — test hook."""
    from mmvae_tpu.serving import load_generate

    meta, call = load_generate(path)
    reserved = {"seed", "temperature", "n"} & (
        set(meta.get("modalities", []))
        | set(meta.get("batch_shapes", {}))
    )
    if reserved:
        # Fail loudly at startup rather than silently consuming a
        # modality named 'seed' as the RNG scalar on npz requests.
        raise ValueError(
            f"modality names {sorted(reserved)} collide with the npz "
            "wire format's reserved names (seed/temperature/n); "
            "rename the modality or serve JSON-only"
        )
    batcher = None
    if batching and meta.get("seed_mode", "scalar") == "per_row":
        shapes = {
            k: (tuple(v[0]), np.dtype(v[1]))
            for k, v in meta["batch_shapes"].items()
        }
        dynamic = meta["batch_size"] == "dynamic"
        batcher = Batcher(
            call, shapes, len(meta["modalities"]),
            static_batch=None if dynamic else int(meta["batch_size"]),
            max_batch=max_batch, max_wait_ms=max_wait_ms,
        )
    server = ThreadingHTTPServer(
        ("127.0.0.1", port), make_handler(meta, call, batcher)
    )
    return server, meta, batcher


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("port", nargs="?", type=int, default=8901)
    ap.add_argument("--max-batch", type=int, default=64,
                    help="coalescing cap for dynamic artifacts "
                    "(fixed-shape artifacts cap at their static batch)")
    ap.add_argument("--max-wait-ms", type=float, default=5.0,
                    help="how long a request waits for co-batchers")
    ap.add_argument("--no-batch", action="store_true",
                    help="serve one request per device call")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) BEFORE the "
                    "artifact loads -- the axon sitecustomize pins "
                    "jax_platforms=axon,cpu via jax.config, so the "
                    "JAX_PLATFORMS env var alone cannot keep a "
                    "CPU-exported artifact off the remote TPU")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    server, meta, batcher = make_server(
        args.artifact, args.port, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, batching=not args.no_batch,
    )
    print(
        json.dumps(
            {
                "serving": args.artifact,
                "port": args.port,
                "config": meta["config"],
                "batching": "on" if batcher is not None else "off",
            }
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
