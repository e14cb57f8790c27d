"""Per-row-seed artifacts + the serving host's dynamic batcher.

The production claim under test: coalescing concurrent /generate
requests into one device call is EXACT — each request's reply is
bit-identical to the reply it gets served alone — because
``seed_mode="per_row"`` exports (mmvae_tpu/serving.py) make row i's
output a pure function of (row i's data, seed, temperature), not of
batch position or the other rows. The reference has no serving path at
all (SURVEY.md §2.13 is offline sampling); this is rebuild-only
surface, tested to a server-grade bar.
"""

import json
import os
import sys
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from mmvae_tpu import serving
from mmvae_tpu.configs import build_model, get_config
from mmvae_tpu.train import create_train_state

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))
import serve as serve_mod  # noqa: E402


@pytest.fixture(scope="module")
def sampled_artifact(tmp_path_factory):
    """mnist artifact with sample_z=True (z actually consumes the seed),
    per-row seed mode (the default), static batch 4."""
    config = get_config("mnist").replace(n_latents=8)
    model = build_model(config)
    state = create_train_state(
        model, model.dummy_batch(2), jax.random.key(0), 1e-3
    )
    path = str(tmp_path_factory.mktemp("art") / "mnist_rows.mmvaexp")
    serving.export_generate(
        config, path, batch_size=4, params=state.params, model=model,
        platforms=("cpu",), sample_z=True,
    )
    return path


def _row_request(call, meta, label, seed):
    """Single-row condition padded to the artifact's static batch."""
    bs = int(meta["batch_size"])
    shapes = {
        k: (tuple(v[0]), np.dtype(v[1]))
        for k, v in meta["batch_shapes"].items()
    }
    batch = {k: np.zeros((bs,) + shp[1:], dt) for k, (shp, dt) in shapes.items()}
    batch["label"][0] = label
    presence = np.zeros((bs, len(meta["modalities"])), np.float32)
    presence[0, meta["modalities"].index("label")] = 1.0
    seeds = np.zeros((bs,), np.int32)
    seeds[0] = seed
    out = call(batch, presence, seed=seeds)
    return {k: np.asarray(v)[0] for k, v in out.items()}


def test_per_row_seed_position_invariance(sampled_artifact):
    """Row outputs must not depend on batch position or neighbors —
    the property that makes request coalescing exact."""
    meta, call = serving.load_generate(sampled_artifact)
    assert meta["seed_mode"] == "per_row"

    shapes = {
        k: (tuple(v[0]), np.dtype(v[1]))
        for k, v in meta["batch_shapes"].items()
    }
    bs = int(meta["batch_size"])
    n_mod = len(meta["modalities"])
    li = meta["modalities"].index("label")

    def run(labels, seeds):
        batch = {
            k: np.zeros((bs,) + shp[1:], dt)
            for k, (shp, dt) in shapes.items()
        }
        batch["label"][: len(labels)] = labels
        presence = np.zeros((bs, n_mod), np.float32)
        presence[: len(labels), li] = 1.0
        s = np.zeros((bs,), np.int32)
        s[: len(seeds)] = seeds
        return {
            k: np.asarray(v)
            for k, v in call(batch, presence, seed=s).items()
        }

    a = run([3, 7], [11, 22])
    b = run([7, 3, 9], [22, 11, 5])  # swapped + a stranger row
    np.testing.assert_array_equal(a["image"][0], b["image"][1])
    np.testing.assert_array_equal(a["image"][1], b["image"][0])
    # Different seeds genuinely differ (sample_z consumed the seed).
    assert not np.array_equal(a["image"][0], run([3, 7], [99, 22])["image"][0])


def test_scalar_seed_expands_to_arange(sampled_artifact):
    meta, call = serving.load_generate(sampled_artifact)
    model = build_model(get_config("mnist").replace(n_latents=8))
    batch = {k: np.asarray(v) for k, v in model.dummy_batch(4).items()}
    presence = np.zeros((4, 2), np.float32)
    out_scalar = call(batch, presence, seed=7)
    out_rows = call(batch, presence, seed=7 + np.arange(4, dtype=np.int32))
    np.testing.assert_array_equal(
        np.asarray(out_scalar["image"]), np.asarray(out_rows["image"])
    )
    # And distinct rows got distinct draws (same zero data, seeds differ).
    img = np.asarray(out_scalar["image"])
    assert not np.array_equal(img[0], img[1])


def _post(port, body, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/{path}", timeout=30
    ) as r:
        return json.loads(r.read())


def test_batcher_coalesces_exactly(sampled_artifact):
    """Concurrent requests share one device call, and every reply is
    identical to the sequential (one-call-per-request) reply."""
    server, meta, batcher = serve_mod.make_server(
        sampled_artifact, 0, max_wait_ms=250.0
    )
    assert batcher is not None
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        bodies = [
            {"condition": {"label": [i]}, "seed": 100 + i}
            for i in range(4)
        ]
        # Sequential: spaced out, each its own device call.
        solo = [_post(port, b) for b in bodies]
        calls_before = _get(port, "stats")["device_calls"]

        results = [None] * 4
        barrier = threading.Barrier(4)

        def fire(i):
            barrier.wait()
            results[i] = _post(port, bodies[i])

        threads = [
            threading.Thread(target=fire, args=(i,)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)

        stats = _get(port, "stats")
        concurrent_calls = stats["device_calls"] - calls_before
        assert concurrent_calls < 4, stats  # something coalesced
        assert stats["coalesced_calls"] >= 1, stats
        for got, want in zip(results, solo):
            assert got["n"] == want["n"] == 1
            np.testing.assert_array_equal(
                np.asarray(got["outputs"]["image"]),
                np.asarray(want["outputs"]["image"]),
            )
            np.testing.assert_array_equal(
                np.asarray(got["outputs"]["label"]),
                np.asarray(want["outputs"]["label"]),
            )
    finally:
        server.shutdown()


def test_batcher_splits_temperature_groups(sampled_artifact):
    """Temperature is a whole-call scalar: mixed-temperature requests
    must land in separate device calls, both still correct."""
    server, meta, batcher = serve_mod.make_server(
        sampled_artifact, 0, max_wait_ms=250.0
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        bodies = [
            {"condition": {"label": [1]}, "seed": 5, "temperature": 1.0},
            {"condition": {"label": [2]}, "seed": 6, "temperature": 0.5},
        ]
        solo = [_post(port, b) for b in bodies]
        results = [None, None]
        barrier = threading.Barrier(2)

        def fire(i):
            barrier.wait()
            results[i] = _post(port, bodies[i])

        threads = [
            threading.Thread(target=fire, args=(i,)) for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for got, want in zip(results, solo):
            np.testing.assert_array_equal(
                np.asarray(got["outputs"]["image"]),
                np.asarray(want["outputs"]["image"]),
            )
    finally:
        server.shutdown()


def test_scalar_seed_artifact_serves_unbatched(tmp_path):
    """Legacy scalar-seed artifacts still serve — one request per call,
    /stats reports batching off (coalescing would change their draws)."""
    config = get_config("mnist").replace(n_latents=8)
    model = build_model(config)
    state = create_train_state(
        model, model.dummy_batch(2), jax.random.key(0), 1e-3
    )
    path = str(tmp_path / "legacy.mmvaexp")
    serving.export_generate(
        config, path, batch_size=2, params=state.params, model=model,
        platforms=("cpu",), seed_mode="scalar",
    )
    meta, _ = serving.load_generate(path)
    assert meta["seed_mode"] == "scalar"
    server, meta, batcher = serve_mod.make_server(path, 0)
    assert batcher is None
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        assert _get(port, "stats") == {"batching": "off"}
        out = _post(port, {"condition": {"label": [4]}, "seed": 0})
        assert out["n"] == 1
        assert np.asarray(out["outputs"]["image"]).shape == (1, 28, 28)
    finally:
        server.shutdown()


def test_bucket_alloc():
    """Dynamic-artifact coalescing pads to power-of-two buckets to bound
    the compile count."""
    b = serve_mod.Batcher(
        lambda *a, **k: None, {}, 2, static_batch=None, max_batch=64
    )
    assert [b._alloc(n) for n in (1, 2, 3, 5, 9, 64)] == [1, 2, 4, 8, 16, 64]
    assert b._alloc(100) == 100  # oversize single request: no bucket


def test_npz_wire_format_matches_json(sampled_artifact):
    """The binary npz wire format (round-4 VERDICT #8) is pure
    transport: same validation, same batcher, outputs BIT-IDENTICAL to
    the JSON format for the same request; JSON-in can ask for npz-out
    via Accept and vice versa."""
    import io

    server, meta, batcher = serve_mod.make_server(
        sampled_artifact, 0, max_wait_ms=1.0
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = {"condition": {"label": [3, 5]}, "seed": 9}
        js = _post(port, body)

        buf = io.BytesIO()
        np.savez(
            buf,
            label=np.asarray([3, 5], np.int32),
            seed=np.int64(9),
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=buf.getvalue(),
            headers={"Content-Type": "application/x-npz"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "application/x-npz"
            with np.load(io.BytesIO(r.read())) as z:
                npz_out = {k: z[k] for k in z.files}
        assert int(npz_out.pop("n")) == js["n"]
        assert set(npz_out) == set(js["outputs"])
        for k, v in js["outputs"].items():
            np.testing.assert_array_equal(
                np.asarray(v, npz_out[k].dtype), npz_out[k]
            )

        # JSON body + Accept: npz -> binary reply of the same rows.
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(body).encode(),
            headers={
                "Content-Type": "application/json",
                "Accept": "application/x-npz",
            },
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            with np.load(io.BytesIO(r.read())) as z:
                mixed = {k: z[k] for k in z.files}
        for k in npz_out:
            np.testing.assert_array_equal(mixed[k], npz_out[k])

        # npz body + Accept: json -> JSON reply.
        buf.seek(0)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=buf.getvalue(),
            headers={
                "Content-Type": "application/x-npz",
                "Accept": "application/json",
            },
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            js2 = json.loads(r.read())
        assert js2["outputs"].keys() == js["outputs"].keys()
        for k in js["outputs"]:
            np.testing.assert_array_equal(
                np.asarray(js2["outputs"][k]), np.asarray(js["outputs"][k])
            )

        # A corrupt npz body is a 400, not a 500.
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=b"PK\x03\x04 garbage",
            headers={"Content-Type": "application/x-npz"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("corrupt npz accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()
