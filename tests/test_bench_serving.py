"""Smoke for tools/bench_serving.py: the serving-latency bench must run
the in-process path end to end on CPU and produce well-formed rows
(the BASELINE.md serving table is generated from these)."""

import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


def test_bench_artifact_rows_well_formed():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_serving",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)),
            "tools",
            "bench_serving.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rows = mod.bench_artifact(
        "mnist", [2], n_requests=3, dtype=jnp.float32, http=False
    )
    assert len(rows) == 1
    (row,) = rows
    assert row["config"] == "mnist"
    assert row["transport"] == "in-process"
    assert row["batch"] == 2
    assert row["p50_ms"] > 0
    assert row["p50_ms"] <= row["p95_ms"] <= row["max_ms"]
    assert row["samples_per_s"] > 0
    assert row["artifact_mb"] > 0
