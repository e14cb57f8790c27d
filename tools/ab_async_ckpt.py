"""A/B the checkpoint pipelines at CUB-128 on the v5e (round-5).

Round-3/4 decomposition (BASELINE.md): the CUB-128 epoch is ~2.5 s of
compute+eval, but per-epoch synchronous saves add the ~182 MB state
fetch through the ~10-20 MB/s relay (9-11 s/epoch measured); the
round-4 mitigation was ``ckpt_every=8`` (amortize), which widens the
resume window. Round 5's ``ckpt_async`` overlaps the fetch with
training and coalesces saves the I/O path can't keep up with. This
script measures all three arms under identical conditions and records
per-epoch walls (from the metrics.jsonl eval timestamps -- written
right after each epoch's eval, before the save decision, so the diff
between consecutive epochs charges each epoch with its own save cost)
plus how many checkpoints actually landed.

Run on an IDLE chip (nothing else on the host/relay):
    python tools/ab_async_ckpt.py [--epochs 8] [--out docs/...json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_arm(name: str, epochs: int, extra: list[str]) -> dict:
    wd = f"/tmp/r5_ckpt_ab/{name}"
    shutil.rmtree(wd, ignore_errors=True)
    cmd = [
        sys.executable, "-m", "mmvae_tpu.cli", "train",
        "--config", "cub", "--config-file", "tools/cub128.json",
        "--epochs", str(epochs), "--workdir", wd,
    ] + extra
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO)
    wall = time.time() - t0
    evals, saved, skipped = [], None, None
    with open(os.path.join(wd, "metrics.jsonl")) as f:
        for ln in f:
            rec = json.loads(ln)
            if rec.get("kind") == "eval":
                evals.append(rec)
    if evals and "ckpt_saved" in evals[-1]:
        saved = evals[-1]["ckpt_saved"]
        skipped = evals[-1]["ckpt_skipped"]
    times = [r["time"] for r in evals]
    walls = sorted(b - a for a, b in zip(times, times[1:]))
    ckpt_dir = os.path.join(wd, "ckpt")
    n_ckpt_dirs = (
        len([n for n in os.listdir(ckpt_dir) if n.startswith("last_")])
        if os.path.isdir(ckpt_dir)
        else 0
    )
    return {
        "arm": name,
        "total_wall_s": round(wall, 1),
        # Middle epochs only: epoch 1 carries compiles, the last epoch
        # carries the final sync save by design.
        "epoch_walls_s": [round(w, 2) for w in walls],
        "median_epoch_wall_s": (
            round(walls[len(walls) // 2], 2) if walls else None
        ),
        "ckpt_saved": saved,
        "ckpt_skipped": skipped,
        "test_elbo_final": evals[-1]["test_elbo"] if evals else None,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument(
        "--out", default="docs/experiments/round5_async_ckpt.json"
    )
    args = ap.parse_args()

    arms = [
        ("sync_every1", []),
        ("async_every1", ["--ckpt-async"]),
        ("sync_every8", ["--ckpt-every", "8"]),
    ]
    rows = []
    for name, extra in arms:
        print(f"=== arm {name}", flush=True)
        rows.append(run_arm(name, args.epochs, extra))
        print(json.dumps(rows[-1], indent=2), flush=True)
    out = os.path.join(REPO, args.out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print("AB_ASYNC_CKPT_DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
