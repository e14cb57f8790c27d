"""A/B: pixel-shuffle decoder (upsample_mode="shuffle") vs the
reference-shaped 4x4/2 transposed-conv stack on the CelebA bench points.

Motivation (DESIGN.md section 10): the bf16 trace shows a tail of
HBM<->scratch weight copies around the 4x4 deconv kernels, and the
roofline brackets ~2.9x headroom on the bf16 point. CPU cost analysis
(2026-08-18) already narrows the hypothesis: XLA charges the lhs-dilated
ConvTranspose the SAME flops as the dense shuffle form (1.035e11 vs
1.039e11 per step) and the shuffle form reads/writes MORE bytes (+13%,
the depth-to-space transposes) -- so this is a layout/emitter bet, not a
flop win. Run on the real chip; promote only if it beats the deconv
number.

Usage: python tools/ab_upsample.py [out.json]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")
import bench  # noqa: E402

POINTS = [
    # the headline bf16 best-achievable point
    dict(dtype="bfloat16", batch=256, data_dtype="bfloat16"),
    # the reference-comparable f32 point
    dict(dtype="float32", batch=64),
]


def main() -> None:
    results = []
    for point in POINTS:
        for mode in ("deconv", "shuffle"):
            r = bench.measure_jax_celeba(upsample_mode=mode, **point)
            r["upsample_mode"] = mode
            results.append(r)
            print(json.dumps(r), flush=True)
    # capacity probe: does the bf16 point gain from a larger batch with
    # whichever mode won? (HBM-capacity bounded; may OOM -- report it.)
    best_mode = max(
        (r for r in results if r["dtype"] == "bfloat16"),
        key=lambda r: r["samples_per_sec"],
    )["upsample_mode"]
    try:
        r = bench.measure_jax_celeba(
            dtype="bfloat16", batch=512, data_dtype="bfloat16",
            upsample_mode=best_mode,
        )
        r["upsample_mode"] = best_mode
        results.append(r)
        print(json.dumps(r), flush=True)
    except Exception as e:  # OOM is an expected, reportable outcome
        print(json.dumps({"batch": 512, "error": repr(e)[:200]}), flush=True)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
