"""Analytic per-layer roofline for the CelebA MVAE train step on v5e.

Question (round-3 known gap): CelebA measures 84% MFU at f32 but only
27% at bf16 -- is the bf16 number a defect (fixable layout/transpose
overhead) or the architecture's shape-limited ceiling?

Model: each layer runs at ``time = max(flops / mxu_peak, bytes / hbm_bw)``
(MXU roofline with the public v5e numbers: 197 TFLOP/s bf16, f32 at 1/4
rate, 819 GB/s HBM). Under-filled MXU tiles derate the per-layer peak:
a contraction with K reduction rows and N output lanes runs at most
``(K / ceil128(K)) * (N / ceil128(N))`` of peak (the 128x128 systolic
array processes whole tiles). Bytes count each tensor once (XLA fuses
elementwise chains, so activations stream through a layer one time);
the backward pass is approximated as 2x the forward flops and bytes
(dX and dW each re-read the layer operands) -- coarse, but the same
approximation at both precisions, so the f32/bf16 CONTRAST is what to
trust, anchored on the measured f32 point.

Findings (2026-08-18, this model): the two variants BRACKET the chip.

  * pure roofline (no tile derating): predicts 73% MFU f32 / 53% bf16
    (13.8k / 40.3k samples/s) -- measured f32 (84%, 10.8k) sits at the
    model's error level; measured bf16 (27%, 13.9k) has ~2.9x headroom
    to this bound.
  * naive 128x128 tile derating (--tile-derate): predicts 18% MFU at
    BOTH precisions -- far below the measured f32, i.e. XLA's conv
    emitters do NOT pay naive per-channel tile padding at the f32 rate.

Measured bf16 (27%) falls between the brackets: consistent with the
thin-channel image-resolution stages paying PARTIAL tile-padding /
layout costs that only bind once the MXU runs at the 4x bf16 rate.
Round-4 implication: the lever space is real but bounded (analytic
ceiling ~2.9x samples/s with a long HBM-bound tail: enc_conv0/1,
dec_deconv3, and the BCE/KL elementwise pass are bandwidth-bound at
bf16 in every variant); the measured space-to-depth attack (-3.4%,
DESIGN.md section 10) targeted the right stages with the wrong
rearrangement.

Pure arithmetic -- runs anywhere, no jax needed.
"""

from __future__ import annotations

import json
import math

MXU_BF16 = 197.0e12
MXU_F32 = 49.2e12
HBM_BW = 819.0e9

B = 256  # the bf16 best-point batch
HW = 64
FEATS = (32, 64, 128, 256)
N_LAT = 100
N_TERMS = 24  # joint + 19 unimodal + 4 random subsets
# The decode+NLL pass runs term-folded: effective decoder batch is
# B * N_TERMS; encoders run once per example.
DEC_B = B * N_TERMS


def ceil_to(x: int, q: int) -> int:
    return int(math.ceil(x / q) * q)


def tile_eff(k: int, n: int) -> float:
    """MXU tile fill: contraction rows K x output lanes N, 128x128.

    NOTE: empirically too pessimistic for XLA's conv lowering -- with
    this derating the model predicts 18% f32 MFU where the chip
    measures 84%, i.e. XLA does NOT pay naive per-channel tile padding
    on convs (its conv emitters re-block across spatial/kernel dims).
    The default prediction therefore runs with derating OFF (pure
    compute/bandwidth roofline); pass --tile-derate to see the naive
    bound."""
    if not DERATE:
        return 1.0
    return (k / ceil_to(k, 128)) * (n / ceil_to(n, 128))


DERATE = False


def conv_layer(name, b, h_out, w_out, c_in, c_out, k, bytes_per, extra_read=0.0):
    """One conv as implicit GEMM: M=b*h*w, K=c_in*k^2, N=c_out."""
    m = b * h_out * w_out
    kk = c_in * k * k
    flops = 2.0 * m * kk * c_out
    # activations in (at input res ~ stride^2 * h_out*w_out * c_in),
    # activations out, weights.
    act_in = b * (h_out * 2) * (w_out * 2) * c_in if extra_read == 0 else extra_read
    bytes_ = (act_in + m * c_out + kk * c_out) * bytes_per
    return dict(name=name, flops=flops, bytes=bytes_,
                eff=tile_eff(kk, c_out))


def dense_layer(name, b, d_in, d_out, bytes_per):
    flops = 2.0 * b * d_in * d_out
    bytes_ = (b * d_in + b * d_out + d_in * d_out) * bytes_per
    return dict(name=name, flops=flops, bytes=bytes_,
                eff=tile_eff(d_in, d_out))


def layers(bytes_per):
    out = []
    # --- image encoder (runs once per example) ---
    h = HW
    c_in = 3
    for i, c in enumerate(FEATS):
        h //= 2
        out.append(conv_layer(f"enc_conv{i} {c_in}->{c}@{h}", B, h, h,
                              c_in, c, 3, bytes_per))
        c_in = c
    flat = (HW // 2 ** len(FEATS)) ** 2 * FEATS[-1]  # 4*4*256
    out.append(dense_layer("enc_dense0", B, flat, 512, bytes_per))
    out.append(dense_layer("enc_dense1", B, 512, 2 * N_LAT, bytes_per))
    # --- attr encoder bank: 18 tiny einsums, VPU-scale; count as
    # bandwidth-only (flops negligible) ---
    out.append(dict(name="attr_enc_bank", flops=2.0 * B * 18 * 64 * 64 * 2,
                    bytes=(B * 18 * 64 * 3) * bytes_per, eff=tile_eff(64, 64)))
    # --- image decoder (term-folded batch) ---
    out.append(dense_layer("dec_dense0", DEC_B, N_LAT, 512, bytes_per))
    out.append(dense_layer("dec_dense1", DEC_B, 512, flat, bytes_per))
    h = HW // 2 ** len(FEATS)
    c_in = FEATS[-1]
    for i, c in enumerate(tuple(reversed(FEATS))[1:] + (3,)):
        h *= 2
        # deconv as GEMM at INPUT resolution: each input pixel drives a
        # k^2 patch of outputs -- M = DEC_B*(h/2)^2, K = c_in*k^2, N = c.
        m = DEC_B * (h // 2) ** 2
        kk = c_in * 9
        flops = 2.0 * m * kk * c
        bytes_ = (DEC_B * (h // 2) ** 2 * c_in + m * c + kk * c) * bytes_per
        out.append(dict(name=f"dec_deconv{i} {c_in}->{c}@{h}",
                        flops=flops, bytes=bytes_, eff=tile_eff(kk, c)))
        c_in = c
    out.append(dense_layer("attr_dec_bank", DEC_B, N_LAT, 18 * 32,
                           bytes_per))
    # --- NLL + KL elementwise over the folded batch: bandwidth only ---
    out.append(dict(name="bce+kl (VPU)", flops=0.0,
                    bytes=(DEC_B * HW * HW * 3 * 2 + B * HW * HW * 3)
                    * bytes_per, eff=1.0))
    return out


def predict(mxu_peak, bytes_per):
    rows = []
    t_total = 0.0
    f_total = 0.0
    for lay in layers(bytes_per):
        # fwd + bwd: bwd ~ 2x fwd flops and bytes.
        flops = lay["flops"] * 3.0
        bytes_ = lay["bytes"] * 3.0
        peak = mxu_peak * lay["eff"] if lay["flops"] else mxu_peak
        t = max(flops / peak if flops else 0.0, bytes_ / HBM_BW)
        bound = "mxu" if (flops and flops / peak >= bytes_ / HBM_BW) else "hbm"
        rows.append((lay["name"], flops, bytes_, lay["eff"], t, bound))
        t_total += t
        f_total += flops
    return rows, f_total, t_total


def main():
    import sys

    global DERATE
    DERATE = "--tile-derate" in sys.argv
    for dtype, peak, bp in (("float32", MXU_F32, 4), ("bfloat16", MXU_BF16, 2)):
        rows, f_total, t_total = predict(peak, bp)
        print(f"\n=== {dtype}: predicted step ===")
        print(f"{'layer':34s} {'GFLOP':>8s} {'MB':>8s} {'tile':>5s} "
              f"{'us':>8s} bound")
        for name, fl, by, eff, t, bound in rows:
            print(f"{name:34s} {fl / 1e9:8.2f} {by / 1e6:8.1f} "
                  f"{eff:5.2f} {t * 1e6:8.1f} {bound}")
        mfu = f_total / (t_total * peak)
        sps = B / t_total
        print(json.dumps({
            "dtype": dtype,
            "predicted_mfu": round(mfu, 3),
            "predicted_samples_per_sec": round(sps, 1),
            "measured_mfu": 0.844 if dtype == "float32" else 0.271,
            "measured_samples_per_sec": 10802 if dtype == "float32"
            else 13865,
        }))


if __name__ == "__main__":
    main()
