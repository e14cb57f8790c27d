"""Real-TPU checks: compiled Pallas kernel correctness + pallas-vs-XLA
microbenchmarks at hot-path shapes (SURVEY.md section 7 stage 6: keep the
kernels on the hot path only if they beat plain XLA).

Run on the attached v5e:  python tools/tpu_checks.py
"""

from __future__ import annotations

import sys
import time

import os

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from mmvae_tpu.core.elbo import kl_std_normal as kl_jnp
from mmvae_tpu.core.likelihoods import bernoulli_nll as bce_jnp
from mmvae_tpu.ops.kernels import (
    bernoulli_nll_pallas,
    kl_std_normal_pallas,
    masked_seq_ce_pallas,
)


def _seq_ce_jnp(logits, tokens, pad_token=0):
    from mmvae_tpu.core.likelihoods import categorical_nll

    per_tok = categorical_nll(logits, tokens)
    mask = (tokens != pad_token).astype(per_tok.dtype)
    return jnp.sum(per_tok * mask, axis=-1)


def _timeit(fn, *args, iters=50):
    out = fn(*args)
    float(np.asarray(out).reshape(-1)[0])  # honest barrier (host fetch)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main() -> int:
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    failures = 0

    # Hot-path shapes: (n_terms*batch, latent) for KL, (n_terms*batch,
    # pixels) for BCE -- MNIST batch 100 x 3 terms; CelebA 64 x 24 terms.
    # Each (op, shape) costs one ~45s remote compile per implementation;
    # jitted callables are reused for correctness AND timing.
    cases = [
        ("KL", kl_std_normal_pallas, kl_jnp, (300, 64), 1e-3),
        ("KL", kl_std_normal_pallas, kl_jnp, (1536, 128), 1e-3),
        ("BCE", bernoulli_nll_pallas, bce_jnp, (300, 784), 1e-2),
        ("BCE", bernoulli_nll_pallas, bce_jnp, (1536, 12288), 1e-2),
    ]
    for name, pallas_fn, jnp_fn, shape, atol in cases:
        a = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        b = (
            jnp.asarray(rng.uniform(size=shape).astype(np.float32))
            if name == "BCE"
            else jnp.asarray(rng.normal(size=shape).astype(np.float32))
        )
        jp, jx = jax.jit(pallas_fn), jax.jit(jnp_fn)
        got, want = np.asarray(jp(a, b)), np.asarray(jx(a, b))
        ok = np.allclose(got, want, rtol=2e-4, atol=atol)
        failures += 0 if ok else 1
        tp, _ = _timeit(jp, a, b)
        tx, _ = _timeit(jx, a, b)
        print(
            f"  {name} {shape}: {'OK' if ok else 'MISMATCH'}  "
            f"pallas {tp*1e6:8.1f}us  xla {tx*1e6:8.1f}us  "
            f"speedup {tx/tp:5.2f}x",
            flush=True,
        )

    # Masked sequence CE (MultiMNIST (B*T, 5, 13) / CUB-scale vocab).
    for shape, v in [((1536, 5), 13), ((512, 32), 700)]:
        logits = jnp.asarray(
            rng.normal(size=shape + (v,)).astype(np.float32)
        )
        tokens = jnp.asarray(
            rng.integers(0, v, size=shape).astype(np.int32)
        )
        jp = jax.jit(masked_seq_ce_pallas, static_argnums=2)
        jx = jax.jit(_seq_ce_jnp, static_argnums=2)
        got = np.asarray(jp(logits, tokens, 0))
        want = np.asarray(jx(logits, tokens, 0))
        ok = np.allclose(got, want, rtol=2e-4, atol=1e-2)
        failures += 0 if ok else 1
        tp, _ = _timeit(jp, logits, tokens, 0)
        tx, _ = _timeit(jx, logits, tokens, 0)
        print(
            f"  SeqCE {shape}x{v}: {'OK' if ok else 'MISMATCH'}  "
            f"pallas {tp*1e6:8.1f}us  xla {tx*1e6:8.1f}us  "
            f"speedup {tx/tp:5.2f}x",
            flush=True,
        )

    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
