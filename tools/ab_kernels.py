"""In-program A/B of the Pallas kernels vs plain XLA on the real TPU.

Round-1 honesty rule (docs/DESIGN.md section 4): a kernel stays on the
hot path ONLY if it beats XLA at the real shapes, measured in-program
(full train step), not standalone. This script measures samples/sec of
the scan-fused epoch runner per (model, per-op backend) combination and
prints a JSON table; the winners become the "auto" policy in
``mmvae_tpu.ops._AUTO_TPU``.

Run on the v5e (each combination costs one ~60s remote compile):
    python tools/ab_kernels.py [mnist|celeba|multimnist ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def measure(model_name: str, backends: dict, n_epochs: int = 10) -> float:
    import jax

    from mmvae_tpu import ops
    from mmvae_tpu.data import load_dataset, stacked_epoch
    from mmvae_tpu.train import create_train_state, make_epoch_runner

    ops.set_backend("auto")
    ops.set_backend(**backends)

    if model_name == "celeba":
        from mmvae_tpu.models import CelebAMVAE

        model = CelebAMVAE(n_latents=100)
        batch, steps, runner_kw = 64, 50, dict(n_random_subsets=4)
    elif model_name == "multimnist":
        from mmvae_tpu.models import MultiMnistMVAE

        model = MultiMnistMVAE(n_latents=64)
        batch, steps, runner_kw = 64, 50, {}
    else:
        from mmvae_tpu.models import MnistMVAE

        model = MnistMVAE(n_latents=64)
        batch, steps, runner_kw = 100, 200, {}

    ds = load_dataset(model_name, n=batch * steps, seed=0)
    state = create_train_state(
        model,
        {k: v[:batch] for k, v in ds.arrays.items()},
        jax.random.key(0),
        1e-3,
    )
    runner = make_epoch_runner(model, annealing_steps=1000, **runner_kw)
    rng = np.random.default_rng(0)
    state, ms = runner(state, stacked_epoch(ds, batch, rng))
    float(np.asarray(ms["loss"]).sum())  # honest barrier (host fetch)
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        state, ms = runner(state, stacked_epoch(ds, batch, rng))
    float(np.asarray(ms["loss"]).sum())
    dt = time.perf_counter() - t0
    return batch * steps * n_epochs / dt


CASES = {
    "mnist": [
        {"kl": "pallas", "bce": "pallas"},
        {"kl": "pallas", "bce": "jnp"},
        {"kl": "jnp", "bce": "jnp"},
    ],
    "celeba": [
        {"kl": "pallas", "bce": "pallas"},
        {"kl": "pallas", "bce": "jnp"},
        {"kl": "jnp", "bce": "jnp"},
    ],
    "multimnist": [
        {"kl": "pallas", "bce": "pallas", "seq_ce": "pallas"},
        {"kl": "pallas", "bce": "pallas", "seq_ce": "jnp"},
        {"kl": "pallas", "bce": "jnp", "seq_ce": "pallas"},
        # The shipped auto combo (round-2 winner):
        {"kl": "jnp", "bce": "jnp", "seq_ce": "pallas"},
        {"kl": "jnp", "bce": "jnp", "seq_ce": "jnp"},
    ],
}


def main() -> int:
    which = sys.argv[1:] or list(CASES)
    results = {}
    for name in which:
        for backends in CASES[name]:
            key = f"{name} " + ",".join(
                f"{k}={v}" for k, v in sorted(backends.items())
            )
            sps = measure(name, backends)
            results[key] = round(sps, 1)
            print(json.dumps({key: results[key]}), flush=True)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
