"""ELBO *trajectory* parity: train the JAX MnistMVAE and the eager-torch
fixture side by side and compare the curves.

BASELINE.json:5 demands test-ELBO parity "within 1%" and an ELBO
trajectory that "matches within noise". The per-term parity tests
(tests/test_parity_torch.py) pin the loss math at fixed weights; this
tool pins the full TRAINING DYNAMICS -- model + multi-term loss + Adam
-- over a real run. The reference mount is empty (SURVEY.md section 0),
so the in-repo torch fixture is the reference-family oracle.

Two modes, both starting from IDENTICAL initial weights (flax init
copied into the torch fixture) and fed IDENTICAL batch order:

  deterministic  z = mu on both sides (sample=False): the trajectories
                 are deterministic, so ANY divergence is implementation
                 drift (loss math, optimizer, float accumulation), not
                 sampling noise. The headline number is the max
                 per-epoch relative test-ELBO deviation.

  sampled        the real algorithm (reparameterized z) with each side
                 drawing its own noise, S seeds per side; eval is
                 deterministic. The JAX mean final test ELBO must land
                 within the torch fixture's own seed spread -- "match
                 within noise" made literal.

Run on CPU (the fixture is CPU-only):
    python tools/trajectory_parity.py --epochs 12 --train-size 2048
Prints one JSON line per mode; exits non-zero if the deterministic
deviation exceeds 1% or the sampled means differ by more than the
combined seed spread (floored at 1%).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def _beta(step: int, annealing_steps: int) -> float:
    """Linear KL ramp, the reference schedule (SURVEY.md 2.9); matches
    mmvae_tpu.core.annealing_factor."""
    if annealing_steps <= 0:
        return 1.0
    return float(min(1.0, step / annealing_steps))


def _epoch_perms(rng: np.random.Generator, n: int, batch: int, epochs: int):
    """One fixed batch order per epoch, shared verbatim by both sides."""
    steps = n // batch
    return [
        rng.permutation(n)[: steps * batch].reshape(steps, batch)
        for _ in range(epochs)
    ]


def train_jax(images, labels, test_images, test_labels, perms, *,
              n_latents, annealing_steps, lr, sample, seed):
    import jax
    import jax.numpy as jnp
    import optax

    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import multi_term_loss

    model = MnistMVAE(n_latents=n_latents)
    init_batch = {
        "image": jnp.asarray(images[:8]),
        "label": jnp.asarray(labels[:8]),
    }
    params = model.init(
        jax.random.key(0), init_batch, rng=jax.random.key(1)
    )["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, image, label, rng, beta):
        def loss_fn(p):
            loss, _ = multi_term_loss(
                model, p, {"image": image, "label": label}, rng, beta,
                sample=sample,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_elbo(params):
        loss, _ = multi_term_loss(
            model, params,
            {"image": jnp.asarray(test_images),
             "label": jnp.asarray(test_labels)},
            jax.random.key(0), 1.0, sample=False,
        )
        return loss

    rng = jax.random.key(seed)
    images_j = jnp.asarray(images)
    labels_j = jnp.asarray(labels)
    curve = []
    global_step = 0
    for perm in perms:
        losses = []
        for rows in perm:
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, images_j[rows], labels_j[rows], sub,
                _beta(global_step, annealing_steps),
            )
            losses.append(loss)
            global_step += 1
        curve.append({
            "train_loss": float(np.mean([float(x) for x in losses])),
            "test_elbo": float(eval_elbo(params)),
        })
    return curve, params


def train_torch(images, labels, test_images, test_labels, perms,
                init_flax_params, *, n_latents, annealing_steps, lr,
                sample, seed):
    import torch

    from torch_fixture import (
        TorchMnistMVAE,
        copy_flax_params_to_torch,
        torch_multi_term_loss,
    )

    torch.manual_seed(seed)
    tmodel = TorchMnistMVAE(n_latents=n_latents)
    copy_flax_params_to_torch(init_flax_params, tmodel)
    opt = torch.optim.Adam(tmodel.parameters(), lr=lr)
    timages = torch.from_numpy(images)
    tlabels = torch.from_numpy(labels).long()
    t_test_i = torch.from_numpy(test_images)
    t_test_l = torch.from_numpy(test_labels).long()

    curve = []
    global_step = 0
    for perm in perms:
        tmodel.train()
        losses = []
        for rows in perm:
            rows_t = torch.from_numpy(rows)
            opt.zero_grad()
            loss = torch_multi_term_loss(
                tmodel, timages[rows_t], tlabels[rows_t],
                beta=_beta(global_step, annealing_steps), sample=sample,
            )
            loss.backward()
            opt.step()
            losses.append(loss.item())
            global_step += 1
        tmodel.eval()
        with torch.no_grad():
            test = torch_multi_term_loss(
                tmodel, t_test_i, t_test_l, beta=1.0, sample=False
            ).item()
        curve.append({
            "train_loss": float(np.mean(losses)),
            "test_elbo": float(test),
        })
    return curve


def run(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--train-size", type=int, default=2048)
    ap.add_argument("--test-size", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--n-latents", type=int, default=32)
    ap.add_argument("--annealing-epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seeds", type=int, default=3,
                    help="seeds per side in sampled mode (0 = skip)")
    args = ap.parse_args(argv)

    import jax

    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MnistMVAE

    ds = load_dataset(
        "mnist", n=args.train_size + args.test_size, seed=0,
        device_put=False,
    )
    images = np.asarray(ds.arrays["image"], dtype=np.float32)
    labels = np.asarray(ds.arrays["label"])
    tr_i, te_i = images[: args.train_size], images[args.train_size:]
    tr_l, te_l = labels[: args.train_size], labels[args.train_size:]
    steps_per_epoch = args.train_size // args.batch_size
    annealing_steps = max(args.annealing_epochs * steps_per_epoch, 1)
    perms = _epoch_perms(
        np.random.default_rng(0), args.train_size, args.batch_size,
        args.epochs,
    )

    # Shared initial weights for every run below.
    import jax.numpy as jnp

    model = MnistMVAE(n_latents=args.n_latents)
    init_params = model.init(
        jax.random.key(0),
        {"image": jnp.asarray(tr_i[:8]), "label": jnp.asarray(tr_l[:8])},
        rng=jax.random.key(1),
    )["params"]

    kw = dict(
        n_latents=args.n_latents, annealing_steps=annealing_steps,
        lr=args.lr,
    )
    ok = True

    # -- deterministic mode ------------------------------------------
    jc, _ = train_jax(tr_i, tr_l, te_i, te_l, perms, sample=False,
                      seed=0, **kw)
    tc = train_torch(tr_i, tr_l, te_i, te_l, perms, init_params,
                     sample=False, seed=0, **kw)
    devs = [
        abs(j["test_elbo"] - t["test_elbo"]) / abs(t["test_elbo"])
        for j, t in zip(jc, tc)
    ]
    det = {
        "mode": "deterministic",
        "epochs": args.epochs,
        "final_test_elbo": {"jax": jc[-1]["test_elbo"],
                            "torch": tc[-1]["test_elbo"]},
        "max_rel_test_elbo_dev": max(devs),
        "final_rel_dev": devs[-1],
        "jax_curve": [round(e["test_elbo"], 3) for e in jc],
        "torch_curve": [round(e["test_elbo"], 3) for e in tc],
        "pass_1pct": max(devs) < 0.01,
    }
    print(json.dumps(det), flush=True)
    ok &= det["pass_1pct"]

    # -- sampled mode ------------------------------------------------
    if args.seeds > 0:
        j_final, t_final = [], []
        for s in range(args.seeds):
            jc, _ = train_jax(tr_i, tr_l, te_i, te_l, perms, sample=True,
                              seed=s, **kw)
            j_final.append(jc[-1]["test_elbo"])
            tc = train_torch(tr_i, tr_l, te_i, te_l, perms, init_params,
                             sample=True, seed=s, **kw)
            t_final.append(tc[-1]["test_elbo"])
        jm, tm = float(np.mean(j_final)), float(np.mean(t_final))
        spread = (max(j_final) - min(j_final)) + (max(t_final) - min(t_final))
        tol = max(spread, 0.01 * abs(tm))
        samp = {
            "mode": "sampled",
            "seeds": args.seeds,
            "jax_final": [round(v, 3) for v in j_final],
            "torch_final": [round(v, 3) for v in t_final],
            "mean_rel_dev": abs(jm - tm) / abs(tm),
            "tolerance_rel": tol / abs(tm),
            "pass_within_noise": abs(jm - tm) <= tol,
        }
        print(json.dumps(samp), flush=True)
        ok &= samp["pass_within_noise"]

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(run())
