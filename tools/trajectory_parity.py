"""ELBO *trajectory* parity: train a JAX MVAE and its eager-torch twin
side by side and compare the curves.

BASELINE.json:5 demands test-ELBO parity "within 1%" and an ELBO
trajectory that "matches within noise" on MNIST and CelebA. The
per-term parity tests (tests/test_parity_torch.py,
tests/test_parity_celeba.py) pin the loss math at fixed weights; this
tool pins the full TRAINING DYNAMICS -- model + multi-term loss + Adam
-- over a real run. The reference mount is empty (SURVEY.md section 0),
so the in-repo torch fixtures are the reference-family oracle.

Two modes, both starting from IDENTICAL initial weights (flax init
copied into the torch twin) and fed IDENTICAL batch order:

  deterministic  z = mu on both sides (sample=False): the trajectories
                 are deterministic, so ANY divergence is implementation
                 drift (loss math, optimizer, float accumulation), not
                 sampling noise. The headline number is the max
                 per-epoch relative test-ELBO deviation.

  sampled        the real algorithm (reparameterized z) with each side
                 drawing its own noise, S seeds per side; eval is
                 deterministic. The JAX mean final test ELBO must land
                 within the torch twin's own seed spread -- "match
                 within noise" made literal.

CelebA uses n_random_subsets=0 on BOTH sides (the random-subset terms
draw from different RNGs by construction; the 20 fixed terms still
exercise the 19-expert PoE, conv/deconv stacks, and the einsum attr
banks).

Run on CPU (the fixtures are CPU-only):
    python tools/trajectory_parity.py --config mnist --epochs 12
    python tools/trajectory_parity.py --config celeba
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

DEFAULTS = {
    "mnist": dict(epochs=12, train_size=2048, test_size=512,
                  batch_size=128, n_latents=32, annealing_epochs=6,
                  seeds=3),
    "celeba": dict(epochs=4, train_size=256, test_size=64,
                   batch_size=32, n_latents=16, annealing_epochs=2,
                   seeds=2),
    "multimnist": dict(epochs=8, train_size=1024, test_size=256,
                       batch_size=128, n_latents=16, annealing_epochs=4,
                       seeds=2),
}


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


def train_jax(model, train_arrays, test_arrays, perms, *,
              annealing_steps, lr, sample, seed):
    """Train ``model`` (any MVAEBase) with plain optax Adam over the
    fixed batch order; returns the per-epoch curve and final params.
    ``*_arrays`` are numpy dicts keyed by modality."""
    import jax
    import jax.numpy as jnp
    import optax

    from mmvae_tpu.train import multi_term_loss

    train_j = {k: jnp.asarray(v) for k, v in train_arrays.items()}
    test_j = {k: jnp.asarray(v) for k, v in test_arrays.items()}
    params = model.init(
        jax.random.key(0),
        {k: v[:8] for k, v in train_j.items()},
        rng=jax.random.key(1),
    )["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, rng, beta):
        def loss_fn(p):
            loss, _ = multi_term_loss(
                model, p, batch, rng, beta, sample=sample,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_elbo(params):
        loss, _ = multi_term_loss(
            model, params, test_j, jax.random.key(0), 1.0, sample=False,
        )
        return loss

    rng = jax.random.key(seed)
    curve = []
    global_step = 0
    for perm in perms:
        losses = []
        for rows in perm:
            rng, sub = jax.random.split(rng)
            batch = {k: v[rows] for k, v in train_j.items()}
            params, opt_state, loss = step(
                params, opt_state, batch, sub,
                _beta(global_step, annealing_steps),
            )
            losses.append(loss)
            global_step += 1
        curve.append({
            "train_loss": float(np.mean([float(x) for x in losses])),
            "test_elbo": float(eval_elbo(params)),
        })
    return curve, params


def train_torch_mnist(train_arrays, test_arrays, perms, init_flax_params,
                      *, n_latents, annealing_steps, lr, sample, seed):
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
    timages = torch.from_numpy(train_arrays["image"])
    tlabels = torch.from_numpy(train_arrays["label"]).long()
    t_test_i = torch.from_numpy(test_arrays["image"])
    t_test_l = torch.from_numpy(test_arrays["label"]).long()

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


def train_torch_celeba(train_arrays, test_arrays, perms, init_flax_params,
                       *, n_latents, annealing_steps, lr, sample, seed,
                       feats=(32, 64, 128, 256)):
    import torch

    from torch_fixture import TorchCelebATwin, torch_celeba_twin_loss

    torch.manual_seed(seed)
    twin = TorchCelebATwin(init_flax_params, n_latents, feats=feats)
    opt = torch.optim.Adam(twin.parameters(), lr=lr)
    timages = torch.from_numpy(train_arrays["image"])
    tattrs = torch.from_numpy(train_arrays["attrs"])
    t_test_i = torch.from_numpy(test_arrays["image"])
    t_test_a = torch.from_numpy(test_arrays["attrs"])

    curve = []
    global_step = 0
    for perm in perms:
        twin.train()
        losses = []
        for rows in perm:
            rows_t = torch.from_numpy(rows)
            opt.zero_grad()
            loss = torch_celeba_twin_loss(
                twin, timages[rows_t], tattrs[rows_t],
                beta=_beta(global_step, annealing_steps), sample=sample,
            )
            loss.backward()
            opt.step()
            losses.append(loss.item())
            global_step += 1
        twin.eval()
        with torch.no_grad():
            test = torch_celeba_twin_loss(
                twin, t_test_i, t_test_a, beta=1.0, sample=False
            ).item()
        curve.append({
            "train_loss": float(np.mean(losses)),
            "test_elbo": float(test),
        })
    return curve


def train_torch_multimnist(train_arrays, test_arrays, perms,
                           init_flax_params, *, n_latents,
                           annealing_steps, lr, sample, seed,
                           feats=(8, 16)):
    import torch

    from torch_fixture import (
        TorchMultiMnistTwin,
        torch_multimnist_twin_loss,
    )

    torch.manual_seed(seed)
    twin = TorchMultiMnistTwin(init_flax_params, n_latents, feats=feats)
    opt = torch.optim.Adam(twin.parameters(), lr=lr)
    timages = torch.from_numpy(train_arrays["image"])
    ttext = torch.from_numpy(train_arrays["text"]).long()
    t_test_i = torch.from_numpy(test_arrays["image"])
    t_test_t = torch.from_numpy(test_arrays["text"]).long()

    curve = []
    global_step = 0
    for perm in perms:
        twin.train()
        losses = []
        for rows in perm:
            rows_t = torch.from_numpy(rows)
            opt.zero_grad()
            loss = torch_multimnist_twin_loss(
                twin, timages[rows_t], ttext[rows_t],
                beta=_beta(global_step, annealing_steps), sample=sample,
            )
            loss.backward()
            opt.step()
            losses.append(loss.item())
            global_step += 1
        twin.eval()
        with torch.no_grad():
            test = torch_multimnist_twin_loss(
                twin, t_test_i, t_test_t, beta=1.0, sample=False
            ).item()
        curve.append({
            "train_loss": float(np.mean(losses)),
            "test_elbo": float(test),
        })
    return curve


def _setup(config: str, args):
    """Model + train/test numpy arrays + the torch-side trainer."""
    from mmvae_tpu.data import load_dataset

    if config == "mnist":
        from mmvae_tpu.models import MnistMVAE

        model = MnistMVAE(n_latents=args.n_latents)
        ds = load_dataset("mnist", n=args.train_size + args.test_size,
                          seed=0, device_put=False)
        arrays = {
            "image": np.asarray(ds.arrays["image"], dtype=np.float32),
            "label": np.asarray(ds.arrays["label"]),
        }
        torch_trainer = train_torch_mnist
    elif config == "multimnist":
        from mmvae_tpu.models import MultiMnistMVAE

        # Tiny arch for CPU tractability; the scan-GRU seq encoder +
        # teacher-forced GRU decoder and the odd-size (50->25->13) conv
        # stack -- the numerically distinct paths -- are all exercised.
        model = MultiMnistMVAE(
            n_latents=args.n_latents, conv_features=(8, 16),
            text_embed=16, text_hidden=32,
        )
        ds = load_dataset("multimnist",
                          n=args.train_size + args.test_size,
                          seed=0, device_put=False)
        arrays = {
            "image": np.asarray(ds.arrays["image"], dtype=np.float32),
            "text": np.asarray(ds.arrays["text"]),
        }
        torch_trainer = train_torch_multimnist
    elif config == "celeba":
        from mmvae_tpu.models import CelebAMVAE

        model = CelebAMVAE(n_latents=args.n_latents)
        ds = load_dataset("celeba", n=args.train_size + args.test_size,
                          seed=0, device_put=False)
        arrays = {
            "image": np.asarray(ds.arrays["image"], dtype=np.float32),
            "attrs": np.asarray(ds.arrays["attrs"], dtype=np.float32),
        }
        torch_trainer = train_torch_celeba
    else:
        raise SystemExit(f"unknown config {config!r}")
    train = {k: v[: args.train_size] for k, v in arrays.items()}
    test = {k: v[args.train_size:] for k, v in arrays.items()}
    return model, train, test, torch_trainer


def run(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config",
                    choices=("mnist", "celeba", "multimnist"),
                    default="mnist")
    ap.add_argument("--epochs", type=int)
    ap.add_argument("--train-size", type=int)
    ap.add_argument("--test-size", type=int)
    ap.add_argument("--batch-size", type=int)
    ap.add_argument("--n-latents", type=int)
    ap.add_argument("--annealing-epochs", type=int)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seeds", type=int,
                    help="seeds per side in sampled mode (0 = skip)")
    args = ap.parse_args(argv)
    for k, v in DEFAULTS[args.config].items():
        if getattr(args, k) is None:
            setattr(args, k, v)

    import jax

    # The torch twins are CPU-only and the side-by-side comparison wants
    # identical float behavior, so force the CPU backend BEFORE it
    # initializes -- under the axon sitecustomize the default backend is
    # the real TPU, where every jit pays a remote compile and the tool
    # crawls (observed: 25 min of near-zero progress mid-round-3).
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized (e.g. driven from a test)
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        # Persistent cache for the (identical run-over-run) CPU compiles
        # -- safe ONLY off the axon relay (docs/DESIGN.md section 7);
        # host-feature-keyed (mmvae_tpu/utils/cpu_cache.py).
        from mmvae_tpu.utils.cpu_cache import enable_cpu_cache

        enable_cpu_cache()

    model, train, test, torch_trainer = _setup(args.config, args)
    steps_per_epoch = args.train_size // args.batch_size
    annealing_steps = max(args.annealing_epochs * steps_per_epoch, 1)
    perms = _epoch_perms(
        np.random.default_rng(0), args.train_size, args.batch_size,
        args.epochs,
    )

    # Shared initial weights for every run below (train_jax re-derives
    # the identical tree from the same fixed init keys).
    init_params = model.init(
        jax.random.key(0),
        {k: jnp.asarray(v[:8]) for k, v in train.items()},
        rng=jax.random.key(1),
    )["params"]

    jkw = dict(annealing_steps=annealing_steps, lr=args.lr)
    tkw = dict(n_latents=args.n_latents, **jkw)
    ok = True

    # -- deterministic mode ------------------------------------------
    jc, _ = train_jax(model, train, test, perms, sample=False, seed=0,
                      **jkw)
    tc = torch_trainer(train, test, perms, init_params, sample=False,
                       seed=0, **tkw)
    devs = [
        abs(j["test_elbo"] - t["test_elbo"]) / abs(t["test_elbo"])
        for j, t in zip(jc, tc)
    ]
    det = {
        "config": args.config,
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
            jc, _ = train_jax(model, train, test, perms, sample=True,
                              seed=s, **jkw)
            j_final.append(jc[-1]["test_elbo"])
            tc = torch_trainer(train, test, perms, init_params,
                               sample=True, seed=s, **tkw)
            t_final.append(tc[-1]["test_elbo"])
        jm, tm = float(np.mean(j_final)), float(np.mean(t_final))
        # Welch two-sample interval: the means must agree within ~2
        # standard errors of their own seed noise (floored at the 1%
        # budget) -- with >=3 seeds/side this is a defensible "within
        # noise"; at 2 seeds/side the variance estimate is weak, run
        # more seeds before reading a failure as real.
        n = len(j_final)
        var_j = float(np.var(j_final, ddof=1)) if n > 1 else 0.0
        var_t = float(np.var(t_final, ddof=1)) if n > 1 else 0.0
        se = float(np.sqrt(var_j / n + var_t / n))
        tol = max(2.0 * se, 0.01 * abs(tm))
        samp = {
            "config": args.config,
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
