"""Trained-trajectory parity vs the eager-torch fixture (BASELINE.json
"ELBO trajectory matches within noise"; SURVEY.md section 4, Parity row).

The per-term tests pin the loss math at fixed weights; this pins the
full training dynamics -- model + multi-term loss + Adam + float
accumulation -- over a (tiny) deterministic run: identical init,
identical batch order, z=mu on both sides, so any divergence is
implementation drift. The full-scale measurement lives in
tools/trajectory_parity.py; its numbers are in BASELINE.md.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

pytest.importorskip("torch")


def test_deterministic_trained_trajectory_matches_torch():
    import jax
    import jax.numpy as jnp

    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MnistMVAE
    from trajectory_parity import (
        _epoch_perms,
        train_jax,
        train_torch_mnist,
    )

    n_train, n_test, batch, epochs = 256, 128, 64, 2
    ds = load_dataset("mnist", n=n_train + n_test, seed=0,
                      device_put=False)
    images = np.asarray(ds.arrays["image"], dtype=np.float32)
    labels = np.asarray(ds.arrays["label"])
    train = {"image": images[:n_train], "label": labels[:n_train]}
    test = {"image": images[n_train:], "label": labels[n_train:]}
    perms = _epoch_perms(np.random.default_rng(0), n_train, batch, epochs)

    model = MnistMVAE(n_latents=16)
    init_params = model.init(
        jax.random.key(0),
        {k: jnp.asarray(v[:8]) for k, v in train.items()},
        rng=jax.random.key(1),
    )["params"]

    kw = dict(annealing_steps=4, lr=1e-3)
    jax_curve, _ = train_jax(model, train, test, perms,
                             sample=False, seed=0, **kw)
    torch_curve = train_torch_mnist(train, test, perms, init_params,
                                    sample=False, seed=0, n_latents=16,
                                    **kw)

    for j, t in zip(jax_curve, torch_curve):
        rel = abs(j["test_elbo"] - t["test_elbo"]) / abs(t["test_elbo"])
        # The 1% budget is the spec; float-precision agreement is what
        # the implementations actually deliver (measured ~3e-6).
        assert rel < 1e-3, (jax_curve, torch_curve)
    # And training actually trained (the curve moved).
    assert jax_curve[-1]["test_elbo"] < jax_curve[0]["test_elbo"]


def test_deterministic_multimnist_trajectory_matches_torch():
    """Seq-model (scan-GRU encoder/decoder + odd-size conv stack)
    trained-trajectory parity -- the numerically distinct paths the
    MNIST/CelebA twins don't cover."""
    import jax
    import jax.numpy as jnp

    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MultiMnistMVAE
    from trajectory_parity import (
        _epoch_perms,
        train_jax,
        train_torch_multimnist,
    )

    n_train, n_test, batch, epochs = 128, 64, 32, 2
    ds = load_dataset("multimnist", n=n_train + n_test, seed=0,
                      device_put=False)
    images = np.asarray(ds.arrays["image"], dtype=np.float32)
    text = np.asarray(ds.arrays["text"])
    train = {"image": images[:n_train], "text": text[:n_train]}
    test = {"image": images[n_train:], "text": text[n_train:]}
    perms = _epoch_perms(np.random.default_rng(0), n_train, batch, epochs)

    model = MultiMnistMVAE(n_latents=8, conv_features=(4, 8),
                           text_embed=8, text_hidden=16)
    init_params = model.init(
        jax.random.key(0),
        {k: jnp.asarray(v[:8]) for k, v in train.items()},
        rng=jax.random.key(1),
    )["params"]

    kw = dict(annealing_steps=4, lr=1e-3)
    jax_curve, _ = train_jax(model, train, test, perms,
                             sample=False, seed=0, **kw)
    torch_curve = train_torch_multimnist(
        train, test, perms, init_params, sample=False, seed=0,
        n_latents=8, feats=(4, 8), **kw,
    )

    for j, t in zip(jax_curve, torch_curve):
        rel = abs(j["test_elbo"] - t["test_elbo"]) / abs(t["test_elbo"])
        assert rel < 1e-3, (jax_curve, torch_curve)
    assert jax_curve[-1]["test_elbo"] < jax_curve[0]["test_elbo"]
