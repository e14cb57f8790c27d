"""Native (C++/OpenMP) data generators vs the numpy reference path."""

import os
import subprocess

import numpy as np
import pytest

from mmvae_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_celeba_shapes_ranges_determinism():
    d = native.make_celeba_native(64, seed=3)
    assert d["image"].shape == (64, 64, 64, 3)
    assert d["attrs"].shape == (64, 18)
    assert d["image"].min() >= 0.0 and d["image"].max() <= 1.0
    assert set(np.unique(d["attrs"])) <= {0.0, 1.0}
    d2 = native.make_celeba_native(64, seed=3)
    np.testing.assert_array_equal(d["image"], d2["image"])
    d3 = native.make_celeba_native(64, seed=4)
    assert not np.array_equal(d["image"], d3["image"])


def test_celeba_attributes_visible():
    """Attributes must causally alter pixels (cross-modal learnability):
    images grouped by an attribute differ systematically."""
    d = native.make_celeba_native(256, seed=0)
    imgs, attrs = d["image"], d["attrs"]
    for attr_idx in (2, 6, 14):  # blond_hair, eyeglasses, smiling
        on = imgs[attrs[:, attr_idx] == 1].mean(axis=0)
        off = imgs[attrs[:, attr_idx] == 0].mean(axis=0)
        assert np.abs(on - off).max() > 0.05, attr_idx


def test_multimnist_token_convention():
    d = native.make_multimnist_native(128, seed=0)
    assert d["image"].shape == (128, 50, 50)
    assert d["text"].shape == (128, 5)
    for row in d["text"]:
        stops = np.where(row == 2)[0]
        assert len(stops) == 1
        k = stops[0]
        assert k >= 1
        assert (row[:k] >= 3).all() and (row[:k] <= 12).all()
        assert (row[k + 1 :] == 0).all()
    # digit count correlates with ink on canvas
    counts = (d["text"] >= 3).sum(axis=1)
    ink = d["image"].sum(axis=(1, 2))
    assert np.corrcoef(counts, ink)[0, 1] > 0.5


def test_env_switch_selects_native(monkeypatch):
    from mmvae_tpu.data import load_dataset

    monkeypatch.setenv("MMVAE_DATAGEN", "native")
    ds = load_dataset("celeba", n=8, seed=0, device_put=False)
    want = native.make_celeba_native(8, seed=0)
    np.testing.assert_array_equal(ds.arrays["image"], want["image"])
    monkeypatch.delenv("MMVAE_DATAGEN")
    ds2 = load_dataset("celeba", n=8, seed=0, device_put=False)
    assert not np.array_equal(ds2.arrays["image"], want["image"])


@pytest.mark.slow
def test_native_feeds_train_step():
    import jax

    from mmvae_tpu.models import CelebAMVAE
    from mmvae_tpu.train import create_train_state, make_train_step

    batch = {
        k: np.asarray(v)
        for k, v in native.make_celeba_native(8, seed=0).items()
    }
    model = CelebAMVAE(n_latents=8)
    state = create_train_state(model, batch, jax.random.key(0))
    step = make_train_step(model, annealing_steps=5)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
