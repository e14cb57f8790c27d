"""Grain input pipeline ([B:5] north-star data path)."""

import numpy as np
import pytest

grain = pytest.importorskip("grain")

from mmvae_tpu.data import load_dataset
from mmvae_tpu.data.grain_pipeline import make_grain_loader


@pytest.fixture(scope="module")
def ds():
    return load_dataset("mnist", n=64, seed=0, device_put=False)


def test_batches_shape_and_coverage(ds):
    loader = make_grain_loader(ds, 16, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 4
    for b in batches:
        assert b["image"].shape == (16, 28, 28)
        assert b["label"].shape == (16,)
    # shuffled epoch covers every label exactly once
    all_labels = np.sort(np.concatenate([b["label"] for b in batches]))
    np.testing.assert_array_equal(
        all_labels, np.sort(np.asarray(ds.arrays["label"]))
    )


def test_deterministic_given_seed(ds):
    a = [b["label"] for b in make_grain_loader(ds, 16, seed=7)]
    b = [b["label"] for b in make_grain_loader(ds, 16, seed=7)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = [b["label"] for b in make_grain_loader(ds, 16, seed=8)]
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))


def test_modality_dropout_mask(ds):
    loader = make_grain_loader(
        ds, 16, modality_names=["image", "label"],
        p_modality_drop=0.5, seed=0,
    )
    batch = next(iter(loader))
    p = batch["presence"]
    assert p.shape == (16, 2)
    assert p.any(axis=1).all()
    assert set(np.unique(p)) <= {0.0, 1.0}


def test_feeds_train_step(ds):
    import jax

    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import create_train_state, make_train_step

    model = MnistMVAE(n_latents=8)
    loader = make_grain_loader(
        ds, 32, modality_names=["image", "label"],
        p_modality_drop=0.3, seed=0,
    )
    state = create_train_state(
        model, model.dummy_batch(32), jax.random.key(0)
    )
    step = make_train_step(model, annealing_steps=5)
    for batch in loader:
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 2
