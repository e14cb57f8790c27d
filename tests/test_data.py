"""Data layer: generators, pipelines, modality dropout, vocab."""

import jax
import numpy as np
import pytest

from mmvae_tpu.data import (
    Dataset,
    Vocab,
    epoch_batches,
    load_dataset,
    sample_presence,
)
from mmvae_tpu.data import synthetic


SHAPES = {
    "mnist": {"image": (28, 28), "label": ()},
    "fashionmnist": {"image": (28, 28), "label": ()},
    "multimnist": {"image": (50, 50), "text": (5,)},
    "celeba": {"image": (64, 64, 3), "attrs": (18,)},
    "cub": {"image": (64, 64, 3), "text": (32,)},
}


@pytest.mark.parametrize("name", list(SHAPES))
def test_generator_shapes_and_ranges(name):
    ds = load_dataset(name, n=8, seed=0)
    assert ds.size == 8
    for key, ev_shape in SHAPES[name].items():
        arr = np.asarray(ds.arrays[key])
        assert arr.shape == (8,) + ev_shape, key
    img = np.asarray(ds.arrays["image"])
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert img.std() > 0.01  # not blank


@pytest.mark.parametrize("name", list(SHAPES))
def test_generator_deterministic(name):
    a = load_dataset(name, n=4, seed=3, device_put=False)
    b = load_dataset(name, n=4, seed=3, device_put=False)
    for k in a.arrays:
        np.testing.assert_array_equal(a.arrays[k], b.arrays[k])
    c = load_dataset(name, n=4, seed=4, device_put=False)
    assert any(
        not np.array_equal(a.arrays[k], c.arrays[k]) for k in a.arrays
    )


def test_train_test_disjoint_seeds():
    tr = load_dataset("mnist", "train", n=16, device_put=False)
    te = load_dataset("mnist", "test", n=16, device_put=False)
    assert not np.array_equal(tr.arrays["image"], te.arrays["image"])


def test_multimnist_tokens_match_convention():
    ds = load_dataset("multimnist", n=32, seed=0, device_put=False)
    toks = ds.arrays["text"]
    for row in toks:
        stops = np.where(row == 2)[0]
        assert len(stops) == 1
        k = stops[0]
        assert k >= 1  # at least one digit
        assert (row[:k] >= 3).all() and (row[:k] <= 12).all()
        assert (row[k + 1 :] == 0).all()


def test_epoch_batches_cover_dataset():
    ds = load_dataset("mnist", n=50, seed=0)
    batches = list(epoch_batches(ds, 16, np.random.default_rng(0)))
    assert len(batches) == 3  # drop remainder
    assert batches[0]["image"].shape == (16, 28, 28)
    batches = list(
        epoch_batches(ds, 16, np.random.default_rng(0), drop_remainder=False)
    )
    assert sum(b["image"].shape[0] for b in batches) == 50


def test_sample_presence():
    assert sample_presence(jax.random.key(0), 4, 3, 0.0) is None
    p = sample_presence(jax.random.key(0), 512, 3, 0.4)
    p = np.asarray(p)
    assert p.shape == (512, 3)
    assert p.any(axis=1).all()  # never all-dropped
    frac = p.mean()
    assert 0.5 < frac < 0.85  # ~0.6 kept plus rescue


def test_vocab_roundtrip():
    v = Vocab("the quick brown fox".split())
    ids = v.encode("quick fox", max_len=6)
    assert ids.shape == (6,)
    assert v.decode(ids) == "quick fox"
    # truncation keeps STOP
    ids = v.encode("the quick brown fox the quick", max_len=4)
    assert ids[-1] == 2 or 2 in ids


def test_cub_vocab_consistent_with_captions():
    ds = load_dataset("cub", n=8, seed=0, device_put=False)
    v = synthetic.cub_vocab()
    toks = ds.arrays["text"]
    assert toks.max() < len(v)
    text = v.decode(toks[0])
    assert text.startswith("this bird has a")


def test_stacked_epoch_padded_masks_remainder():
    from mmvae_tpu.data import load_dataset, stacked_epoch_padded

    ds = load_dataset("mnist", n=50, seed=0)
    batches, valid = stacked_epoch_padded(ds, 16)
    assert batches["image"].shape == (4, 16, 28, 28)
    assert valid.shape == (4, 16)
    v = np.asarray(valid)
    assert v[:3].all() and v[3, :2].all() and not v[3, 2:].any()
    # Every real example appears exactly once among the valid rows.
    imgs = np.asarray(batches["image"]).reshape(64, -1)[v.reshape(-1) > 0]
    ref = np.asarray(ds.arrays["image"]).reshape(50, -1)
    np.testing.assert_array_equal(imgs, ref)


def test_native_multimnist_rejects_bad_max_digits():
    import pytest as _pytest

    from mmvae_tpu.data import native as native_gen

    with _pytest.raises(ValueError):
        native_gen.make_multimnist_native(4, max_digits=9)
    with _pytest.raises(ValueError):
        native_gen.make_multimnist_native(4, max_digits=0)
