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


def _write_idx(path, arr):
    import struct

    codes = {np.uint8: 0x08}
    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, arr.ndim))
        f.write(struct.pack(f">{arr.ndim}I", *arr.shape))
        f.write(arr.astype(np.uint8).tobytes())


def test_idx_ingestion_matches_synthetic_shapes(tmp_path, monkeypatch):
    """A standard MNIST IDX download mounted under MMVAE_DATA_DIR loads
    with shapes identical to the synthetic path (VERDICT r1 #10)."""
    rng = np.random.default_rng(0)
    d = tmp_path / "mnist"
    d.mkdir()
    imgs = rng.integers(0, 256, size=(10, 28, 28)).astype(np.uint8)
    labs = rng.integers(0, 10, size=(10,)).astype(np.uint8)
    _write_idx(d / "train-images-idx3-ubyte", imgs)
    _write_idx(d / "train-labels-idx1-ubyte", labs)
    # Gzipped variants must work too (test split).
    import gzip

    t_imgs = rng.integers(0, 256, size=(4, 28, 28)).astype(np.uint8)
    t_labs = rng.integers(0, 10, size=(4,)).astype(np.uint8)
    import io, struct

    def idx_bytes(arr):
        b = struct.pack(">HBB", 0, 0x08, arr.ndim)
        b += struct.pack(f">{arr.ndim}I", *arr.shape)
        return b + arr.tobytes()

    with gzip.open(d / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write(idx_bytes(t_imgs))
    with gzip.open(d / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write(idx_bytes(t_labs))

    monkeypatch.setenv("MMVAE_DATA_DIR", str(tmp_path))
    from mmvae_tpu.data import load_dataset

    ds = load_dataset("mnist", "train")
    ref = load_dataset("mnist", "train", n=10)  # synthetic (no real dir hit?)
    assert ds.size == 10
    assert ds.arrays["image"].shape == (10, 28, 28)
    assert ds.arrays["label"].shape == (10,)
    np.testing.assert_allclose(
        np.asarray(ds.arrays["image"][0]), imgs[0] / 255.0, atol=1e-6
    )
    ts = load_dataset("mnist", "test")
    assert ts.size == 4 and ts.arrays["image"].shape == (4, 28, 28)


def test_stacked_epoch_padded_host_mode():
    """host=True returns HOST numpy stacks bit-equal to the device
    stacking -- the segmented (beyond-HBM) eval lane depends on the
    split never touching the device at construction (round-5 review)."""
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.data.pipelines import stacked_epoch_padded

    ds = load_dataset("mnist", n=40, seed=0, device_put=False)
    dev_b, dev_v = stacked_epoch_padded(ds, 16)
    host_b, host_v = stacked_epoch_padded(ds, 16, host=True)
    assert all(isinstance(v, np.ndarray) for v in host_b.values())
    assert isinstance(host_v, np.ndarray)
    for k in dev_b:
        np.testing.assert_array_equal(host_b[k], np.asarray(dev_b[k]))
    np.testing.assert_array_equal(host_v, np.asarray(dev_v))


def test_multimnist_composites_real_idx_digits(tmp_path, monkeypatch):
    """MultiMNIST's disk lane composites REAL MNIST IDX digits (the
    reference's provenance, SURVEY.md 2.10): every canvas pixel comes
    from a source digit, token order is left-to-right, splits use
    disjoint source digits, and the full model batch contract holds."""
    rng = np.random.default_rng(0)
    d = tmp_path / "mnist"
    d.mkdir()
    imgs = rng.integers(0, 256, size=(20, 28, 28)).astype(np.uint8)
    labs = (np.arange(20) % 10).astype(np.uint8)
    _write_idx(d / "train-images-idx3-ubyte", imgs)
    _write_idx(d / "train-labels-idx1-ubyte", labs)
    t_imgs = rng.integers(0, 256, size=(8, 28, 28)).astype(np.uint8)
    t_labs = (np.arange(8) % 10).astype(np.uint8)
    _write_idx(d / "t10k-images-idx3-ubyte", t_imgs)
    _write_idx(d / "t10k-labels-idx1-ubyte", t_labs)
    # Opt-in marker: an (empty) multimnist dir next to the mnist mount.
    (tmp_path / "multimnist").mkdir()

    monkeypatch.setenv("MMVAE_DATA_DIR", str(tmp_path))
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.data.formats import compose_multimnist
    from mmvae_tpu.models.text import PAD, STOP

    ds = load_dataset("multimnist", "train", n=16)
    assert ds.arrays["image"].shape == (16, 50, 50)
    assert ds.arrays["text"].shape == (16, 5)
    img = np.asarray(ds.arrays["image"])
    tok = np.asarray(ds.arrays["text"])
    assert img.max() <= 1.0 and img.min() >= 0.0
    # Deterministic: same split + seed derivation -> identical arrays.
    again = load_dataset("multimnist", "train", n=16)
    np.testing.assert_array_equal(np.asarray(again.arrays["image"]), img)
    # Token grammar: k digits (>= 3), STOP, PAD tail.
    for row in tok:
        k = int((row >= 3).sum())
        assert 1 <= k <= 4
        assert row[k] == STOP and (row[k + 1 :] == PAD).all()
    # Composition math: one-digit canvases equal their source digit
    # placed at the recorded offset (pure max-composite of one glyph).
    comp = compose_multimnist(
        imgs.astype(np.float32) / 255.0, labs, 16, seed=0
    )
    np.testing.assert_array_equal(comp["image"], img)
    np.testing.assert_array_equal(comp["text"], tok)
    # Test split composites the DISJOINT t10k digits.
    ts = load_dataset("multimnist", "test", n=4)
    assert np.asarray(ts.arrays["image"]).shape == (4, 50, 50)
    # Feeds the model end to end.
    import jax

    from mmvae_tpu.models import MultiMnistMVAE
    from mmvae_tpu.train import create_train_state, make_train_step

    model = MultiMnistMVAE(n_latents=8)
    batch = {k: v[:8] for k, v in ds.arrays.items()}
    state = create_train_state(model, batch, jax.random.key(0))
    step = make_train_step(model, annealing_steps=5)
    _, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_celeba_raw_ingestion(tmp_path, monkeypatch):
    """CelebA standard layout (list_attr_celeba.txt + img_align_celeba)
    loads with synthetic-identical shapes; the 18 reference attrs are
    picked by name out of the 40-column header."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from mmvae_tpu.data.synthetic import CELEBA_ATTRS

    d = tmp_path / "celeba"
    (d / "img_align_celeba").mkdir(parents=True)
    rng = np.random.default_rng(1)
    all_attrs = [f"attr{i}" for i in range(40 - 18)] + list(CELEBA_ATTRS)
    rng.shuffle(all_attrs)
    n = 6
    lines = [str(n), " ".join(all_attrs)]
    for i in range(n):
        fname = f"{i:06d}.jpg"
        img = (rng.random((78, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / "img_align_celeba" / fname)
        vals = rng.choice(["-1", "1"], size=40)
        lines.append(fname + " " + " ".join(vals))
    (d / "list_attr_celeba.txt").write_text("\n".join(lines) + "\n")

    monkeypatch.setenv("MMVAE_DATA_DIR", str(tmp_path))
    from mmvae_tpu.data import load_dataset

    ds = load_dataset("celeba", "train", n=None)
    # holdout=2000 > n: the holdout shrinks to 20% (here 1 example) so
    # train and test stay DISJOINT even on tiny mounts.
    assert ds.arrays["image"].shape == (n - 1, 64, 64, 3)
    assert ds.arrays["attrs"].shape == (n - 1, 18)
    ds_test = load_dataset("celeba", "test", n=None)
    assert ds_test.size == 1
    # Disjoint: the test image is not among the train images.
    diffs = np.abs(
        np.asarray(ds.arrays["image"])
        - np.asarray(ds_test.arrays["image"][0])
    ).reshape(n - 1, -1).max(axis=1)
    assert (diffs > 1e-6).all()
    # n slices the name list BEFORE decode (no full-set materialize).
    ds2 = load_dataset("celeba", "train", n=2)
    assert ds2.size == 2
    a = np.asarray(ds.arrays["attrs"])
    assert set(np.unique(a)).issubset({0.0, 1.0})
    img0 = np.asarray(ds.arrays["image"][0])
    assert img0.min() >= 0.0 and img0.max() <= 1.0


def test_cub_raw_ingestion(tmp_path, monkeypatch):
    """CUB-200-2011 + caption-files layout loads end to end: images
    resized, captions tokenized against a persisted corpus vocabulary,
    and build_model sizes the text expert from the same vocab."""
    pytest.importorskip("PIL")
    from PIL import Image

    d = tmp_path / "cub"
    rng = np.random.default_rng(2)
    caps = [
        "a small bird with blue wings",
        "this bird has a red crown and white belly",
        "a large gray bird with a long beak",
    ]
    for cls in ["001.Black_footed_Albatross", "002.Laysan_Albatross"]:
        (d / "images" / cls).mkdir(parents=True)
        (d / "text_c10" / cls).mkdir(parents=True)
        for j in range(3):
            name = f"img_{j:02d}"
            img = (rng.random((70, 60, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / "images" / cls / f"{name}.jpg")
            (d / "text_c10" / cls / f"{name}.txt").write_text(
                caps[j % 3] + "\n" + caps[(j + 1) % 3] + "\n"
            )

    monkeypatch.setenv("MMVAE_DATA_DIR", str(tmp_path))
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.data.formats import cub_data_vocab

    # holdout > n: shrinks to 20% (1 of 6) so train/test stay disjoint.
    ds = load_dataset("cub", "train")
    assert ds.arrays["image"].shape == (5, 64, 64, 3)
    assert ds.arrays["text"].shape[0] == 5
    assert load_dataset("cub", "test").size == 1
    assert (d / "vocab.json").exists()
    vocab = cub_data_vocab(str(d))
    toks = np.asarray(ds.arrays["text"][0])
    decoded = vocab.decode(toks)
    assert decoded in caps  # round-trips through the corpus vocab

    from mmvae_tpu.configs import build_model, get_config

    model = build_model(get_config("cub"))
    assert model.vocab_size == len(vocab)
    # Tokens stay inside the model's embedding table.
    assert int(np.asarray(ds.arrays["text"]).max()) < model.vocab_size


def test_vocab_unk_handling():
    from mmvae_tpu.data.vocab import Vocab

    v = Vocab(["red", "bird"], unk=True)
    ids = v.encode("red unknown bird", max_len=6)
    assert ids[1] == v.stoi["<unk>"]
    assert v.decode(ids) == "red <unk> bird"
    v2 = Vocab(["red", "bird"])  # closed vocab: unknowns raise
    with pytest.raises(KeyError):
        v2.encode("red unknown", max_len=4)


def test_cub_vocab_survives_readonly_mount(tmp_path, monkeypatch):
    """A read-only CUB mount (vocab.json not writable) must still build
    the corpus vocabulary in memory instead of crashing build_model.

    (chmod can't simulate this under root -- root bypasses permission
    bits -- so the persist write itself is patched to raise OSError.)"""
    pytest.importorskip("PIL")
    import json as json_mod

    from PIL import Image

    d = tmp_path / "cub"
    (d / "images" / "001.A").mkdir(parents=True)
    (d / "text_c10" / "001.A").mkdir(parents=True)
    rng = np.random.default_rng(3)
    for j in range(2):
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / "images" / "001.A" / f"i{j}.jpg")
        (d / "text_c10" / "001.A" / f"i{j}.txt").write_text(
            "a bird with black wings\n"
        )

    from mmvae_tpu.data import formats

    def refuse_dump(*a, **k):
        raise OSError(30, "Read-only file system")

    monkeypatch.setattr(json_mod, "dump", refuse_dump)
    formats._VOCAB_CACHE.clear()
    v = formats.cub_data_vocab(str(d))
    assert v is not None and "bird" in v.stoi
    # Memoized: second call must not rescan (cache hit is identity).
    assert formats.cub_data_vocab(str(d)) is v
    formats._VOCAB_CACHE.clear()


def test_grain_empty_epoch_raises():
    """batch_size > train_size through the Grain backend must fail with
    a clear message, not an IndexError on an empty batch list."""
    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MnistMVAE

    pytest.importorskip("grain")
    ds = load_dataset("mnist", n=16, seed=0)
    config = get_config("mnist").replace(batch_size=100)
    model = MnistMVAE(n_latents=8)
    with pytest.raises(ValueError, match="no batches"):
        api._grain_epoch(ds, config, model, seed=0)


def test_cub_vocab_cache_keyed_on_max_words(tmp_path):
    """cub_data_vocab's memo must key on max_words too -- a smaller
    vocabulary request must not return the cached larger one."""
    pytest.importorskip("PIL")
    from PIL import Image

    d = tmp_path / "cub"
    (d / "images" / "001.A").mkdir(parents=True)
    (d / "text_c10" / "001.A").mkdir(parents=True)
    rng = np.random.default_rng(4)
    caps = ["a b c d e", "f g h i j", "k l m n o"]
    for j in range(3):
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / "images" / "001.A" / f"i{j}.jpg")
        (d / "text_c10" / "001.A" / f"i{j}.txt").write_text(caps[j])

    from mmvae_tpu.data import formats

    formats._VOCAB_CACHE.clear()
    big = formats.cub_data_vocab(str(d))
    (d / "vocab.json").unlink()  # force a rebuild for the small request
    small = formats.cub_data_vocab(str(d), max_words=4)
    assert len(big) > len(small)
    formats._VOCAB_CACHE.clear()


def test_dataset_astype_uint8_quantization():
    """uint8 residency: floats quantize to the 1/255 grid (exact for
    0/1-valued attrs, <=1/510 for continuous pixels); ints untouched."""
    from mmvae_tpu.data import dataset_astype
    import jax.numpy as jnp

    ds = load_dataset("celeba", n=16, seed=0)
    q = dataset_astype(ds, jnp.uint8)
    assert q.arrays["image"].dtype == jnp.uint8
    assert q.arrays["attrs"].dtype == jnp.uint8
    # 0/1-valued attrs survive the round trip bit-exactly (division:
    # 0/255 and 255/255 are exact).
    back = np.asarray(q.arrays["attrs"]).astype(np.float32) / 255.0
    np.testing.assert_array_equal(back, np.asarray(ds.arrays["attrs"]))
    # Continuous pixels: within half a quantization step.
    img = np.asarray(ds.arrays["image"])
    back_img = np.asarray(q.arrays["image"]).astype(np.float32) / 255.0
    assert np.abs(back_img - img).max() <= 0.5 / 255.0 + 1e-7

    ds_t = load_dataset("multimnist", n=8, seed=0)
    q_t = dataset_astype(ds_t, jnp.uint8)
    assert q_t.arrays["text"].dtype == ds_t.arrays["text"].dtype
    np.testing.assert_array_equal(
        np.asarray(q_t.arrays["text"]), np.asarray(ds_t.arrays["text"])
    )
