"""Real-dataset format readers (IDX, CelebA attr-list + images).

The synthetic generators are the offline default (SURVEY.md section 7:
no network, no cached datasets), and ``$MMVAE_DATA_DIR/<name>/<split>.npz``
is the canonical real-data drop point. This module additionally reads the
datasets' STANDARD distribution formats, so mounting an unmodified
download also works:

  * MNIST / FashionMNIST: IDX files (``train-images-idx3-ubyte`` +
    ``train-labels-idx1-ubyte`` / ``t10k-...``), optionally gzipped --
    the format of the original LeCun/Zalando distributions.
  * CelebA: ``list_attr_celeba.txt`` (40 named +-1 attributes; the 18
    the reference uses are selected by name) + ``img_align_celeba/``
    JPEG/PNG images, center-cropped and resized to 64x64 like the
    reference preprocessing.
  * CUB: ``images/<class>/*.jpg`` + ``text_c10/<class>/*.txt`` caption
    files (the CUB-200-2011 + cvpr2016-captions layout); a word
    vocabulary is built once from the corpus and persisted as
    ``vocab.json`` in the data dir (model sizing reads it too).

All readers return modality dicts shaped exactly like
``mmvae_tpu.data.synthetic`` so the rest of the stack is agnostic.
"""

from __future__ import annotations

import gzip
import os
import struct

import numpy as np

__all__ = [
    "read_idx",
    "load_mnist_idx",
    "compose_multimnist",
    "load_multimnist_composite",
    "load_celeba_raw",
    "load_cub_raw",
    "cub_data_vocab",
]


def read_idx(path: str) -> np.ndarray:
    """Parse one IDX file (big-endian header: magic, dims)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        if zero != 0:
            raise ValueError(f"{path}: bad IDX magic (leading {zero:#x})")
        dtypes = {
            0x08: np.uint8, 0x09: np.int8, 0x0B: np.int16,
            0x0C: np.int32, 0x0D: np.float32, 0x0E: np.float64,
        }
        if dtype_code not in dtypes:
            raise ValueError(f"{path}: unknown IDX dtype {dtype_code:#x}")
        shape = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=np.dtype(dtypes[dtype_code]).newbyteorder(">"))
    return data.reshape(shape)


_IDX_NAMES = {
    "train": ("train-images-idx3-ubyte", "train-labels-idx1-ubyte"),
    "test": ("t10k-images-idx3-ubyte", "t10k-labels-idx1-ubyte"),
}


def _find_idx(dirpath: str, stem: str) -> str | None:
    for cand in (stem, stem + ".gz"):
        p = os.path.join(dirpath, cand)
        if os.path.exists(p):
            return p
    return None


def load_mnist_idx(dirpath: str, split: str) -> dict[str, np.ndarray] | None:
    """MNIST-family IDX pair -> {image: (N,28,28) f32 in [0,1],
    label: (N,) i32}, or None if the files aren't there."""
    img_stem, lab_stem = _IDX_NAMES[split]
    img_path = _find_idx(dirpath, img_stem)
    lab_path = _find_idx(dirpath, lab_stem)
    if img_path is None or lab_path is None:
        return None
    images = read_idx(img_path).astype(np.float32) / 255.0
    labels = read_idx(lab_path).astype(np.int32)
    if len(images) != len(labels):
        raise ValueError(
            f"{dirpath}: {len(images)} images vs {len(labels)} labels"
        )
    return {"image": images, "label": labels}


def compose_multimnist(
    images: np.ndarray,
    labels: np.ndarray,
    n: int,
    seed: int,
    hw: int = 50,
    max_digits: int = 4,
) -> dict[str, np.ndarray]:
    """Composite REAL digit images onto ``hw x hw`` canvases.

    The reference's MultiMNIST provenance (SURVEY.md 2.10 [K]: "the
    MultiMNIST generator composites digits" from the MNIST dataset):
    each canvas takes 1..max_digits digits sampled (with replacement)
    from ``images``/``labels``, placed at random offsets with
    left-to-right x order matching the token order, merged by
    per-pixel max -- the same layout contract as the synthetic
    generator (``data/synthetic.py::make_multimnist``), so the model,
    token vocabulary (digit d -> 3+d, then STOP, PAD) and every
    quality metric apply unchanged; only the glyphs' provenance
    differs (real handwriting vs procedural strokes).
    """
    from mmvae_tpu.data.synthetic import PAD, STOP

    rng = np.random.default_rng(seed)
    gh, gw = images.shape[1:3]
    if gh > hw or gw > hw:
        raise ValueError(f"digit {gh}x{gw} larger than canvas {hw}")
    seq_len = max_digits + 1
    out = np.zeros((n, hw, hw), np.float32)
    tokens = np.full((n, seq_len), PAD, np.int32)
    counts = rng.integers(1, max_digits + 1, size=n)
    for i in range(n):
        k = counts[i]
        idx = rng.integers(0, len(images), size=k)
        xs = np.sort(rng.integers(0, hw - gw + 1, size=k))
        ys = rng.integers(0, hw - gh + 1, size=k)
        for j, x0, y0 in zip(idx, xs, ys):
            patch = out[i, y0 : y0 + gh, x0 : x0 + gw]
            np.maximum(patch, images[j], out=patch)
        tokens[i, :k] = labels[idx].astype(np.int32) + 3
        tokens[i, k] = STOP
    return {"image": out, "text": tokens}


def load_multimnist_composite(
    data_dir: str,
    split: str,
    n: int | None = None,
    hw: int = 50,
    max_digits: int = 4,
) -> dict[str, np.ndarray] | None:
    """MultiMNIST from REAL MNIST IDX files, or None if absent.

    Looks for the IDX pair under ``<data_dir>/multimnist/`` first, then
    falls back to the sibling ``<data_dir>/mnist/`` mount -- the
    reference generates MultiMNIST FROM the MNIST dataset, so a single
    MNIST download serves both. Source digits stay split-disjoint
    (train canvases composite train digits, test canvases t10k digits)
    and the composition seed is split-fixed, so every process derives
    the identical dataset.
    """
    arrays = None
    for sub in ("multimnist", "mnist"):
        d = os.path.join(data_dir, sub)
        if os.path.isdir(d):
            arrays = load_mnist_idx(d, split)
            if arrays is not None:
                break
    if arrays is None:
        return None
    if n is None:
        n = len(arrays["image"])
    seed = {"train": 0, "test": 1_000_003}[split]
    return compose_multimnist(
        arrays["image"], arrays["label"], n, seed,
        hw=hw, max_digits=max_digits,
    )


def _split_holdout(items, split: str, holdout: int):
    """Disjoint train/test split: last ``holdout`` items are test.

    Small mounts shrink the holdout (20% of the data) instead of
    silently returning the SAME items for both splits -- train/test
    overlap would corrupt the parity metric."""
    n = len(items)
    if n <= holdout:
        holdout = max(1, n // 5)
    out = items[:-holdout] if split == "train" else items[-holdout:]
    if not out:
        raise ValueError(
            f"dataset too small to split: {n} examples, holdout {holdout}"
        )
    return out


def load_celeba_raw(
    dirpath: str, split: str, hw: int = 64,
    holdout: int = 2000, n: int | None = None,
) -> dict[str, np.ndarray] | None:
    """CelebA standard layout -> {image: (N,hw,hw,3) f32,
    attrs: (N,18) f32}, or None if absent.

    Expects ``list_attr_celeba.txt`` and an ``img_align_celeba/`` (or
    ``images/``) directory. Without the official eval partition file the
    last ``holdout`` examples are the test split (deterministic order).
    The 18 reference attributes are selected by NAME from the 40-column
    header (SURVEY.md 2.6).
    """
    from mmvae_tpu.data.synthetic import CELEBA_ATTRS

    attr_path = os.path.join(dirpath, "list_attr_celeba.txt")
    img_dir = None
    for cand in ("img_align_celeba", "images"):
        d = os.path.join(dirpath, cand)
        if os.path.isdir(d):
            img_dir = d
            break
    if not os.path.exists(attr_path) or img_dir is None:
        return None

    from PIL import Image

    with open(attr_path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    # Official format: count line, header line, then "<fname> +1 -1 ...".
    if lines and lines[0].isdigit():
        lines = lines[1:]
    header = lines[0].split()
    cols = [header.index(a) for a in CELEBA_ATTRS]
    names, attrs = [], []
    for ln in lines[1:]:
        parts = ln.split()
        names.append(parts[0])
        vals = np.array([float(parts[1 + c]) for c in cols], np.float32)
        attrs.append((vals > 0).astype(np.float32))
    names = _split_holdout(names, split, holdout)
    attrs = _split_holdout(attrs, split, holdout)
    if n is not None:
        # Slice the NAME list before decoding: a full CelebA download is
        # ~200k JPEGs / ~10 GB decoded -- only decode what's requested.
        names, attrs = names[:n], attrs[:n]

    images = np.empty((len(names), hw, hw, 3), np.float32)
    for i, fname in enumerate(names):
        with Image.open(os.path.join(img_dir, fname)) as im:
            im = im.convert("RGB")
            # Reference preprocessing: center crop to square, resize.
            w, h = im.size
            s = min(w, h)
            im = im.crop(
                ((w - s) // 2, (h - s) // 2,
                 (w + s) // 2, (h + s) // 2)
            ).resize((hw, hw), Image.BILINEAR)
            images[i] = np.asarray(im, np.float32) / 255.0
    return {"image": images, "attrs": np.stack(attrs)}


def _cub_pairs(dirpath: str) -> list[tuple[str, str]] | None:
    """Sorted (image_path, caption_path) pairs of the CUB-200-2011 +
    cvpr2016-captions layout: ``images/<class>/<name>.jpg`` paired with
    ``text_c10/<class>/<name>.txt`` (or ``text/``)."""
    img_root = os.path.join(dirpath, "images")
    txt_root = None
    for cand in ("text_c10", "text", "captions"):
        d = os.path.join(dirpath, cand)
        if os.path.isdir(d):
            txt_root = d
            break
    if not os.path.isdir(img_root) or txt_root is None:
        return None
    pairs = []
    for root, _, files in os.walk(img_root):
        for fname in files:
            if not fname.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            rel = os.path.relpath(os.path.join(root, fname), img_root)
            txt = os.path.join(
                txt_root, os.path.splitext(rel)[0] + ".txt"
            )
            if os.path.exists(txt):
                pairs.append((os.path.join(root, fname), txt))
    return sorted(pairs) or None


# Corpus scan is expensive (every caption file); memoize per data dir so
# model sizing + train + test share one build within a process.
_VOCAB_CACHE: dict[str, object] = {}


def cub_data_vocab(dirpath: str, max_words: int = 2000):
    """Build (or load the persisted) word vocabulary for a real CUB
    caption corpus: most-frequent ``max_words`` words + <unk>.

    Persisted as ``vocab.json`` in the data dir so separate processes
    agree; a read-only mount just skips persistence (the build is
    deterministic -- sorted pairs, most_common ties broken by count then
    insertion -- so every process derives the identical vocabulary)."""
    import json

    from mmvae_tpu.data.vocab import Vocab

    key = (os.path.abspath(dirpath), max_words)
    if key in _VOCAB_CACHE:
        return _VOCAB_CACHE[key]
    vpath = os.path.join(dirpath, "vocab.json")
    if os.path.exists(vpath):
        with open(vpath) as f:
            itos = json.load(f)["itos"]
        v = Vocab([], unk=True)
        v.itos = itos
        v.stoi = {w: i for i, w in enumerate(itos)}
        _VOCAB_CACHE[key] = v
        return v
    pairs = _cub_pairs(dirpath)
    if pairs is None:
        return None
    from collections import Counter

    counts = Counter()
    for _, txt in pairs:
        with open(txt) as f:
            for line in f:
                counts.update(_normalize_caption(line).split())
    words = [w for w, _ in counts.most_common(max_words)]
    v = Vocab(words, unk=True)
    try:
        # tmp + rename: never leave a truncated vocab.json for another
        # process to misparse.
        with open(vpath + ".tmp", "w") as f:
            json.dump({"itos": v.itos}, f)
        os.replace(vpath + ".tmp", vpath)
    except OSError:
        # Read-only dataset mount: in-memory vocab still works (the
        # build is deterministic, every process derives the same one).
        try:
            os.unlink(vpath + ".tmp")
        except OSError:
            pass
    _VOCAB_CACHE[key] = v
    return v


def _normalize_caption(line: str) -> str:
    keep = []
    for ch in line.strip().lower():
        if ch.isalnum() or ch == " ":
            keep.append(ch)
        elif ch in "-/":
            keep.append(" ")
    return " ".join("".join(keep).split())


def load_cub_raw(
    dirpath: str, split: str, hw: int = 64, max_len: int = 32,
    holdout: int = 1000, n: int | None = None,
) -> dict[str, np.ndarray] | None:
    """CUB images + caption files -> {image: (N,hw,hw,3) f32,
    text: (N,max_len) i32}, or None if the layout is absent.

    Uses the first caption per image (the reference trains one caption
    per image pass); the shared data-dir vocabulary comes from
    :func:`cub_data_vocab`. Last ``holdout`` pairs are the test split.
    """
    pairs = _cub_pairs(dirpath)
    if pairs is None:
        return None
    vocab = cub_data_vocab(dirpath)

    from PIL import Image

    pairs = _split_holdout(pairs, split, holdout)
    if n is not None:
        pairs = pairs[:n]  # decode only the requested examples
    images = np.empty((len(pairs), hw, hw, 3), np.float32)
    tokens = np.empty((len(pairs), max_len), np.int32)
    for i, (img_path, txt_path) in enumerate(pairs):
        with Image.open(img_path) as im:
            im = im.convert("RGB")
            w, h = im.size
            s = min(w, h)
            im = im.crop(
                ((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2)
            ).resize((hw, hw), Image.BILINEAR)
            images[i] = np.asarray(im, np.float32) / 255.0
        with open(txt_path) as f:
            first = next(
                (ln for ln in f if ln.strip()), ""
            )
        tokens[i] = vocab.encode(_normalize_caption(first), max_len)
    return {"image": images, "text": tokens}
