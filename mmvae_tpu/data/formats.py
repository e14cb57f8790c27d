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

All readers return modality dicts shaped exactly like
``mmvae_tpu.data.synthetic`` so the rest of the stack is agnostic.
"""

from __future__ import annotations

import gzip
import os
import struct

import numpy as np

__all__ = ["read_idx", "load_mnist_idx", "load_celeba_raw"]


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


def load_celeba_raw(
    dirpath: str, split: str, hw: int = 64,
    holdout: int = 2000,
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
    if split == "train":
        names, attrs = names[:-holdout] or names, attrs[:-holdout] or attrs
    else:
        names, attrs = names[-holdout:], attrs[-holdout:]

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
