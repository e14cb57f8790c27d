"""Round-4 dress rehearsal: the real-data formats path at DATASET scale.

VERDICT r3 missing #4: the standard-format readers (data/formats.py)
were unit-tested on few-hundred-example fixture trees only, and every
quality number came from the in-memory synthetic generators. Real
datasets don't exist in this offline environment (SURVEY.md section 7),
but a full-SCALE rehearsal is still possible: synthesize the datasets'
STANDARD DISTRIBUTION formats at true cardinality, then drive
``MMVAE_DATA_DIR=... cli train --data-backend grain`` end to end to a
quality row -- exercising file ordering, memory, JPEG decode, vocab
building and the grain stream at the sizes a real mount would have.

  * mnist: 60,000/10,000 IDX files (train-images-idx3-ubyte etc.), the
    LeCun distribution format, uint8 pixels.
  * fashionmnist: the same IDX pair layout (Zalando distribution),
    60,000/10,000 (round-5: VERDICT r4 missing #1).
  * multimnist: NO files of its own -- composited on the fly from the
    REAL mnist IDX digits by the reader
    (data/formats.py::load_multimnist_composite), the reference's
    actual provenance (SURVEY.md 2.10); an empty multimnist/ dir opts
    it in (round-5: VERDICT r4 missing #1).
  * celeba: ``list_attr_celeba.txt`` (+-1 attrs, count+header lines) +
    ``img_align_celeba/`` JPEGs at >=50k images.
  * cub: ``images/<class>/*.jpg`` + ``text_c10/<class>/*.txt`` caption
    files at the CUB-200-2011 cardinality (11,788 images, 200 classes).

Pixels come from the same deterministic synthetic generators the rest
of the repo uses (chunked -- never the whole dataset in memory at
generation time); captions are decoded back to words through the
synthetic vocabulary so the READER's corpus-vocab build is exercised
for real. JPEG is lossy, so the trained numbers are their own quality
row (recorded in the output JSON), not comparable bit-for-bit to the
in-memory rows -- that is the point: this row's provenance is disk
formats.

Usage:
  python tools/dress_rehearsal.py --root /tmp/mmvae_data \
      [--datasets mnist,celeba,cub] [--celeba-n 50000] [--epochs 3]
      [--skip-gen]  # reuse an existing tree
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


# ------------------------------------------------------------------ IDX
def write_idx(path: str, arr: np.ndarray) -> None:
    """Write the LeCun IDX format (magic: 0x08=ubyte, ndim)."""
    arr = np.ascontiguousarray(arr, np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">BBBB", 0, 0, 0x08, arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


def gen_mnist_idx(root: str, n_train=60000, n_test=10000,
                  name="mnist") -> None:
    from mmvae_tpu.data.synthetic import make_fashionmnist, make_mnist

    gen = make_fashionmnist if name == "fashionmnist" else make_mnist
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    for split, n, seed, stem in (
        ("train", n_train, 0, "train"),
        ("test", n_test, 1_000_003, "t10k"),
    ):
        arrays = gen(n, seed=seed)
        imgs = np.round(arrays["image"] * 255).astype(np.uint8)
        write_idx(os.path.join(d, f"{stem}-images-idx3-ubyte"), imgs)
        write_idx(
            os.path.join(d, f"{stem}-labels-idx1-ubyte"),
            arrays["label"].astype(np.uint8),
        )


def gen_multimnist_dir(root: str) -> None:
    """MultiMNIST ships NO files of its own: the reference composites
    canvases from the MNIST dataset (SURVEY.md 2.10), and the reader
    (data/formats.py::load_multimnist_composite) does the same from the
    sibling mnist IDX mount. An (empty) multimnist/ dir opts the
    dataset into the disk path; the mnist tree must exist."""
    os.makedirs(os.path.join(root, "multimnist"), exist_ok=True)
    if not os.path.isdir(os.path.join(root, "mnist")):
        gen_mnist_idx(root)


# --------------------------------------------------------------- CelebA
def gen_celeba_tree(root: str, n=50000, chunk=2000) -> None:
    from PIL import Image

    from mmvae_tpu.data.synthetic import CELEBA_ATTRS, make_celeba

    d = os.path.join(root, "celeba")
    img_dir = os.path.join(d, "img_align_celeba")
    os.makedirs(img_dir, exist_ok=True)
    lines = [str(n), " ".join(CELEBA_ATTRS)]
    done = 0
    t0 = time.time()
    while done < n:
        m = min(chunk, n - done)
        # Chunk-seeded, chunk-sized generation: O(chunk) memory. The
        # per-chunk seed keeps the tree deterministic under resume.
        arrays = make_celeba(m, seed=1000 + done)
        imgs = np.round(arrays["image"] * 255).astype(np.uint8)
        attrs = arrays["attrs"]
        for i in range(m):
            fname = f"{done + i + 1:06d}.jpg"
            Image.fromarray(imgs[i]).save(
                os.path.join(img_dir, fname), quality=95
            )
            vals = " ".join(
                "1" if a > 0.5 else "-1" for a in attrs[i]
            )
            lines.append(f"{fname} {vals}")
        done += m
        print(
            f"  celeba {done}/{n} ({done / (time.time() - t0):.0f}/s)",
            flush=True,
        )
    with open(os.path.join(d, "list_attr_celeba.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


# ------------------------------------------------------------------ CUB
def gen_cub_tree(root: str, n=11788, n_classes=200, chunk=2000) -> None:
    from PIL import Image

    from mmvae_tpu.data.synthetic import cub_vocab, make_cub

    d = os.path.join(root, "cub")
    vocab = cub_vocab()
    done = 0
    t0 = time.time()
    while done < n:
        m = min(chunk, n - done)
        arrays = make_cub(m, seed=2000 + done)
        imgs = np.round(arrays["image"] * 255).astype(np.uint8)
        toks = arrays["text"]
        for i in range(m):
            gi = done + i
            cls = f"{gi % n_classes + 1:03d}.Synth_Bird_{gi % n_classes}"
            img_cls = os.path.join(d, "images", cls)
            txt_cls = os.path.join(d, "text_c10", cls)
            os.makedirs(img_cls, exist_ok=True)
            os.makedirs(txt_cls, exist_ok=True)
            stem = f"Synth_Bird_{gi:05d}"
            Image.fromarray(imgs[i]).save(
                os.path.join(img_cls, stem + ".jpg"), quality=95
            )
            words = [
                vocab.itos[t]
                for t in toks[i]
                if 0 <= t < len(vocab.itos)
                and vocab.itos[t]
                not in ("<pad>", "<start>", "<stop>", "<unk>")
            ]
            with open(os.path.join(txt_cls, stem + ".txt"), "w") as f:
                f.write(" ".join(words) + "\n")
        done += m
        print(
            f"  cub {done}/{n} ({done / (time.time() - t0):.0f}/s)",
            flush=True,
        )


def _tree_present(root: str, name: str, args) -> bool:
    """True when an existing tree matches the REQUESTED cardinality.

    Existence alone is not enough: reusing a smaller tree (e.g. from a
    --celeba-n smoke run) would silently rehearse fewer examples than
    the sizes table records -- measurement contamination (round-5
    review finding). multimnist is mkdir-only (always regenerated
    cheaply), so it never claims presence."""
    if name in ("mnist", "fashionmnist"):
        p = os.path.join(root, name, "train-images-idx3-ubyte")
        if not os.path.exists(p):
            return False
        from mmvae_tpu.data.formats import read_idx

        return read_idx(p).shape[0] >= 60000
    if name == "celeba":
        p = os.path.join(root, "celeba", "list_attr_celeba.txt")
        if not os.path.exists(p):
            return False
        with open(p) as f:
            first = f.readline().strip()
        return first.isdigit() and int(first) >= args.celeba_n
    if name == "cub":
        img_root = os.path.join(root, "cub", "images")
        if not os.path.isdir(img_root):
            return False
        n = sum(
            len([f for f in files if f.lower().endswith(".jpg")])
            for _, _, files in os.walk(img_root)
        )
        return n >= args.cub_n
    return False


# ---------------------------------------------------------------- train
def rehearse(name: str, root: str, epochs: int, train_size: int,
             test_size: int, data_dtype: str = "uint8") -> dict:
    """Real-format tree -> grain-backed training -> quality row.

    data_dtype defaults uint8: EXACT for this 8-bit-native disk data
    (BASELINE.md dtype section) and quarters the bytes shipped through
    the ~10-37 MB/s axon relay, which binds the grain path in this
    environment (BASELINE.md grain delta)."""
    os.environ["MMVAE_DATA_DIR"] = root
    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    cfg = get_config(name).replace(
        epochs=epochs,
        train_size=train_size,
        test_size=test_size,
        data_backend="grain",
        data_dtype=data_dtype,
    )
    t0 = time.time()
    res = api.train(cfg, None, verbose=True)
    wall = time.time() - t0
    losses = [h["train_loss"] for h in res.history]
    return {
        "dataset": name,
        "provenance": "disk standard formats via MMVAE_DATA_DIR",
        "backend": "grain",
        "data_dtype": data_dtype,
        "train_size": train_size,
        "test_size": test_size,
        "epochs": epochs,
        "first_epoch_loss": losses[0],
        "final_epoch_loss": losses[-1],
        "best_test_elbo": res.best_test_elbo,
        "decreased": losses[-1] < losses[0],
        "wall_s": wall,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/mmvae_data")
    ap.add_argument(
        "--datasets",
        default="mnist,fashionmnist,multimnist,celeba,cub",
    )
    ap.add_argument("--celeba-n", type=int, default=50000)
    ap.add_argument("--cub-n", type=int, default=11788)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--gen-only", action="store_true",
                    help="generate the trees and exit (lets the "
                    "CPU-bound generation overlap other TPU work)")
    ap.add_argument("--out", default="docs/experiments/dress_rehearsal.json")
    args = ap.parse_args()

    names = args.datasets.split(",")
    if not args.skip_gen:
        for name in names:
            if _tree_present(args.root, name, args):
                print(f"{name} tree present at the requested size, "
                      "reusing", flush=True)
                continue
            print(f"generating {name} tree under {args.root} ...",
                  flush=True)
            t0 = time.time()
            if name in ("mnist", "fashionmnist"):
                gen_mnist_idx(args.root, name=name)
            elif name == "multimnist":
                gen_multimnist_dir(args.root)
            elif name == "celeba":
                gen_celeba_tree(args.root, n=args.celeba_n)
            elif name == "cub":
                gen_cub_tree(args.root, n=args.cub_n)
            print(f"  {name}: {time.time() - t0:.0f}s", flush=True)
    if args.gen_only:
        print("GEN_DONE")
        return 0

    sizes = {
        # train_size/test_size: full IDX train split for mnist; celeba
        # and cub sized to their tree minus holdout (reader defaults:
        # celeba holdout 2000, cub holdout 1000).
        "mnist": (60000, 10000),
        "fashionmnist": (60000, 10000),
        # Composited on the fly from the 60k/10k IDX digits (the
        # composition is the provenance under test, not a file tree).
        "multimnist": (60000, 10000),
        "celeba": (args.celeba_n - 2000, 2000),
        "cub": (args.cub_n - 1000, 1000),
    }
    rows = []
    for name in names:
        tr, te = sizes[name]
        print(f"rehearsing {name} (train {tr} / test {te}) ...",
              flush=True)
        rows.append(rehearse(name, args.root, args.epochs, tr, te))
        print(json.dumps(rows[-1], indent=2), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    bad = [r["dataset"] for r in rows if not r["decreased"]]
    print("REHEARSAL", "FAILED for " + ",".join(bad) if bad else "OK")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
