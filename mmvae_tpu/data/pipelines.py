"""Input pipelines: device-resident datasets, batching, modality dropout.

TPU-native design (vs the reference's host-side DataLoader workers,
SURVEY.md 2.10): these datasets fit in HBM, so the whole epoch lives on
device and every batch is an on-device gather by a shuffled index vector --
zero host->device transfer in the steady-state hot loop, which is what the
>=10x-CPU throughput target rides on ([B:2]). Real data, when present
under ``$MMVAE_DATA_DIR/<name>/{split}.npz``, is loaded with identical
shapes; otherwise the seeded synthetic generators are used
(``mmvae_tpu.data.synthetic``).
"""

from __future__ import annotations

import os
from typing import Any, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mmvae_tpu.data import synthetic

__all__ = [
    "Dataset",
    "load_dataset",
    "epoch_batches",
    "stacked_epoch",
    "sample_presence",
]


class Dataset(NamedTuple):
    """A device-resident modality dict + size."""

    arrays: dict[str, jnp.ndarray]
    size: int

    def take_host(self, idx) -> dict[str, np.ndarray]:
        return {k: np.asarray(v[idx]) for k, v in self.arrays.items()}


_GENERATORS = {
    "mnist": synthetic.make_mnist,
    "fashionmnist": synthetic.make_fashionmnist,
    "multimnist": synthetic.make_multimnist,
    "celeba": synthetic.make_celeba,
    "cub": synthetic.make_cub,
}


def load_dataset(
    name: str,
    split: str = "train",
    n: int | None = None,
    seed: int | None = None,
    device_put: bool = True,
    sharding=None,
    gen_kwargs: dict[str, Any] | None = None,
) -> Dataset:
    """Load real data if present, else generate synthetic.

    ``split`` only affects the synthetic seed (train/test are disjoint
    draws) and the real-data filename. ``sharding`` optionally places the
    arrays with a NamedSharding (e.g. batch-sharded over the mesh).
    ``gen_kwargs`` forward to the synthetic generator only (e.g.
    ``hw=128`` for 128x128 CUB images); mounted real data is returned
    as-is.
    """
    if name not in _GENERATORS:
        raise ValueError(f"unknown dataset {name!r}; have {list(_GENERATORS)}")
    data_dir = os.environ.get("MMVAE_DATA_DIR", "")
    path = os.path.join(data_dir, name, f"{split}.npz") if data_dir else ""
    arrays = None
    if path and os.path.exists(path):
        with np.load(path) as f:
            arrays = {k: f[k] for k in f.files}
    elif data_dir and os.path.isdir(os.path.join(data_dir, name)):
        # Standard distribution formats (IDX / CelebA attr-list+images),
        # so mounting an unmodified download also works.
        from mmvae_tpu.data import formats

        d = os.path.join(data_dir, name)
        if name in ("mnist", "fashionmnist"):
            arrays = formats.load_mnist_idx(d, split)
        elif name == "multimnist":
            # Composited from REAL MNIST IDX digits (the reference's
            # provenance) -- served by <dir>/multimnist or the sibling
            # <dir>/mnist mount; gen_kwargs' hw/max_digits apply.
            arrays = formats.load_multimnist_composite(
                data_dir, split, n=n, **(gen_kwargs or {})
            )
        elif name == "celeba":
            # n plumbs through so only the requested examples are
            # JPEG-decoded (a full download is ~200k images).
            arrays = formats.load_celeba_raw(d, split, n=n)
        elif name == "cub":
            arrays = formats.load_cub_raw(d, split, n=n)
    if arrays is None:
        defaults = {"train": 10000, "test": 2000}
        if seed is None:
            seed = {"train": 0, "test": 1_000_003}[split]
        gen = _GENERATORS[name]
        if os.environ.get("MMVAE_DATAGEN") == "native":
            # C++/OpenMP generators (native/datagen.cpp) for the two
            # loop-heavy rasterizers -- ~5x the numpy path per core.
            from mmvae_tpu.data import native as native_gen

            if name == "celeba" and native_gen.available():
                gen = native_gen.make_celeba_native
            elif name == "multimnist" and native_gen.available():
                gen = native_gen.make_multimnist_native
        arrays = gen(n or defaults[split], seed=seed, **(gen_kwargs or {}))
    if n is not None:
        arrays = {k: v[:n] for k, v in arrays.items()}
    size = len(next(iter(arrays.values())))
    if device_put:
        arrays = {
            k: jax.device_put(v, sharding) if sharding is not None
            else jnp.asarray(v)
            for k, v in arrays.items()
        }
    return Dataset(arrays=arrays, size=size)


def epoch_batches(
    dataset: Dataset,
    batch_size: int,
    rng: np.random.Generator | None = None,
    drop_remainder: bool = True,
) -> Iterator[dict[str, Any]]:
    """Yield shuffled on-device batches (gather by index, no host copy)."""
    order = (
        rng.permutation(dataset.size)
        if rng is not None
        else np.arange(dataset.size)
    )
    n_batches = dataset.size // batch_size
    for b in range(n_batches):
        idx = jnp.asarray(order[b * batch_size : (b + 1) * batch_size])
        yield {k: jnp.take(v, idx, axis=0) for k, v in dataset.arrays.items()}
    if not drop_remainder and dataset.size % batch_size:
        idx = jnp.asarray(order[n_batches * batch_size :])
        yield {k: jnp.take(v, idx, axis=0) for k, v in dataset.arrays.items()}


def dataset_astype(dataset: "Dataset", dtype) -> "Dataset":
    """Same dataset with float32 modalities stored as ``dtype``.

    The ``data_dtype="bfloat16"`` knob: halves the per-step HBM batch
    read on device-resident training data (int/token modalities are
    untouched). One cast at load time, not per epoch.

    ``dtype=uint8`` quantizes instead (``round(clip(x, 0, 1) * 255)``):
    4x fewer resident bytes than f32, 2x fewer than bf16 -- and for
    8-bit-native real image data (MNIST/CelebA/CUB distributions ship
    uint8 pixels) the quantization is EXACT, f32 residency being the
    inflated format. Float modalities in this family are bernoulli
    targets/inputs in [0, 1] by model contract (0/1-valued labels and
    attrs survive the round trip bit-exactly; continuous synthetic
    pixels pick up <=1/510 rounding). The train step dequantizes
    in-program (``train/step.py::_dequant_data``) with a convert that
    fuses into the consuming encoder/NLL ops."""
    dtype = jnp.dtype(dtype)
    cast = quantize_uint8 if dtype == jnp.uint8 else (
        lambda v: v.astype(dtype)
    )
    return Dataset(
        arrays={
            k: (cast(v) if v.dtype == jnp.float32 else v)
            for k, v in dataset.arrays.items()
        },
        size=dataset.size,
    )


def quantize_uint8(v):
    """``round(clip(x, 0, 1) * 255) -> uint8`` on numpy OR jax arrays.

    The single quantizer both backends share (device-resident casts and
    the grain path's host-side per-epoch cast) -- the two must stay
    rounding-identical or the backends would train on different data.
    CONTRACT: a uint8 array in a training batch MEANS "quantized [0, 1]
    float data" -- the step dequantizes every uint8 leaf by /255
    (``train/step.py::_dequant_data``), so integer token/label
    modalities must stay int32 (they do, across ``synthetic.py`` and
    ``formats.py``)."""
    if isinstance(v, np.ndarray):
        return np.round(np.clip(v, 0.0, 1.0) * 255.0).astype(np.uint8)
    return jnp.round(jnp.clip(v, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def stacked_epoch(
    dataset: Dataset,
    batch_size: int,
    rng: np.random.Generator | None = None,
    sharding=None,
) -> dict[str, jnp.ndarray]:
    """One shuffled epoch pre-stacked to ``(n_steps, batch, ...)``.

    One on-device gather per epoch; feeds the ``lax.scan``-fused epoch
    runner (``mmvae_tpu.train.make_epoch_runner``) so the hot loop has
    zero per-step host work. ``sharding`` (e.g. ``P(None, "data")``)
    places the stacked batches with the batch axis over the mesh.
    """
    order = (
        rng.permutation(dataset.size)
        if rng is not None
        else np.arange(dataset.size)
    )
    n_steps = dataset.size // batch_size
    idx = jnp.asarray(
        order[: n_steps * batch_size].reshape(n_steps, batch_size)
    )
    out = {k: jnp.take(v, idx, axis=0) for k, v in dataset.arrays.items()}
    if sharding is not None:
        out = {k: jax.device_put(v, sharding) for k, v in out.items()}
    return out


def stacked_epoch_padded(
    dataset: Dataset, batch_size: int, host: bool = False
) -> tuple[dict[str, jnp.ndarray], jnp.ndarray]:
    """The whole split pre-stacked to ``(ceil(size/bs), bs, ...)``.

    Unlike :func:`stacked_epoch` (which drops the remainder -- fine for
    training, wrong for eval), the last batch is padded by wrapping to
    the front of the split, and a ``(n_steps, bs)`` float validity mask
    marks the real rows. Eval feeds the mask in as an all-modalities
    presence mask, so pad rows contribute exactly zero to every ELBO
    term (prior posterior -> KL 0; masked recon -> 0) and the caller
    recovers the true split mean as ``sum(batch_means) * bs / size``.

    ``host=True`` stacks with numpy and returns HOST arrays -- the
    segmented (beyond-HBM) eval lane's requirement: the default
    ``jnp.take`` would commit the whole stacked split to the default
    device at construction, defeating the O(1 segment) residency the
    lane exists for (round-5 review finding).
    """
    size = dataset.size
    n_steps = -(-size // batch_size)
    total = n_steps * batch_size
    idx = np.arange(total) % size
    valid = (np.arange(total) < size).astype(np.float32)
    valid = valid.reshape(n_steps, batch_size)
    if host:
        idx_h = idx.reshape(n_steps, batch_size)
        out = {
            k: np.asarray(v)[idx_h] for k, v in dataset.arrays.items()
        }
        return out, valid
    idx_j = jnp.asarray(idx.reshape(n_steps, batch_size))
    out = {k: jnp.take(v, idx_j, axis=0) for k, v in dataset.arrays.items()}
    return out, jnp.asarray(valid)


def sample_presence(
    rng: jax.Array,
    batch_size: int,
    n_modalities: int,
    p_drop: float = 0.0,
) -> jnp.ndarray | None:
    """Per-example modality-dropout presence mask ([B:5], SURVEY.md 2.10).

    Each modality is independently dropped with probability ``p_drop``;
    examples that would lose everything keep all modalities (a fully
    absent example carries no signal). Returns None when ``p_drop == 0``
    (fully-paired training, the reference default).
    """
    if p_drop <= 0.0:
        return None
    keep = jax.random.bernoulli(
        rng, 1.0 - p_drop, shape=(batch_size, n_modalities)
    )
    all_dropped = ~jnp.any(keep, axis=-1, keepdims=True)
    return jnp.where(all_dropped, True, keep).astype(jnp.float32)
