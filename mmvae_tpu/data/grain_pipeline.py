"""Grain input pipeline (the [B:5] north-star data path).

``BASELINE.json:5`` names Grain for the paired input pipelines with
on-device batching and modality-dropout masking. The default hot path
(`pipelines.stacked_epoch`) keeps HBM-resident data because every
reference-scale dataset fits on chip (docs/DESIGN.md section 3); this
module is the host-streaming alternative for beyond-HBM datasets and for
users who want Grain's determinism/checkpointing semantics, built on
``grain.MapDataset``:

    shuffle -> per-epoch reseed -> modality-dropout mask -> batch

Each yielded batch is a dict of numpy arrays (plus ``presence`` when
modality dropout is on) shaped exactly like the device-resident path, so
``make_train_step`` consumes either interchangeably.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np

from mmvae_tpu.data.pipelines import Dataset

__all__ = ["make_grain_loader", "GrainEpochIterator"]


class _DictSource:
    """Random-access view over a modality dict (grain source protocol)."""

    def __init__(self, arrays: dict[str, np.ndarray]):
        self._arrays = {k: np.asarray(v) for k, v in arrays.items()}
        self._len = len(next(iter(self._arrays.values())))

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        return {k: v[idx] for k, v in self._arrays.items()}


def _with_presence(
    example: dict[str, np.ndarray],
    rng: np.random.Generator,
    modality_names: list[str],
    p_drop: float,
) -> dict[str, np.ndarray]:
    keep = rng.random(len(modality_names)) >= p_drop
    if not keep.any():
        keep[rng.integers(len(keep))] = True  # never drop everything
    return dict(example, presence=keep.astype(np.float32))


def make_grain_loader(
    dataset: Dataset | dict[str, Any],
    batch_size: int,
    *,
    modality_names: list[str] | None = None,
    p_modality_drop: float = 0.0,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: int | None = 1,
):
    """Build a ``grain.MapDataset`` pipeline over a modality dict.

    Returns a grain ``IterDataset`` yielding batch dicts
    ``{modality: (B, ...), ["presence": (B, M)]}``. Stable per-index
    randomness (grain's deterministic map seeding) makes the stream
    reproducible and resumable via grain's iterator checkpointing.
    """
    import grain

    arrays = dataset.arrays if isinstance(dataset, Dataset) else dataset
    arrays = {k: np.asarray(v) for k, v in arrays.items()}
    source = _DictSource(arrays)
    ds = grain.MapDataset.source(source)
    if shuffle:
        ds = ds.seed(seed).shuffle()
    if num_epochs is not None and num_epochs != 1:
        ds = ds.repeat(num_epochs)
    if p_modality_drop > 0.0:
        names = modality_names or sorted(arrays)
        ds = ds.random_map(
            lambda ex, rng: _with_presence(
                ex, rng, names, p_modality_drop
            ),
            seed=seed + 1,
        )
    return ds.batch(batch_size, drop_remainder=True)


class GrainEpochIterator:
    """Adapter: grain stream -> the ``epoch_batches`` interface.

    Wraps ``make_grain_loader`` so ``api``-style loops can swap pipelines
    without touching the step. Iterating yields numpy batch dicts.
    """

    def __init__(self, *args, **kwargs):
        self._ds = make_grain_loader(*args, **kwargs)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        return iter(self._ds)
