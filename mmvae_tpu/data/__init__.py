"""Data layer: paired multimodal pipelines with modality-dropout masking.

The environment has no network and no cached datasets (SURVEY.md section 7
"dataset availability"), so each experiment has a deterministic, seeded
synthetic generator shaped exactly like the real dataset
(``mmvae_tpu.data.synthetic``). ``load_dataset`` checks for real data on
disk first (``MMVAE_DATA_DIR``) and falls back to synthetic.
"""

from mmvae_tpu.data.pipelines import (
    Dataset,
    load_dataset,
    epoch_batches,
    stacked_epoch,
    dataset_astype,
    stacked_epoch_padded,
    sample_presence,
)
from mmvae_tpu.data.vocab import Vocab

__all__ = [
    "Dataset",
    "load_dataset",
    "epoch_batches",
    "stacked_epoch",
    "dataset_astype",
    "stacked_epoch_padded",
    "sample_presence",
    "Vocab",
]
