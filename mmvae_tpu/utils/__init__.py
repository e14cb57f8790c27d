"""Utilities: profiling/timing harness, PNG image grids."""

from mmvae_tpu.utils.profiling import trace, measure_samples_per_sec
from mmvae_tpu.utils.images import save_image_grid

__all__ = ["trace", "measure_samples_per_sec", "save_image_grid"]
