"""Model library: per-modality experts and the five experiment MVAEs.

Experiment models (the reference's five configs, SURVEY.md section 2.3-2.7
and [B:6-12]):
    - :class:`mmvae_tpu.models.mnist.MnistMVAE`           image + label
    - :class:`mmvae_tpu.models.fashionmnist.FashionMnistMVAE` conv image + label
    - :class:`mmvae_tpu.models.multimnist.MultiMnistMVAE` conv image + digit string
    - :class:`mmvae_tpu.models.celeba.CelebAMVAE`         conv image + 18 attrs
    - :class:`mmvae_tpu.models.cub.CubMVAE`               conv image + caption
"""

from mmvae_tpu.models.base import MVAEBase, ModalitySpec
from mmvae_tpu.models.mnist import MnistMVAE
from mmvae_tpu.models.fashionmnist import FashionMnistMVAE
from mmvae_tpu.models.multimnist import MultiMnistMVAE
from mmvae_tpu.models.celeba import CelebAMVAE
from mmvae_tpu.models.cub import CubMVAE
from mmvae_tpu.models.pipeline import DeepCubMVAE, DeepMnistMVAE, PipelineTrunk

__all__ = [
    "DeepCubMVAE",
    "DeepMnistMVAE",
    "PipelineTrunk",
    "MVAEBase",
    "ModalitySpec",
    "MnistMVAE",
    "FashionMnistMVAE",
    "MultiMnistMVAE",
    "CelebAMVAE",
    "CubMVAE",
]
