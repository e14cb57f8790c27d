"""FashionMNIST bimodal VAE (reference config 2, SURVEY.md 2.4 / [B:8]).

Conv image encoder / deconv decoder + label expert.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from mmvae_tpu.ops import bernoulli_nll, categorical_nll
from mmvae_tpu.models.base import ModalitySpec, MVAEBase
from mmvae_tpu.models.experts import (
    ConvEncoder,
    DeconvDecoder,
    LabelDecoder,
    LabelEncoder,
)


class FashionMnistMVAE(MVAEBase):
    n_latents: int = 64
    n_classes: int = 10
    image_hw: tuple[int, int] = (28, 28)
    lambda_image: float = 1.0
    lambda_label: float = 10.0
    dtype: jnp.dtype = jnp.float32
    # TP activation hooks for the conv chains (see CelebAMVAE.tp_mesh).
    tp_mesh: Any = None

    def specs(self):
        return (
            ModalitySpec("image", "bernoulli", self.lambda_image),
            ModalitySpec("label", "categorical", self.lambda_label),
        )

    def setup(self):
        kw = dict(dtype=self.dtype)
        self.image_enc = ConvEncoder(
            self.n_latents, features=(32, 64), tp_mesh=self.tp_mesh,
            **kw
        )
        self.image_dec = DeconvDecoder(
            self.image_hw, channels=1, features=(64, 32),
            tp_mesh=self.tp_mesh, **kw
        )
        self.label_enc = LabelEncoder(self.n_latents, self.n_classes, **kw)
        self.label_dec = LabelDecoder(self.n_classes, **kw)

    def encode(self, batch):
        mu_i, lv_i = self.image_enc(batch["image"])
        mu_l, lv_l = self.label_enc(batch["label"])
        return (
            jnp.stack([mu_i, mu_l], axis=1),
            jnp.stack([lv_i, lv_l], axis=1),
        )

    def decode(self, z, batch=None):
        return {"image": self.image_dec(z), "label": self.label_dec(z)}

    def nll_all(self, recons, batch):
        img = bernoulli_nll(recons["image"], batch["image"], event_ndims=2)
        lab = categorical_nll(recons["label"], batch["label"])
        return jnp.stack([img, lab], axis=0)

    def decode_key_modalities(self):
        return {"image": [0], "label": [1]}

    def decode_one(self, key, z, batch=None):
        if key == "image":
            return self.image_dec(z)
        assert key == "label"
        return self.label_dec(z)

    def nll_one(self, key, recon, batch):
        if key == "image":
            return bernoulli_nll(recon, batch["image"], event_ndims=2)[None]
        assert key == "label"
        return categorical_nll(recon, batch["label"])[None]

    def dummy_batch(self, n):
        return {
            "image": jnp.zeros((n,) + tuple(self.image_hw), jnp.float32),
            "label": jnp.zeros((n,), jnp.int32),
        }
