"""MNIST image+label MVAE (reference config 1, SURVEY.md 2.3 / [B:7]).

MLP image expert over flat 784 pixels, label expert over 10 classes,
PoE fusion, full multi-term ELBO. Reference-family recon weights:
lambda_image = 1, lambda_label = 10 (small modality scaled up,
SURVEY.md 2.8).
"""

from __future__ import annotations

import jax.numpy as jnp

from mmvae_tpu.ops import bernoulli_nll, categorical_nll
from mmvae_tpu.models.base import ModalitySpec, MVAEBase
from mmvae_tpu.models.experts import (
    LabelDecoder,
    LabelEncoder,
    MLPDecoder,
    MLPEncoder,
)


class MnistMVAE(MVAEBase):
    n_latents: int = 64
    n_classes: int = 10
    image_hw: tuple[int, int] = (28, 28)
    lambda_image: float = 1.0
    lambda_label: float = 10.0
    dtype: jnp.dtype = jnp.float32

    def specs(self):
        return (
            ModalitySpec("image", "bernoulli", self.lambda_image),
            ModalitySpec("label", "categorical", self.lambda_label),
        )

    def setup(self):
        kw = dict(dtype=self.dtype)
        self.image_enc = MLPEncoder(self.n_latents, **kw)
        self.image_dec = MLPDecoder(self.image_hw, **kw)
        self.label_enc = LabelEncoder(self.n_latents, self.n_classes, **kw)
        self.label_dec = LabelDecoder(self.n_classes, **kw)

    def encode(self, batch):
        mu_i, lv_i = self.image_enc(batch["image"])
        mu_l, lv_l = self.label_enc(batch["label"])
        mu = jnp.stack([mu_i, mu_l], axis=1)  # (B, 2, L)
        logvar = jnp.stack([lv_i, lv_l], axis=1)
        return mu, logvar

    def decode(self, z, batch=None):
        return {"image": self.image_dec(z), "label": self.label_dec(z)}

    def nll_all(self, recons, batch):
        img = bernoulli_nll(recons["image"], batch["image"], event_ndims=2)
        lab = categorical_nll(recons["label"], batch["label"])
        return jnp.stack([img, lab], axis=0)  # (M=2, N)

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
