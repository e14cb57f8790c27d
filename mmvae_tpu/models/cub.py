"""CUB images + captions MVAE (reference config 5, SURVEY.md 2.7 / [B:11]).

Conv image expert over 64x64 RGB + word-level caption encoder/decoder
(embedding + GRU, ``lax.scan`` autoregressive decode) -- the largest
config. Vocabulary handling lives in ``mmvae_tpu.data.vocab``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from mmvae_tpu.ops import bernoulli_nll, masked_seq_ce
from mmvae_tpu.models.base import ModalitySpec, MVAEBase
from mmvae_tpu.models.experts import ConvEncoder, DeconvDecoder
from mmvae_tpu.models.text import SeqDecoder, SeqEncoder


class CubMVAE(MVAEBase):
    n_latents: int = 128
    vocab_size: int = 512
    max_len: int = 32
    image_hw: tuple[int, int] = (64, 64)
    lambda_image: float = 1.0
    lambda_text: float = 5.0
    conv_features: tuple[int, ...] = (32, 64, 128, 256)
    # "shuffle" swaps the decoder's 4x4/2 transposed convs for 2x2/1
    # convs + depth-to-space (experts.py DeconvDecoder.upsample_mode)
    upsample_mode: str = "deconv"
    dtype: jnp.dtype = jnp.float32
    # TP activation hooks for the conv chains (see CelebAMVAE.tp_mesh).
    tp_mesh: Any = None

    def specs(self):
        return (
            ModalitySpec("image", "bernoulli", self.lambda_image),
            ModalitySpec("text", "seq", self.lambda_text),
        )

    def setup(self):
        kw = dict(dtype=self.dtype)
        self.image_enc = ConvEncoder(
            self.n_latents, features=self.conv_features,
            tp_mesh=self.tp_mesh, **kw
        )
        self.image_dec = DeconvDecoder(
            self.image_hw,
            channels=3,
            features=tuple(reversed(self.conv_features)),
            upsample_mode=self.upsample_mode,
            tp_mesh=self.tp_mesh,
            **kw,
        )
        self.text_enc = SeqEncoder(
            self.n_latents, self.vocab_size, embed_dim=128, hidden=256, **kw
        )
        self.text_dec = SeqDecoder(
            self.vocab_size, self.max_len, embed_dim=128, hidden=256, **kw
        )

    def encode(self, batch):
        mu_i, lv_i = self.image_enc(batch["image"])
        mu_t, lv_t = self.text_enc(batch["text"])
        return (
            jnp.stack([mu_i, mu_t], axis=1),
            jnp.stack([lv_i, lv_t], axis=1),
        )

    def decode(self, z, batch=None):
        out = {"image": self.image_dec(z)}
        if batch is not None:
            out["text"] = self.text_dec(z, batch["text"])
        return out

    def generate_text(self, z, rng, temperature: float = 1.0):
        return self.text_dec.generate(z, rng, temperature=temperature)

    def nll_all(self, recons, batch):
        img = bernoulli_nll(recons["image"], batch["image"], event_ndims=3)
        txt = masked_seq_ce(recons["text"], batch["text"])
        return jnp.stack([img, txt], axis=0)

    def decode_key_modalities(self):
        return {"image": [0], "text": [1]}

    def decode_one(self, key, z, batch=None):
        if key == "image":
            return self.image_dec(z)
        assert key == "text"
        return self.text_dec(z, batch["text"])  # teacher-forced

    def nll_one(self, key, recon, batch):
        if key == "image":
            return bernoulli_nll(
                recon, batch["image"], event_ndims=3
            )[None]
        assert key == "text"
        return masked_seq_ce(recon, batch["text"])[None]

    def dummy_batch(self, n):
        return {
            "image": jnp.zeros(
                (n,) + tuple(self.image_hw) + (3,), jnp.float32
            ),
            "text": jnp.zeros((n, self.max_len), jnp.int32),
        }
