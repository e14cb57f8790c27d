"""MultiMNIST MVAE (reference config 3, SURVEY.md 2.5 / [B:9]).

Conv encoder over the 50x50 composite-digit canvas + autoregressive
sequence decoder over the variable-length digit string (up to 4 digits),
realized as a fixed-length ``lax.scan`` GRU with stop masking
(SURVEY.md 3e). Digit tokens: PAD=0, START=1, STOP=2, digits d -> 3+d.
"""

from __future__ import annotations

import jax.numpy as jnp

from mmvae_tpu.ops import bernoulli_nll, masked_seq_ce
from mmvae_tpu.models.base import ModalitySpec, MVAEBase
from typing import Any

from mmvae_tpu.models.experts import ConvEncoder, DeconvDecoder
from mmvae_tpu.models.text import SeqDecoder, SeqEncoder

DIGIT_VOCAB = 13  # PAD, START, STOP + 10 digits
MAX_DIGITS = 4
SEQ_LEN = MAX_DIGITS + 1  # digits + STOP


class MultiMnistMVAE(MVAEBase):
    n_latents: int = 64
    image_hw: tuple[int, int] = (50, 50)
    max_len: int = SEQ_LEN
    lambda_image: float = 1.0
    lambda_text: float = 10.0
    conv_features: tuple[int, ...] = (32, 64)
    text_embed: int = 64
    text_hidden: int = 128
    # Content/style latent factorization (round-3 experiment on the
    # text->image gap): when >0, the text expert constrains only the
    # first ``text_latent_dims`` dims -- its emitted logvar on the rest
    # is pinned at +11, which the PoE precision clamp turns into ~zero
    # precision (core/poe.py), so those "style" dims stay at the prior
    # under text-only conditioning. The digit string can never pin the
    # digit POSITIONS; forcing the text expert to claim only a content
    # slice lets position land in the style slice (trained by the
    # image/joint terms), and text->image generation samples style from
    # the prior for a concrete arrangement instead of the
    # position-averaged haze. 0 = full-latent text expert (default).
    text_latent_dims: int = 0
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
            channels=1,
            features=tuple(reversed(self.conv_features)),
            tp_mesh=self.tp_mesh,
            **kw,
        )
        self.text_enc = SeqEncoder(
            self.n_latents,
            DIGIT_VOCAB,
            embed_dim=self.text_embed,
            hidden=self.text_hidden,
            **kw,
        )
        self.text_dec = SeqDecoder(
            DIGIT_VOCAB,
            self.max_len,
            embed_dim=self.text_embed,
            hidden=self.text_hidden,
            **kw,
        )

    def encode(self, batch):
        mu_i, lv_i = self.image_enc(batch["image"])
        mu_t, lv_t = self.text_enc(batch["text"])
        if self.text_latent_dims > 0:
            content = (
                jnp.arange(self.n_latents) < self.text_latent_dims
            )
            mu_t = jnp.where(content, mu_t, 0.0)
            # +11 -> precision ~1.7e-5 after the PoE clamp: the text
            # expert contributes nothing on the style dims.
            lv_t = jnp.where(content, lv_t, 11.0)
        return (
            jnp.stack([mu_i, mu_t], axis=1),
            jnp.stack([lv_i, lv_t], axis=1),
        )

    def decode(self, z, batch=None):
        out = {"image": self.image_dec(z)}
        if batch is not None:
            out["text"] = self.text_dec(z, batch["text"])  # teacher-forced
        return out

    def generate_text(self, z, rng, temperature: float = 1.0):
        """Sampled digit-string decode (generation path, SURVEY.md 3e)."""
        return self.text_dec.generate(z, rng, temperature=temperature)

    def nll_all(self, recons, batch):
        img = bernoulli_nll(recons["image"], batch["image"], event_ndims=2)
        # Per-token CE summed over non-PAD positions (STOP is predicted);
        # one fused online-logsumexp kernel on TPU.
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
                recon, batch["image"], event_ndims=2
            )[None]
        assert key == "text"
        return masked_seq_ce(recon, batch["text"])[None]

    def dummy_batch(self, n):
        return {
            "image": jnp.zeros((n,) + tuple(self.image_hw), jnp.float32),
            "text": jnp.zeros((n, self.max_len), jnp.int32),
        }
