"""CelebA image + 18 binary attributes MVAE (reference config 4,
SURVEY.md 2.6 / [B:10]).

Deep conv encoder/decoder over 64x64 RGB; each of the 18 attributes is its
own Gaussian expert, so PoE fuses up to 19 experts + prior. The 18
attribute experts are a single vmapped parameter bank
(``AttributeEncoderBank`` / ``AttributeDecoderBank``) -- one batched einsum
on the MXU instead of 18 tiny modules.

Modality order: ``image, attr_0 .. attr_17`` (n_modalities = 19); the
multi-term ELBO draws k random subsets over all 19 on top of joint +
unimodal terms (SURVEY.md 2.8).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from mmvae_tpu.ops import bernoulli_nll
from mmvae_tpu.models.base import ModalitySpec, MVAEBase
from mmvae_tpu.models.experts import (
    AttributeDecoderBank,
    AttributeEncoderBank,
    ConvEncoder,
    DeconvDecoder,
)

N_ATTRS = 18


class CelebAMVAE(MVAEBase):
    n_latents: int = 100
    n_attrs: int = N_ATTRS
    image_hw: tuple[int, int] = (64, 64)
    lambda_image: float = 1.0
    lambda_attr: float = 10.0
    conv_features: tuple[int, ...] = (32, 64, 128, 256)
    # 2 folds 2x2 patches into channels at the image input/output stage
    # (experts.py ConvEncoder/DeconvDecoder.space_to_depth); perf knob,
    # default is the reference-shaped stack
    space_to_depth: int = 1
    # "shuffle" swaps the decoder's 4x4/2 transposed convs for 2x2/1
    # convs + depth-to-space (experts.py DeconvDecoder.upsample_mode);
    # perf knob, default is the reference-shaped deconv stack
    upsample_mode: str = "deconv"
    dtype: jnp.dtype = jnp.float32
    # TP activation hooks for the conv chains (experts.py ConvEncoder/
    # DeconvDecoder.tp_mesh); set by build_model(tp_mesh=...) on the
    # training variant only -- adds no params, so states/checkpoints
    # move freely between the TP and sequential variants.
    tp_mesh: Any = None

    def specs(self):
        return (ModalitySpec("image", "bernoulli", self.lambda_image),) + tuple(
            ModalitySpec(f"attr_{i}", "bernoulli", self.lambda_attr)
            for i in range(self.n_attrs)
        )

    def setup(self):
        kw = dict(dtype=self.dtype)
        self.image_enc = ConvEncoder(
            self.n_latents, features=self.conv_features,
            space_to_depth=self.space_to_depth, tp_mesh=self.tp_mesh,
            **kw
        )
        self.image_dec = DeconvDecoder(
            self.image_hw,
            channels=3,
            features=tuple(reversed(self.conv_features)),
            space_to_depth=self.space_to_depth,
            upsample_mode=self.upsample_mode,
            tp_mesh=self.tp_mesh,
            **kw,
        )
        self.attr_enc = AttributeEncoderBank(
            self.n_latents, n_attrs=self.n_attrs, **kw
        )
        self.attr_dec = AttributeDecoderBank(n_attrs=self.n_attrs, **kw)

    def encode(self, batch):
        mu_i, lv_i = self.image_enc(batch["image"])  # (B, L)
        mu_a, lv_a = self.attr_enc(batch["attrs"])  # (B, 18, L)
        mu = jnp.concatenate([mu_i[:, None], mu_a], axis=1)  # (B, 19, L)
        logvar = jnp.concatenate([lv_i[:, None], lv_a], axis=1)
        return mu, logvar

    def decode(self, z, batch=None):
        return {"image": self.image_dec(z), "attrs": self.attr_dec(z)}

    def nll_all(self, recons, batch):
        img = bernoulli_nll(recons["image"], batch["image"], event_ndims=3)
        # (B, 18) per-attribute Bernoulli NLLs -> 18 modality rows.
        attrs = bernoulli_nll(
            recons["attrs"], batch["attrs"], event_ndims=0
        )
        return jnp.concatenate(
            [img[None], attrs.swapaxes(0, 1)], axis=0
        )  # (19, N)

    def decode_key_modalities(self):
        return {
            "image": [0],
            "attrs": list(range(1, 1 + self.n_attrs)),
        }

    def decode_one(self, key, z, batch=None):
        if key == "image":
            return self.image_dec(z)
        assert key == "attrs"
        return self.attr_dec(z)

    def nll_one(self, key, recon, batch):
        if key == "image":
            return bernoulli_nll(
                recon, batch["image"], event_ndims=3
            )[None]
        assert key == "attrs"
        return bernoulli_nll(
            recon, batch["attrs"], event_ndims=0
        ).swapaxes(0, 1)

    def dummy_batch(self, n):
        return {
            "image": jnp.zeros(
                (n,) + tuple(self.image_hw) + (3,), jnp.float32
            ),
            "attrs": jnp.zeros((n, self.n_attrs), jnp.float32),
        }

    def decode_kinds(self):
        return {"image": "bernoulli", "attrs": "bernoulli"}

    def batch_modalities(self):
        return {
            "image": ["image"],
            "attrs": [f"attr_{i}" for i in range(self.n_attrs)],
        }
