"""Deep residual-trunk MNIST MVAE — the pipeline-parallelism demonstrator.

The reference family's experts are 2-3 layers deep — nothing to
pipeline. This model is the rebuild's depth-scaling vehicle: the image
expert's hidden stack becomes a uniform-width residual trunk of
``trunk_stages`` blocks whose parameters live in ONE stacked tensor
(leading stage axis). That single design choice serves both execution
modes:

* ``pp_mesh=None`` (default): the trunk runs as a ``lax.scan`` over the
  stage axis — one compiled block body, the standard XLA-friendly form
  of a deep residual stack (no Python unrolling, O(1) program size).
* ``pp_mesh=<(data, pipe) mesh>``: the SAME stacked params shard their
  stage axis over the pipe axis and the trunk runs the GPipe microbatch
  schedule (``parallel.pp.pipeline_apply``) — scan over ticks,
  nearest-neighbour ``ppermute`` between stages.

Both modes consume identical parameter trees, so a state created (or
checkpointed) in one mode runs in the other; tests/test_pp.py pins the
cross-mode parity. Everything outside the trunk (heads, label expert,
PoE fusion, ELBO) is inherited from :class:`MnistMVAE` unchanged.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmvae_tpu.models.cub import CubMVAE
from mmvae_tpu.models.experts import (
    ConvEncoder,
    DeconvDecoder,
    LabelDecoder,
    LabelEncoder,
    swish,
)
from mmvae_tpu.models.mnist import MnistMVAE
from mmvae_tpu.models.text import SeqDecoder, SeqEncoder

__all__ = ["PipelineTrunk", "DeepMnistMVAE", "DeepCubMVAE"]


class PipelineTrunk(nn.Module):
    """Uniform-width residual MLP trunk with stage-stacked params.

    Per stage: ``h + alpha_s * MLP_depth(h)`` (swish between layers),
    all widths equal. Params: ``kernels (S, depth, W, W)``,
    ``biases (S, depth, W)``, ``alphas (S,)`` — the leading S axis is
    the unit of pipeline sharding.

    ``rezero`` (default on): the per-stage residual gates ``alpha_s``
    initialize to ZERO, so the trunk starts as an exact identity and
    the deep config's forward pass starts exactly at its shallow base
    config's (ReZero, Bachlechner et al. 2021) — the round-5 attack on
    the round-4 deep_cub quality cliff (48.6% exact captions at the
    cub schedule vs cub's 96.7%: the ungated trunk injects 4 stages of
    lecun-normal residual noise between the conv stack and the heads
    at init, and the cub schedule never recovers; measurement in
    BASELINE.md's deep_cub section). The gates are stage-stacked like
    every trunk param, so both execution modes and the pipe-axis
    sharding are unchanged. ``rezero=False`` keeps the round-4 ungated
    tree (A/B + old-checkpoint escape hatch).
    """

    n_stages: int
    width: int
    block_depth: int = 1
    dtype: jnp.dtype = jnp.float32
    pp_mesh: Any = None  # jax.sharding.Mesh (hashable) or None
    pp_n_micro: int = 4
    rezero: bool = True

    @nn.compact
    def __call__(self, x):
        s, d, w = self.n_stages, self.block_depth, self.width
        kernels = self.param(
            "kernels", nn.initializers.lecun_normal(), (s, d, w, w)
        )
        biases = self.param("biases", nn.initializers.zeros, (s, d, w))
        k = kernels.astype(self.dtype)
        b = biases.astype(self.dtype)
        if self.rezero:
            alphas = self.param(
                "alphas", nn.initializers.zeros, (s,)
            ).astype(self.dtype)

        def stage_fn(p, h):
            if self.rezero:
                pk, pb, pa = p  # (depth, W, W), (depth, W), ()
            else:
                pk, pb = p
            y = h
            for i in range(d):  # static depth, unrolled inside the block
                y = swish(y @ pk[i] + pb[i])
            # Total on zero-filled bubble activations (pp contract).
            return h + (pa * y if self.rezero else y)

        params = (k, b, alphas) if self.rezero else (k, b)
        h = x.astype(self.dtype)
        if self.pp_mesh is None:
            h, _ = jax.lax.scan(
                lambda carry, p: (stage_fn(p, carry), None), h, params
            )
            return h

        from mmvae_tpu.parallel.pp import pipeline_apply

        return pipeline_apply(
            stage_fn, params, h,
            mesh=self.pp_mesh, n_micro=self.pp_n_micro,
        )


class _TrunkEncoder(nn.Module):
    n_latents: int
    width: int
    n_stages: int
    block_depth: int
    dtype: jnp.dtype
    pp_mesh: Any
    pp_n_micro: int
    rezero: bool = True

    @nn.compact
    def __call__(self, x):
        h = x.reshape((x.shape[0], -1)).astype(self.dtype)
        h = swish(nn.Dense(self.width, dtype=self.dtype)(h))
        h = PipelineTrunk(
            self.n_stages, self.width, self.block_depth,
            dtype=self.dtype, pp_mesh=self.pp_mesh,
            pp_n_micro=self.pp_n_micro, rezero=self.rezero,
        )(h)
        out = nn.Dense(2 * self.n_latents, dtype=self.dtype)(h)
        out = out.astype(jnp.float32)
        return out[:, : self.n_latents], out[:, self.n_latents :]


class _TrunkDecoder(nn.Module):
    out_shape: tuple[int, ...]
    width: int
    n_stages: int
    block_depth: int
    dtype: jnp.dtype
    pp_mesh: Any
    pp_n_micro: int
    rezero: bool = True

    @nn.compact
    def __call__(self, z):
        h = swish(nn.Dense(self.width, dtype=self.dtype)(
            z.astype(self.dtype)
        ))
        h = PipelineTrunk(
            self.n_stages, self.width, self.block_depth,
            dtype=self.dtype, pp_mesh=self.pp_mesh,
            pp_n_micro=self.pp_n_micro, rezero=self.rezero,
        )(h)
        out_dim = 1
        for dim in self.out_shape:
            out_dim *= dim
        logits = nn.Dense(out_dim, dtype=self.dtype)(h)
        return logits.astype(jnp.float32).reshape(
            (z.shape[0],) + tuple(self.out_shape)
        )


class DeepMnistMVAE(MnistMVAE):
    """MNIST MVAE with deep pipelined image experts (same API/ELBO)."""

    trunk_stages: int = 4
    trunk_depth: int = 1
    trunk_width: int = 256
    trunk_rezero: bool = True
    pp_mesh: Any = None
    pp_n_micro: int = 4

    def setup(self):
        trunk_kw = dict(
            width=self.trunk_width,
            n_stages=self.trunk_stages,
            block_depth=self.trunk_depth,
            dtype=self.dtype,
            pp_mesh=self.pp_mesh,
            pp_n_micro=self.pp_n_micro,
            rezero=self.trunk_rezero,
        )
        self.image_enc = _TrunkEncoder(self.n_latents, **trunk_kw)
        self.image_dec = _TrunkDecoder(tuple(self.image_hw), **trunk_kw)
        kw = dict(dtype=self.dtype)
        self.label_enc = LabelEncoder(self.n_latents, self.n_classes, **kw)
        self.label_dec = LabelDecoder(self.n_classes, **kw)


class DeepCubMVAE(CubMVAE):
    """CUB images+captions MVAE with stage-stacked bottleneck trunks --
    the reference-family pipeline-parallelism config (round-4 VERDICT
    missing #2: ``--pp`` previously trained only the purpose-built
    DeepMnistMVAE demonstrator; this puts it on a BASELINE.json-named
    family, CUB [B:11]).

    The conv/deconv stages themselves cannot stage-stack (their shapes
    differ per resolution level -- ``pipeline_apply`` needs a uniform
    trunk), so the depth lives where it is uniform: a residual MLP
    trunk at each image expert's BOTTLENECK (``ConvEncoder`` /
    ``DeconvDecoder`` ``trunk_stages`` hook, width = fc_hidden=512).
    With ``pp == trunk_stages`` the trunks run the GPipe microbatch
    schedule; the conv stages, text GRU (sequential over tokens, not
    depth -- nothing to pipeline), PoE fusion and ELBO stay on the DP
    dataflow. Same parameter tree in both modes, so states and
    checkpoints move freely between them (tests/test_pp.py pins the
    cross-mode parity for this family too).
    """

    trunk_stages: int = 4
    trunk_depth: int = 1
    trunk_rezero: bool = True
    pp_mesh: Any = None
    pp_n_micro: int = 4

    def setup(self):
        kw = dict(dtype=self.dtype)
        trunk_kw = dict(
            trunk_stages=self.trunk_stages,
            trunk_depth=self.trunk_depth,
            trunk_rezero=self.trunk_rezero,
            pp_mesh=self.pp_mesh,
            pp_n_micro=self.pp_n_micro,
        )
        self.image_enc = ConvEncoder(
            self.n_latents, features=self.conv_features,
            **trunk_kw, **kw,
        )
        self.image_dec = DeconvDecoder(
            self.image_hw,
            channels=3,
            features=tuple(reversed(self.conv_features)),
            upsample_mode=self.upsample_mode,
            **trunk_kw, **kw,
        )
        self.text_enc = SeqEncoder(
            self.n_latents, self.vocab_size, embed_dim=128, hidden=256,
            **kw,
        )
        self.text_dec = SeqDecoder(
            self.vocab_size, self.max_len, embed_dim=128, hidden=256,
            **kw,
        )
