"""Modality-subset mask machinery for the multi-term ELBO.

The reference runs one Python forward pass per modality subset per step
(joint + each unimodal + k randomly sub-sampled combinations, SURVEY.md
sections 2.8 and 3a). The TPU-native design replaces those 2^M-ish forwards
with a single jitted step that vmaps a masked-PoE fusion over a static
``(n_terms, n_modalities)`` float mask matrix -- encoders run once per
modality, fusion/decoding are batched over the term axis, and shapes never
depend on which subsets were drawn.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["elbo_subset_masks", "random_subset_masks"]


def elbo_subset_masks(n_modalities: int, dtype=jnp.float32) -> jnp.ndarray:
    """Static mask matrix for the deterministic ELBO terms.

    Row 0 is the joint term (all modalities), rows 1..M the unimodal terms:
    shape ``(1 + n_modalities, n_modalities)``. This matches the reference's
    fixed term set for the 2-modality configs (SURVEY.md section 3a).
    """
    joint = jnp.ones((1, n_modalities), dtype=dtype)
    unimodal = jnp.eye(n_modalities, dtype=dtype)
    return jnp.concatenate([joint, unimodal], axis=0)


def random_subset_masks(
    rng: jax.Array, n_subsets: int, n_modalities: int, dtype=jnp.float32
) -> jnp.ndarray:
    """``k`` random modality-combination masks, shape ``(k, n_modalities)``.

    Each entry is Bernoulli(0.5), i.e. subsets are drawn uniformly from the
    powerset as in the reference's sub-sampled combination terms (SURVEY.md
    section 2.8, [B:5]). The empty subset is allowed: with the prior expert
    folded in, its posterior is exactly the prior, its KL is 0, and all its
    recon terms are masked out -- the term contributes (near-)nothing, which
    keeps shapes static without a resampling loop.
    """
    bits = jax.random.bernoulli(rng, 0.5, shape=(n_subsets, n_modalities))
    return bits.astype(dtype)
