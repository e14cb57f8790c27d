"""Mixture-family posterior fusion: the MMVAE and MoPoE objectives.

The reference framework trains the Wu & Goodman MVAE: a
product-of-experts joint posterior and a sum of subset ELBO terms
(SURVEY.md section 2.8). Its two canonical successors swap the fusion
rule while keeping everything else -- per-modality experts, decoders,
multi-term training:

  * **MMVAE** (mixture-of-experts, Shi et al. 2019): the joint
    posterior is the uniform MIXTURE of the unimodal posteriors,
    ``q(z|X) = 1/M sum_m q_m(z|x_m)``; training decodes every modality
    from every unimodal posterior.
  * **MoPoE** (mixture-of-products, Sutter et al. 2021): the posterior
    is the uniform mixture of PoE-fused SUBSETS,
    ``q(z|X) = 1/(2^M - 1) sum_{S != empty} PoE(S)`` -- MVAE's sharp
    subset posteriors inside MMVAE's mixture.

Because the whole framework already runs fusion behind a static
``(n_terms, n_modalities)`` float mask matrix (``core/subsets.py``),
both objectives are expressible as *mask schedules plus a term
weighting* on the training side, and as a *component mixture* on the
inference side. This module owns the inference side: enumerate the
mixture's component masks, PoE-fuse each against the observed-modality
presence mask, and draw (or average) z.

A useful identity keeps the observed-subset handling trivial: fusing
each component mask ``c`` with the presence mask ``O`` elementwise
(``c AND O``) maps the full powerset onto the powerset of O with a
CONSTANT multiplicity (every nonempty ``s subseteq O`` has exactly
``2^{M-|O|}`` preimages), so a uniform mixture over the nonempty
effective rows IS the uniform mixture over subsets of the observed set
-- no dynamic component list, fixed shapes, any per-example presence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mmvae_tpu.core.poe import product_of_experts
from mmvae_tpu.core.sampling import reparameterize

__all__ = [
    "OBJECTIVES",
    "component_masks",
    "posterior_components",
    "mixture_z",
    "fuse_observed_z",
]

OBJECTIVES = ("mvae", "mmvae", "mopoe", "mvtcae")

# Past this many modalities the 2^M - 1 powerset stops being a sensible
# compiled program (CelebA: 19 modalities -> 524287 components); the
# MoPoE mixture then falls back to the {joint} + {unimodal} component
# family -- the same subset sub-sampling compromise its training
# objective makes (train/step.py), kept consistent here.
_MOPOE_POWERSET_MAX = 8


def component_masks(objective: str, n_modalities: int) -> jnp.ndarray:
    """The inference mixture's component masks, shape ``(K, M)``.

    * ``"mmvae"``: one component per modality (identity rows).
    * ``"mopoe"``: every nonempty subset (``2^M - 1`` rows) for
      ``M <= 8``; ``{joint} + {unimodal}`` rows beyond that (see
      ``_MOPOE_POWERSET_MAX``).

    ``"mvae"`` and ``"mvtcae"`` have no mixture -- callers use plain
    PoE fusion; asking for their component masks is a programming
    error.
    """
    if objective == "mmvae":
        return jnp.eye(n_modalities, dtype=jnp.float32)
    if objective == "mopoe":
        if n_modalities <= _MOPOE_POWERSET_MAX:
            bits = np.arange(1, 2**n_modalities, dtype=np.uint32)
            rows = (
                (bits[:, None] >> np.arange(n_modalities)) & 1
            ).astype(np.float32)
            return jnp.asarray(rows)
        joint = jnp.ones((1, n_modalities), jnp.float32)
        return jnp.concatenate(
            [joint, jnp.eye(n_modalities, dtype=jnp.float32)], axis=0
        )
    raise ValueError(
        f"objective {objective!r} has no mixture components"
    )


def posterior_components(mu_e, lv_e, presence, comp_masks):
    """PoE-fuse every mixture component against the observed set.

    Args:
      mu_e, lv_e: ``(B, M, L)`` per-modality expert stats.
      presence: ``(B, M)`` float observed mask, or None (all observed).
      comp_masks: ``(K, M)`` static component masks.

    Returns:
      ``(mu_c, lv_c, weights)`` -- ``(B, K, L)`` component posteriors
      and a ``(B, K)`` float validity weight (1 for components with at
      least one observed expert, 0 for empty ones, which PoE degrades
      to the prior). Duplicate effective components are intentional --
      see the module docstring's multiplicity identity.
    """
    eff = comp_masks[None]  # (1, K, M)
    if presence is not None:
        eff = eff * presence[:, None]  # (B, K, M)
    else:
        eff = jnp.broadcast_to(
            eff, (mu_e.shape[0],) + comp_masks.shape
        )
    mu_c, lv_c = product_of_experts(
        mu_e[:, None], lv_e[:, None], mask=eff
    )  # (B, K, L)
    weights = (jnp.sum(eff, axis=-1) > 0).astype(jnp.float32)
    return mu_c, lv_c, weights


def mixture_z(rng, mu_c, lv_c, weights, sample: bool = True):
    """Draw z from (or take the mean of) a Gaussian mixture.

    ``sample=True``: pick a component per example, uniform over the
    valid ones (``weights`` > 0), and reparameterize it -- an exact
    mixture draw. ``sample=False``: the mixture MEAN (weight-averaged
    component means) -- the deterministic-z convention the mvae paths
    use for eval/generation (z = posterior mean), extended to mixtures.

    All-zero weights (nothing observed) degrade to the prior: every
    component of an empty effective mask IS the prior under masked PoE,
    and the deterministic mean falls back to 0 explicitly.
    """
    if not sample:
        total = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1.0)
        return jnp.sum(mu_c * weights[..., None], axis=-2) / total
    comp_rng, z_rng = jax.random.split(rng)
    # Uniform over valid components; all -inf (nothing observed) makes
    # categorical return index 0, whose posterior is then the prior.
    logits = jnp.where(weights > 0, 0.0, -jnp.inf)
    idx = jax.random.categorical(comp_rng, logits, axis=-1)  # (B,)
    take = idx[:, None, None]
    mu = jnp.take_along_axis(mu_c, take, axis=-2)[:, 0]
    lv = jnp.take_along_axis(lv_c, take, axis=-2)[:, 0]
    return reparameterize(z_rng, mu, lv, sample=True)


def fuse_observed_z(
    rng, mu_e, lv_e, presence, objective: str = "mvae", sample: bool = True
):
    """One-stop posterior draw for generation/serving, objective-aware.

    ``"mvae"`` / ``"mvtcae"``: PoE of the observed experts (+ prior),
    then reparameterize -- bit-identical to the historical generate
    path (MVTCAE's inference posterior IS the PoE; its alpha cross-KLs
    are a training-time distillation that makes the unimodal reads
    agree with it, Hwang et al. 2021).
    ``"mmvae"`` / ``"mopoe"``: the corresponding mixture (see
    ``component_masks``). Returns ``z`` of shape ``(B, L)``.
    """
    if objective in ("mvae", "mvtcae"):
        mu, logvar = product_of_experts(mu_e, lv_e, mask=presence)
        return reparameterize(rng, mu, logvar, sample=sample)
    comp = component_masks(objective, mu_e.shape[-2])
    mu_c, lv_c, weights = posterior_components(
        mu_e, lv_e, presence, comp
    )
    return mixture_z(rng, mu_c, lv_c, weights, sample=sample)
