"""Product-of-experts Gaussian posterior fusion.

Reference behavior (SURVEY.md section 2.1, tag [K]/[B:5]): precision-weighted
product of Gaussian experts with a unit-Gaussian prior expert always included,
so any modality subset (including the empty set) yields a valid posterior:

    T_i  = 1 / (var_i + eps)
    mu   = (sum_i mu_i * T_i) / (sum_i T_i)
    var  = 1 / (sum_i T_i)

TPU-native design notes:
  * The reference stacks present experts into a ragged list and loops; here
    experts are a fixed-shape ``(..., n_experts, latent)`` tensor with a
    float presence ``mask`` -- an absent expert contributes zero precision.
    Fixed shapes mean one XLA program regardless of which modalities are
    observed, and the same code path vmaps over the static ELBO-subset mask
    matrix (SURVEY.md section 7 "hard parts").
  * The prior expert is folded in analytically (T=1, mu=0) instead of being
    materialized, saving a (batch, latent) buffer and an HBM round-trip.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["product_of_experts", "prior_expert"]


def product_of_experts(
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    eps: float = 1e-8,
    include_prior: bool = True,
):
    """Fuse Gaussian experts by precision-weighted product.

    Args:
      mu: ``(..., n_experts, latent)`` expert means (prior NOT included).
      logvar: same shape, expert log-variances.
      mask: optional ``(..., n_experts)`` float/bool presence mask; an expert
        with mask 0 contributes nothing (zero precision).
      eps: stabilizer added to variances before inversion (matches the
        reference family's ``1/(var+eps)``, SURVEY.md section 2.1).
      include_prior: fold in the unit-Gaussian prior expert (T=1, mu=0).
        With the prior the fusion is well-defined even for an all-zero mask
        (degenerates to the prior itself).

    Returns:
      ``(mu_fused, logvar_fused)`` each of shape ``(..., latent)``.
    """
    # Bound expert log-variances before inversion: an unconstrained
    # encoder can drive logvar past float range mid-training (observed as
    # a NaN blowup on the 19-expert CelebA run at epoch 17), and
    # exp(-logvar) then overflows to inf precision. +-11 keeps precisions
    # in [1.7e-5, 6e4] -- far outside the operating range of a trained
    # model, so fused posteriors are unaffected in normal operation.
    logvar = jnp.clip(logvar, -11.0, 11.0)
    precision = 1.0 / (jnp.exp(logvar) + eps)
    if mask is not None:
        mask = jnp.asarray(mask, dtype=precision.dtype)
        precision = precision * mask[..., None]
    prior_t = 1.0 if include_prior else 0.0
    total_precision = prior_t + jnp.sum(precision, axis=-2)
    mu_fused = jnp.sum(mu * precision, axis=-2) / total_precision
    logvar_fused = -jnp.log(total_precision)
    return mu_fused, logvar_fused


def prior_expert(shape, dtype=jnp.float32):
    """Unit-Gaussian expert ``(mu=0, logvar=0)`` of the given shape.

    Provided for API parity with the reference (SURVEY.md section 2.1);
    :func:`product_of_experts` folds the prior in analytically, so this is
    only needed when composing experts manually.
    """
    return jnp.zeros(shape, dtype=dtype), jnp.zeros(shape, dtype=dtype)
