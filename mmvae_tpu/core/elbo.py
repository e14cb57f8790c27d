"""Multi-term MVAE ELBO (SURVEY.md section 2.8).

Per modality subset S (one ELBO "term"):

    L_S = sum_{m in S} lambda_m * NLL_m(dec_m(z_S), x_m)
          + beta(t) * KL(q(z|S) || N(0, I))

and the training loss is ``sum_S L_S`` over {joint, each unimodal, k random
subsets}, meaned over the batch. The subset structure arrives as a float
mask matrix (see ``mmvae_tpu.core.subsets``), so the whole multi-term loss
is one fused XLA program -- no per-subset Python forwards.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["kl_std_normal", "kl_gauss_gauss", "elbo_terms"]


def kl_std_normal(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mu, diag exp(logvar)) || N(0, I)), summed over the latent dim.

    ``-0.5 * sum(1 + logvar - mu^2 - exp(logvar))`` -- returns shape
    ``mu.shape[:-1]``. ``mmvae_tpu.ops.kl_std_normal`` is the Pallas-fused
    drop-in for the hot path.
    """
    return -0.5 * jnp.sum(
        1.0 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=-1
    )


def kl_gauss_gauss(
    mu1: jnp.ndarray,
    logvar1: jnp.ndarray,
    mu2: jnp.ndarray,
    logvar2: jnp.ndarray,
) -> jnp.ndarray:
    """KL(N(mu1, diag e^lv1) || N(mu2, diag e^lv2)), summed over the
    latent dim; returns shape ``mu1.shape[:-1]``. Used by the
    unimodal-posterior alignment regularizer (train/step.py
    ``unimodal_align_weight``): distill each subset posterior toward the
    (stop-gradiented) joint posterior.
    """
    return 0.5 * jnp.sum(
        logvar2
        - logvar1
        + (jnp.exp(logvar1) + jnp.square(mu1 - mu2)) / jnp.exp(logvar2)
        - 1.0,
        axis=-1,
    )


def elbo_terms(
    nll: jnp.ndarray,
    kl: jnp.ndarray,
    subset_masks: jnp.ndarray,
    lambdas: jnp.ndarray,
    beta,
    term_weights: jnp.ndarray | None = None,
):
    """Combine per-term reconstruction NLLs and KLs into the total loss.

    Args:
      nll: ``(n_terms, n_modalities, batch)`` per-example recon NLLs -- the
        NLL of modality m's decoder driven by term t's latent.
      kl: ``(n_terms, batch)`` per-term KL to the prior.
      subset_masks: ``(n_terms, n_modalities)`` float masks; recon term
        (t, m) only counts when modality m is in subset t.
      lambdas: ``(n_modalities,)`` per-modality recon weights (the
        reference's lambda_image / lambda_text style scaling).
      beta: scalar KL annealing factor.
      term_weights: optional ``(n_terms, batch)`` per-example term
        weights multiplying each term's (recon + beta*KL). The MVAE
        objective sums terms unweighted (None); the mixture objectives
        (MMVAE/MoPoE, ``core/mixture.py``) average over their mixture
        components, i.e. weight each VALID component 1/K_valid.

    Returns:
      ``(loss, metrics)`` where ``loss`` is the batch-mean total loss
      (scalar) and ``metrics`` holds per-term batch-mean components for the
      ELBO-trajectory comparison mandated by SURVEY.md section 5
      (metrics/logging row).
    """
    weights = subset_masks * lambdas[None, :]  # (T, M)
    recon_per_term = jnp.einsum("tm,tmb->tb", weights, nll)  # (T, B)
    per_term = recon_per_term + beta * kl  # (T, B)
    if term_weights is not None:
        per_term = per_term * term_weights
    loss = jnp.mean(jnp.sum(per_term, axis=0))
    metrics = {
        "loss": loss,
        "recon_per_term": jnp.mean(recon_per_term, axis=-1),  # (T,)
        "kl_per_term": jnp.mean(kl, axis=-1),  # (T,)
        "elbo_per_term": jnp.mean(per_term, axis=-1),  # (T,)
    }
    return loss, metrics
