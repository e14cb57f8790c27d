"""Importance-weighted marginal log-likelihood (IWAE bound).

The reference family evaluates models by test ELBO; the underlying MVAE
paper additionally reports test *marginal* log-likelihoods estimated by
importance sampling:

    log p(x) >= log (1/k) sum_i  p(x | z_i) p(z_i) / q(z_i | x),
    z_i ~ q(z | x)  (the joint PoE posterior)

which is tight as k grows (IWAE, Burda et al. 2016). TPU-shaping: the k
importance samples fold into the batch axis exactly like ELBO terms do in
``train/step.py`` -- one (k*B, ...) decoder pass, big MXU matmuls, then a
``logsumexp`` over the unfolded k axis. No Python loop over samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmvae_tpu.core.likelihoods import gaussian_nll
from mmvae_tpu.core.poe import product_of_experts

__all__ = ["iwae_bound"]


def _diag_normal_logpdf(z, mu, logvar):
    """log N(z; mu, diag exp(logvar)), summed over the latent dim.

    Exactly ``-gaussian_nll`` -- one implementation of the density math
    (and its log(2*pi) constant) for the whole package."""
    return -gaussian_nll(mu, z, logvar, event_ndims=1)


def iwae_bound(model, params, batch, rng, k: int = 64):
    """Per-example IWAE estimate of log p(x) for the full joint batch.

    ``batch`` maps every modality name to targets (all observed -- the
    marginal being estimated is the joint likelihood). Returns ``(B,)``
    log-likelihood estimates (natural log). ``k=1`` is the single-sample
    ELBO estimator; larger ``k`` tightens monotonically in expectation.
    """
    data = {kk: v for kk, v in batch.items() if kk != "presence"}
    variables = {"params": params}
    mu_e, lv_e = model.apply(variables, data, method="encode")  # (B,M,L)
    mu, logvar = product_of_experts(mu_e, lv_e)  # joint posterior (B,L)

    batch_size = mu.shape[0]
    eps = jax.random.normal(
        rng, (batch_size, k) + mu.shape[1:], dtype=mu.dtype
    )
    z = mu[:, None] + jnp.exp(0.5 * logvar)[:, None] * eps  # (B,k,L)

    log_q = _diag_normal_logpdf(z, mu[:, None], logvar[:, None])  # (B,k)
    log_prior = _diag_normal_logpdf(
        z, jnp.zeros_like(mu)[:, None], jnp.zeros_like(logvar)[:, None]
    )

    # Fold k into the batch axis B-MAJOR -- same fold as the ELBO term
    # fold (train/step.py): one decoder pass, targets stay untiled
    # (nll_all maps k-tiled b-major decoder rows onto one copy of the
    # targets), and the sharded batch axis stays outermost.
    z_flat = z.reshape((batch_size * k, -1))
    seq_names = [s.name for s in model.specs() if s.kind == "seq"]
    if seq_names:
        from mmvae_tpu.train.step import _tile_terms

        decode_batch = _tile_terms(
            {n: data[n] for n in seq_names}, k
        )
    else:
        decode_batch = None
    recons = model.apply(variables, z_flat, decode_batch, method="decode")
    nll_flat = model.apply(
        variables, recons, data, method="nll_all"
    )  # (M, B*k)
    # Marginal likelihood sums the RAW modality NLLs (no lambda
    # weighting -- lambdas are training-loss weights, not likelihoods).
    log_px_given_z = -jnp.sum(
        nll_flat.reshape((model.n_modalities, batch_size, k)), axis=0
    )  # (B,k)

    log_w = log_px_given_z + log_prior - log_q  # (B,k)
    return jax.scipy.special.logsumexp(log_w, axis=1) - jnp.log(
        jnp.asarray(k, log_w.dtype)
    )
