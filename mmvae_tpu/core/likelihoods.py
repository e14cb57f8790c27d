"""Per-modality negative log-likelihoods (reconstruction terms).

Reference behavior (SURVEY.md section 2.8): recon = BCE for images,
cross-entropy for labels/captions, summed over event dims per example.
All functions return per-example NLL of shape ``batch_shape`` (leading dims
of the inputs minus the event dims), so callers can weight/mask per ELBO
term and reduce however the experiment config dictates.

These are the jnp reference implementations; ``mmvae_tpu.ops`` provides
Pallas-fused versions of the hot reductions with identical semantics
(selected via ``mmvae_tpu.ops.set_backend`` / the per-op "auto" policy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bernoulli_nll", "categorical_nll", "gaussian_nll"]

_LOG_2PI = 1.8378770664093453  # log(2*pi)


def bernoulli_nll(logits: jnp.ndarray, x: jnp.ndarray, event_ndims: int = 1):
    """Sum of BCE-with-logits over the trailing ``event_ndims`` dims.

    Numerically stable form: ``max(l,0) - l*x + log1p(exp(-|l|))``.
    Targets may be soft (in [0,1]), matching BCE on real-valued pixels.
    """
    x = x.astype(logits.dtype)
    per_elem = (
        jnp.maximum(logits, 0.0)
        - logits * x
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.sum(per_elem, axis=tuple(range(-event_ndims, 0)))


def categorical_nll(
    logits: jnp.ndarray, labels: jnp.ndarray, event_ndims: int = 0
):
    """Cross-entropy of integer ``labels`` under ``logits``.

    ``logits``: ``(..., *event, n_classes)``; ``labels``: ``(..., *event)``
    int. The class axis is always last; ``event_ndims`` counts the extra
    event dims *of labels* to sum over (0 for a single label, 1 for a token
    sequence).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if event_ndims:
        nll = jnp.sum(nll, axis=tuple(range(-event_ndims, 0)))
    return nll


def gaussian_nll(
    mean: jnp.ndarray,
    x: jnp.ndarray,
    logvar: jnp.ndarray | float = 0.0,
    event_ndims: int = 1,
):
    """Diagonal-Gaussian NLL summed over trailing ``event_ndims`` dims."""
    logvar = jnp.asarray(logvar, dtype=mean.dtype)
    per_elem = 0.5 * (
        _LOG_2PI + logvar + jnp.square(x - mean) * jnp.exp(-logvar)
    )
    return jnp.sum(per_elem, axis=tuple(range(-event_ndims, 0)))
