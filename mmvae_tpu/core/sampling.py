"""Reparameterized Gaussian sampling (SURVEY.md section 2.2)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["reparameterize"]


def reparameterize(
    rng: jax.Array | None,
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    *,
    sample: bool = True,
):
    """``z = mu + eps * exp(0.5*logvar)`` when sampling, else ``mu``.

    Matches the reference contract (training samples; eval returns the mean,
    SURVEY.md section 2.2 / 3c). ``sample`` must be a Python bool (static
    under jit) -- eval and train compile to different programs, which is the
    XLA-friendly way to express the mode switch.
    """
    if not sample:
        return mu
    if rng is None:
        raise ValueError("reparameterize(sample=True) requires an rng key")
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + eps * jnp.exp(0.5 * logvar)
