"""Pallas-fused hot-path reductions with jnp fallbacks.

[B:5] mandates Pallas kernels for the KL and log-likelihood reductions --
the two bandwidth-bound elementwise+reduce patterns on the MVAE hot path.
Both come with custom VJPs so they sit inside ``jax.grad``.

Backend selection: ``set_backend("pallas" | "jnp" | "auto")``. "auto"
(default) uses Pallas on TPU and jnp elsewhere (Pallas-on-CPU requires
interpret mode, which is for tests).
"""

from __future__ import annotations

import jax

from mmvae_tpu.ops import kernels as _kernels
from mmvae_tpu.core.elbo import kl_std_normal as _kl_jnp
from mmvae_tpu.core.likelihoods import bernoulli_nll as _bern_jnp

__all__ = [
    "kl_std_normal",
    "bernoulli_nll",
    "set_backend",
    "get_backend",
]

_backend = "auto"


def set_backend(name: str) -> None:
    global _backend
    if name not in ("pallas", "jnp", "auto"):
        raise ValueError(f"unknown ops backend: {name!r}")
    _backend = name


def get_backend() -> str:
    return _backend


def _use_pallas() -> bool:
    if _backend == "pallas":
        return True
    if _backend == "jnp":
        return False
    return jax.default_backend() == "tpu"


def kl_std_normal(mu, logvar):
    """KL(N(mu, e^logvar) || N(0,I)) summed over the last dim.

    Drop-in for ``mmvae_tpu.core.elbo.kl_std_normal``; Pallas-fused on TPU.
    """
    if _use_pallas():
        return _kernels.kl_std_normal_pallas(mu, logvar)
    return _kl_jnp(mu, logvar)


def bernoulli_nll(logits, x, event_ndims: int = 1):
    """Summed BCE-with-logits; Pallas-fused on TPU.

    Drop-in for ``mmvae_tpu.core.likelihoods.bernoulli_nll``.
    """
    if _use_pallas():
        return _kernels.bernoulli_nll_pallas(logits, x, event_ndims)
    return _bern_jnp(logits, x, event_ndims)
