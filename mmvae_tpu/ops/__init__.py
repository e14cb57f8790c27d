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

import jax.numpy as jnp

from mmvae_tpu.ops import kernels as _kernels
from mmvae_tpu.core.elbo import kl_std_normal as _kl_jnp
from mmvae_tpu.core.likelihoods import bernoulli_nll as _bern_jnp
from mmvae_tpu.core.likelihoods import categorical_nll as _cat_jnp

__all__ = [
    "kl_std_normal",
    "bernoulli_nll",
    "categorical_nll",
    "masked_seq_ce",
    "set_backend",
    "get_backend",
]


def _tile_rows(x, k: int):
    """k-fold row tiling, B-MAJOR (term axis minor: row ``b*k + t``) --
    matches the train-step fold order (``train/step.py::_tile_terms``).
    The jnp broadcast+reshape form fuses into consumers instead of
    materializing, and a sharded-major x replicated-minor merge keeps
    the batch axis sharded under GSPMD."""
    return jnp.broadcast_to(
        x[:, None], (x.shape[0], k) + x.shape[1:]
    ).reshape((x.shape[0] * k,) + x.shape[1:])

# Per-op backend policy. "auto" resolves per op on TPU to whichever
# implementation WON the in-program A/B on the v5e (tools/ab_kernels.py,
# measured 2026-08-16 -- table in docs/DESIGN.md section 4; honesty rule
# from round 1: a Pallas kernel stays on the hot path only if it beats
# plain XLA at the real shapes) -- and to jnp off-TPU. XLA wins BCE and
# KL outright (it fuses them into the producing matmul/conv epilogues,
# so the logits never round-trip HBM -- an opaque pallas_call forces the
# materialization); the online-logsumexp seq-CE kernel wins (+2.6%
# in-program on MultiMNIST: XLA materializes the (rows, S, V)
# log-softmax for the gather, the kernel doesn't).
_AUTO_TPU = {"kl": False, "bce": False, "seq_ce": True}
_OPS = tuple(_AUTO_TPU)
_backend = {op: "auto" for op in _OPS}


def set_backend(name: str | None = None, **per_op: str) -> None:
    """Set the kernel backend: ``set_backend("jnp"|"pallas"|"auto")``
    for all ops, or per op, e.g. ``set_backend(bce="pallas")``."""
    updates = {op: name for op in _OPS} if name is not None else {}
    updates.update(per_op)
    for op, val in updates.items():
        if op not in _OPS:
            raise ValueError(f"unknown op {op!r}; have {list(_OPS)}")
        if val not in ("pallas", "jnp", "auto"):
            raise ValueError(f"unknown ops backend: {val!r}")
    _backend.update(updates)


def get_backend() -> str:
    vals = set(_backend.values())
    return vals.pop() if len(vals) == 1 else "mixed"


def _use_pallas(op: str) -> bool:
    val = _backend[op]
    if val == "pallas":
        return True
    if val == "jnp":
        return False
    return _AUTO_TPU[op] and jax.default_backend() == "tpu"


def kl_std_normal(mu, logvar):
    """KL(N(mu, e^logvar) || N(0,I)) summed over the last dim.

    Drop-in for ``mmvae_tpu.core.elbo.kl_std_normal``; Pallas-fused on TPU.
    """
    if _use_pallas("kl"):
        return _kernels.kl_std_normal_pallas(mu, logvar)
    return _kl_jnp(mu, logvar)


def bernoulli_nll(logits, x, event_ndims: int = 1):
    """Summed BCE-with-logits; Pallas-fused on TPU.

    Drop-in for ``mmvae_tpu.core.likelihoods.bernoulli_nll`` -- plus:
    ``x`` may carry fewer leading rows than ``logits`` (``n_logits =
    k * n_x``, the multi-term hot path, b-major rows). Tiled targets
    take the jnp broadcast path: the b-major broadcast+reshape fuses
    into XLA's own BCE fusion (zero materialization) and, unlike an
    opaque pallas_call, keeps the batch axis sharded under the mesh.
    """
    tiled = x.shape[0] != logits.shape[0]
    if tiled:
        x = _tile_rows(x, logits.shape[0] // x.shape[0])
        return _bern_jnp(logits, x, event_ndims)
    if _use_pallas("bce"):
        return _kernels.bernoulli_nll_pallas(logits, x, event_ndims)
    return _bern_jnp(logits, x, event_ndims)


def categorical_nll(logits, labels, event_ndims: int = 0):
    """Cross-entropy of integer labels; handles term-tiled logits.

    Drop-in for ``mmvae_tpu.core.likelihoods.categorical_nll``; when
    ``logits`` rows are a k-fold term tiling of ``labels`` rows, the
    labels are broadcast (integer rows are tiny -- XLA fuses the copy).
    """
    if labels.shape[0] != logits.shape[0]:
        labels = _tile_rows(labels, logits.shape[0] // labels.shape[0])
    return _cat_jnp(logits, labels, event_ndims)


def masked_seq_ce(logits, tokens, pad_token: int = 0):
    """Token cross-entropy summed over non-pad positions.

    ``logits``: ``(..., S, V)``; ``tokens``: ``(..., S)`` int ->
    ``(...,)`` NLL. The sequence decoders' recon reduction; one fused
    online-logsumexp Pallas kernel on TPU ([B:5]), log-softmax + gather
    + masked sum in jnp elsewhere. Term-tiled logits rows are matched by
    broadcasting the (tiny, integer) token rows.
    """
    if tokens.shape[0] != logits.shape[0]:
        tokens = _tile_rows(tokens, logits.shape[0] // tokens.shape[0])
    if _use_pallas("seq_ce"):
        return _kernels.masked_seq_ce_pallas(logits, tokens, pad_token)
    per_tok = _cat_jnp(logits, tokens)
    mask = (tokens != pad_token).astype(per_tok.dtype)
    return jnp.sum(per_tok * mask, axis=-1)
