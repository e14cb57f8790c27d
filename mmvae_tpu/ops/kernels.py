"""Pallas TPU kernels: fused KL and Bernoulli log-likelihood reductions.

Both ops are row-wise reduce patterns ``(N, D) -> (N,)`` that the MVAE hot
path evaluates at (n_terms * batch) granularity ([B:5]). Each kernel:

  * tiles rows and columns on a 2-D grid, accumulating partial sums into a
    revisited ``(TILE_N, 1)`` output block (init on the first column tile);
  * masks the column remainder with ``broadcasted_iota`` so padding never
    contributes (BCE of a zero logit is log 2, not 0 -- padding must be
    masked, not zero-filled);
  * carries a custom VJP with the analytic elementwise backward (the
    backward is a pure VPU map that XLA fuses into the surrounding
    gradient computation, so it stays jnp).

Forward-only cost: one HBM read of each input, one (N,) write -- the fused
replacement for the elementwise-temp + reduce pair XLA would otherwise
materialize at f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "kl_std_normal_pallas",
    "bernoulli_nll_pallas",
    "masked_seq_ce_pallas",
]

_TILE_N = 256
_TILE_D = 512


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _col_mask(d_total: int, tile_d: int):
    """(1, tile_d) bool mask of in-range columns for this column tile.

    Used with ``jnp.where`` (not multiply): Pallas pads partial blocks
    with uninitialized memory, and 0 * inf/nan is nan -- selection is the
    only safe way to drop padding."""
    j = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, tile_d), 1)
    return j * tile_d + col < d_total


def _kl_kernel(mu_ref, lv_ref, out_ref, *, d_total: int, tile_d: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    mu = mu_ref[:]
    lv = lv_ref[:]
    per_elem = -0.5 * (1.0 + lv - mu * mu - jnp.exp(lv))
    per_elem = jnp.where(_col_mask(d_total, tile_d), per_elem, 0.0)
    out_ref[:] += jnp.sum(per_elem, axis=1, keepdims=True)


def _bce_kernel(l_ref, x_ref, out_ref, *, d_total: int, tile_d: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    logits = l_ref[:]
    x = x_ref[:]
    per_elem = (
        jnp.maximum(logits, 0.0)
        - logits * x
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    per_elem = jnp.where(_col_mask(d_total, tile_d), per_elem, 0.0)
    out_ref[:] += jnp.sum(per_elem, axis=1, keepdims=True)


def _rowwise_reduce(kernel, a, b, interpret: bool = False):
    """Run a 2-input row-reduce kernel over (N, D) f32 inputs -> (N,).

    Both inputs carry the same rows. (A round-2 variant let ``b`` carry
    fewer rows with a t-major block index map; the round-3 b-major term
    fold -- which keeps the decode pass sharded under the mesh -- made
    that mapping unrepresentable at block granularity, and the tiled
    BCE path goes through the jnp broadcast that XLA fuses anyway.)
    """
    n, d = a.shape
    assert b.shape[0] == n, (n, b.shape)
    tile_n = min(_TILE_N, max(8, n))
    b_index = lambda i, j: (i, j)  # noqa: E731
    tile_d = min(_TILE_D, max(128, d))
    grid = (_cdiv(n, tile_n), _cdiv(d, tile_d))
    out = pl.pallas_call(
        functools.partial(kernel, d_total=d, tile_d=tile_d),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_n, tile_d),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_n, tile_d), b_index, memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * n * d, bytes_accessed=2 * n * d * 4 + n * 4,
            transcendentals=n * d,
        ),
    )(a, b)
    return out[:, 0]


def _flatten_rows(x, event_ndims: int):
    batch_shape = x.shape[: x.ndim - event_ndims]
    n = 1
    for s in batch_shape:
        n *= s
    return x.reshape((n, -1)) if event_ndims else x.reshape((n, 1)), batch_shape


# ---------------------------------------------------------------- KL ----


@jax.custom_vjp
def kl_std_normal_pallas(mu, logvar):
    """Pallas-fused KL(N(mu, e^lv) || N(0,I)), summed over the last dim."""
    return _kl_fwd_impl(mu, logvar)


def _kl_fwd_impl(mu, logvar, interpret: bool = False):
    rows, batch_shape = _flatten_rows(mu.astype(jnp.float32), 1)
    lv_rows, _ = _flatten_rows(logvar.astype(jnp.float32), 1)
    out = _rowwise_reduce(_kl_kernel, rows, lv_rows, interpret=interpret)
    return out.reshape(batch_shape)


def _kl_fwd(mu, logvar):
    return kl_std_normal_pallas(mu, logvar), (mu, logvar)


def _kl_bwd(res, g):
    mu, logvar = res
    g = g[..., None]
    return (g * mu, g * 0.5 * (jnp.exp(logvar) - 1.0))


kl_std_normal_pallas.defvjp(_kl_fwd, _kl_bwd)


# --------------------------------------------------------------- BCE ----


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bernoulli_nll_pallas(logits, x, event_ndims: int = 1):
    """Pallas-fused summed BCE-with-logits over trailing event dims."""
    return _bce_fwd_impl(logits, x, event_ndims)


def _bce_fwd_impl(logits, x, event_ndims: int, interpret: bool = False):
    rows, batch_shape = _flatten_rows(
        logits.astype(jnp.float32), event_ndims
    )
    x_rows, _ = _flatten_rows(x.astype(jnp.float32), event_ndims)
    out = _rowwise_reduce(_bce_kernel, rows, x_rows, interpret=interpret)
    return out.reshape(batch_shape)


# ------------------------------------------------- masked seq CE ----


def _seq_ce_kernel(
    l_ref, lab_ref, out_ref, m_ref, s_ref, g_ref,
    *, v_total: int, tile_v: int, pad_token: int,
):
    """Online-logsumexp token cross-entropy, one row per token.

    Column (vocab) tiles stream through VMEM flash-style: running max
    ``m``, rescaled exp-sum ``s``, and the gathered label logit ``g``
    live in scratch; the masked NLL is emitted on the last column tile.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[:] = jnp.zeros_like(s_ref)
        g_ref[:] = jnp.zeros_like(g_ref)

    logits = l_ref[:]  # (tile_n, tile_v)
    lab = lab_ref[:]  # (tile_n, 1) int32
    col = (
        jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * tile_v
    )
    valid = col < v_total  # vocab-remainder padding must not contribute
    neg = jnp.where(valid, logits, -jnp.inf)

    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(neg, axis=1, keepdims=True))
    s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.where(valid, jnp.exp(neg - m_new), 0.0),
        axis=1,
        keepdims=True,
    )
    m_ref[:] = m_new
    g_ref[:] += jnp.sum(
        jnp.where(col == lab, logits, 0.0), axis=1, keepdims=True
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        nll = jnp.log(s_ref[:]) + m_ref[:] - g_ref[:]
        out_ref[:] = jnp.where(lab != pad_token, nll, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def masked_seq_ce_pallas(logits, tokens, pad_token: int = 0):
    """Fused token cross-entropy summed over non-pad positions.

    ``logits``: ``(..., S, V)``; ``tokens``: ``(..., S)`` int. Returns
    per-example NLL of shape ``(...,)`` -- the ``categorical_nll`` +
    pad-mask + sum pattern of the sequence decoders (MultiMNIST/CUB)
    as ONE kernel: one HBM read of the logits, no ``(..., S, V)``
    log-softmax temp, no separate gather pass ([B:5] log-likelihood
    reduction mandate).
    """
    return _seq_ce_fwd_impl(logits, tokens, pad_token)


def _seq_ce_fwd_impl(logits, tokens, pad_token: int, interpret=False):
    batch_shape = tokens.shape
    v = logits.shape[-1]
    rows = logits.astype(jnp.float32).reshape((-1, v))
    labs = tokens.astype(jnp.int32).reshape((-1, 1))
    n = rows.shape[0]
    tile_n = min(_TILE_N, max(8, n))
    tile_v = min(_TILE_D, max(128, v))
    grid = (_cdiv(n, tile_n), _cdiv(v, tile_v))
    out = pl.pallas_call(
        functools.partial(
            _seq_ce_kernel, v_total=v, tile_v=tile_v, pad_token=pad_token
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile_n, tile_v),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * n * v,
            bytes_accessed=n * v * 4 + n * 8,
            transcendentals=n * v,
        ),
    )(rows, labs)
    # Token rows -> per-example sum over the sequence axis (the tiny
    # (..., S) -> (...) reduce fuses into surrounding XLA code).
    return out.reshape(batch_shape).sum(axis=-1)


def _seq_ce_fwd(logits, tokens, pad_token):
    return masked_seq_ce_pallas(logits, tokens, pad_token), (
        logits,
        tokens,
    )


def _seq_ce_bwd(pad_token, res, g):
    logits, tokens = res
    # d nll / d logits = softmax - onehot, zeroed on pad positions.
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(tokens, logits.shape[-1], dtype=p.dtype)
    mask = (tokens != pad_token).astype(p.dtype)[..., None]
    dlogits = g[..., None, None] * (p - onehot) * mask
    return (dlogits.astype(logits.dtype), None)


masked_seq_ce_pallas.defvjp(_seq_ce_fwd, _seq_ce_bwd)


def _bce_fwd(logits, x, event_ndims):
    return bernoulli_nll_pallas(logits, x, event_ndims), (logits, x)


def _bce_bwd(event_ndims, res, g):
    logits, x = res
    for _ in range(event_ndims):
        g = g[..., None]
    xb = x.astype(logits.dtype)
    dlogits = g * (jax.nn.sigmoid(logits) - xb)
    dx = g * (-logits)
    return (dlogits, dx.astype(x.dtype))


bernoulli_nll_pallas.defvjp(_bce_fwd, _bce_bwd)
