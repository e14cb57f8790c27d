"""Pallas kernel tests in interpret mode vs jnp reference (SURVEY.md 4).

Compiled-on-TPU checks live in tools/tpu_checks.py (run on the v5e);
these validate semantics on CPU via the Pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.core.elbo import kl_std_normal as kl_jnp
from mmvae_tpu.core.likelihoods import bernoulli_nll as bce_jnp
from mmvae_tpu.ops import kernels


@pytest.mark.parametrize(
    "shape", [(4, 64), (7, 100), (256, 128), (3, 5, 16)]
)
def test_kl_interpret_matches_jnp(shape):
    rng = np.random.default_rng(0)
    mu = rng.normal(size=shape).astype(np.float32)
    lv = rng.normal(size=shape).astype(np.float32)
    got = kernels._kl_fwd_impl(
        jnp.asarray(mu), jnp.asarray(lv), interpret=True
    )
    want = kl_jnp(jnp.asarray(mu), jnp.asarray(lv))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize(
    "shape,event_ndims",
    [((4, 784), 1), ((6, 28, 28), 2), ((2, 64, 64, 3), 3), ((5, 130), 1)],
)
def test_bce_interpret_matches_jnp(shape, event_ndims):
    rng = np.random.default_rng(1)
    logits = rng.normal(size=shape).astype(np.float32) * 3
    x = rng.uniform(size=shape).astype(np.float32)
    got = kernels._bce_fwd_impl(
        jnp.asarray(logits), jnp.asarray(x), event_ndims, interpret=True
    )
    want = bce_jnp(jnp.asarray(logits), jnp.asarray(x), event_ndims)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)


def test_kl_custom_vjp_matches_jnp_grad():
    rng = np.random.default_rng(2)
    mu = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    lv = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    # The custom bwd is analytic jnp; compare against autodiff of the
    # jnp forward directly (no kernel execution needed).
    want_mu = jax.grad(lambda m: kl_jnp(m, lv).sum())(mu)
    got_mu, got_lv = kernels._kl_bwd((mu, lv), jnp.ones((4,)))
    want_lv = jax.grad(lambda l: kl_jnp(mu, l).sum())(lv)
    np.testing.assert_allclose(got_mu, want_mu, rtol=2e-4)
    np.testing.assert_allclose(got_lv, want_lv, rtol=2e-4)


def test_bce_custom_vjp_matches_jnp_grad():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    x = jnp.asarray(rng.uniform(size=(4, 32)).astype(np.float32))
    got_dl, got_dx = kernels._bce_bwd(1, (logits, x), jnp.ones((4,)))
    want_dl = jax.grad(lambda l: bce_jnp(l, x).sum())(logits)
    want_dx = jax.grad(lambda xx: bce_jnp(logits, xx).sum())(x)
    np.testing.assert_allclose(got_dl, want_dl, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(got_dx, want_dx, rtol=2e-4, atol=1e-5)


def _seq_ce_jnp(logits, tokens, pad_token=0):
    from mmvae_tpu.core.likelihoods import categorical_nll

    per_tok = categorical_nll(logits, tokens)
    mask = (tokens != pad_token).astype(per_tok.dtype)
    return jnp.sum(per_tok * mask, axis=-1)


@pytest.mark.parametrize(
    "shape_v",
    [
        ((4, 5), 13),  # MultiMNIST: (B, S), digit vocab
        ((6, 17), 211),  # odd sizes exercise row+vocab remainders
        ((3, 2, 8), 700),  # batch dims fold; vocab spans >1 column tile
    ],
)
def test_seq_ce_interpret_matches_jnp(shape_v):
    shape, v = shape_v
    rng = np.random.default_rng(4)
    logits = rng.normal(size=shape + (v,)).astype(np.float32) * 2
    tokens = rng.integers(0, v, size=shape).astype(np.int32)
    tokens[..., -1] = 0  # guarantee some PAD positions
    got = kernels._seq_ce_fwd_impl(
        jnp.asarray(logits), jnp.asarray(tokens), 0, interpret=True
    )
    want = _seq_ce_jnp(jnp.asarray(logits), jnp.asarray(tokens))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)


def test_seq_ce_custom_vjp_matches_jnp_grad():
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.normal(size=(4, 5, 13)).astype(np.float32))
    tokens = jnp.asarray(
        rng.integers(0, 13, size=(4, 5)).astype(np.int32)
    )
    got_dl, _ = kernels._seq_ce_bwd(
        0, (logits, tokens), jnp.ones((4,))
    )
    want_dl = jax.grad(lambda l: _seq_ce_jnp(l, tokens).sum())(logits)
    np.testing.assert_allclose(got_dl, want_dl, rtol=2e-4, atol=1e-5)


def test_backend_dispatch():
    from mmvae_tpu import ops

    assert ops.get_backend() == "auto"
    ops.set_backend("jnp")
    try:
        mu = jnp.zeros((2, 4))
        np.testing.assert_allclose(ops.kl_std_normal(mu, mu), 0.0)
        with pytest.raises(ValueError):
            ops.set_backend("cuda")
    finally:
        ops.set_backend("auto")


def _tile_bmajor(x, k):
    """B-major k-fold row tiling: row b*k + t <- source row b (matches
    train/step.py::_tile_terms and ops._tile_rows)."""
    return jnp.broadcast_to(
        x[:, None], (x.shape[0], k) + x.shape[1:]
    ).reshape((x.shape[0] * k,) + x.shape[1:])


def test_ops_nll_row_tiling_dispatch():
    """ops-level NLLs accept term-tiled logits with untiled targets
    (b-major rows, matching the train-step term fold) and match the
    explicit-broadcast jnp reference."""
    from mmvae_tpu import ops
    from mmvae_tpu.core.likelihoods import categorical_nll as cat_jnp

    rng = np.random.default_rng(8)
    k, b = 3, 10
    logits = jnp.asarray(rng.normal(size=(k * b, 28, 28)).astype(np.float32))
    x = jnp.asarray(rng.uniform(size=(b, 28, 28)).astype(np.float32))
    np.testing.assert_allclose(
        ops.bernoulli_nll(logits, x, 2),
        bce_jnp(logits, _tile_bmajor(x, k), 2),
        rtol=1e-5,
    )
    cl = jnp.asarray(rng.normal(size=(k * b, 10)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 10, size=(b,)).astype(np.int32))
    np.testing.assert_allclose(
        ops.categorical_nll(cl, lab), cat_jnp(cl, _tile_bmajor(lab, k)),
        rtol=1e-5,
    )
    sl = jnp.asarray(rng.normal(size=(k * b, 5, 13)).astype(np.float32))
    tok = jnp.asarray(rng.integers(0, 13, size=(b, 5)).astype(np.int32))
    np.testing.assert_allclose(
        ops.masked_seq_ce(sl, tok),
        _seq_ce_jnp(sl, _tile_bmajor(tok, k)),
        rtol=1e-5,
    )


def test_tile_rows_bmajor_order():
    """The ops tiling order IS the train-step fold order: row b*k + t
    maps to source row b. A mismatch here would silently score every
    decoder output against the wrong example's target."""
    from mmvae_tpu import ops

    x = jnp.arange(4)[:, None] * jnp.ones((1, 2))
    tiled = ops._tile_rows(x, 3)
    np.testing.assert_array_equal(
        np.asarray(tiled[:, 0]),
        np.repeat(np.arange(4), 3),
    )
