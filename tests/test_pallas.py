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
    g_got = jax.grad(lambda m, l: kernels._kl_bwd((m, l), jnp.ones(4))[0].sum())
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
