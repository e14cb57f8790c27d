"""PoE fusion: closed-form and torch parity checks (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.core import product_of_experts, prior_expert


def _numpy_poe(mu, logvar, mask=None, eps=1e-8, include_prior=True):
    """Straight-line numpy product-of-experts, prior stacked explicitly."""
    mu = np.asarray(mu, np.float64)
    logvar = np.asarray(logvar, np.float64)
    if include_prior:
        prior_mu = np.zeros_like(mu[..., :1, :])
        mu = np.concatenate([prior_mu, mu], axis=-2)
        logvar = np.concatenate([prior_mu, logvar], axis=-2)
        if mask is not None:
            ones = np.ones(mask.shape[:-1] + (1,))
            mask = np.concatenate([ones, np.asarray(mask, np.float64)], -1)
    t = 1.0 / (np.exp(logvar) + eps)
    if mask is not None:
        t = t * mask[..., None]
    total = t.sum(-2)
    return (mu * t).sum(-2) / total, -np.log(total)


def test_two_expert_closed_form():
    # Hand-computed: N(1, 1) x N(-1, 1) x prior N(0,1): T = 3, mu = 0
    mu = jnp.array([[1.0, 2.0], [-1.0, 0.0]])[None]  # (1, 2, 2)
    logvar = jnp.zeros((1, 2, 2))
    fmu, flogvar = product_of_experts(mu, logvar, eps=0.0)
    np.testing.assert_allclose(fmu[0], [0.0, 2.0 / 3.0], atol=2e-4)
    np.testing.assert_allclose(flogvar[0], np.log(1 / 3.0), atol=2e-4)


def test_matches_numpy_reference():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(4, 5, 8)).astype(np.float32)
    logvar = rng.normal(size=(4, 5, 8)).astype(np.float32)
    fmu, flogvar = product_of_experts(jnp.asarray(mu), jnp.asarray(logvar))
    emu, elogvar = _numpy_poe(mu, logvar)
    np.testing.assert_allclose(fmu, emu, rtol=2e-4)
    np.testing.assert_allclose(flogvar, elogvar, rtol=2e-4)


def test_mask_semantics_absent_expert_is_zero_precision():
    rng = np.random.default_rng(1)
    mu = rng.normal(size=(3, 4, 6)).astype(np.float32)
    logvar = rng.normal(size=(3, 4, 6)).astype(np.float32)
    mask = np.array([[1, 1, 0, 1], [0, 0, 0, 0], [1, 0, 1, 0]], np.float32)
    fmu, flogvar = product_of_experts(
        jnp.asarray(mu), jnp.asarray(logvar), mask=jnp.asarray(mask)
    )
    emu, elogvar = _numpy_poe(mu, logvar, mask=mask)
    np.testing.assert_allclose(fmu, emu, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(flogvar, elogvar, rtol=2e-4, atol=2e-4)
    # Empty subset degenerates to the prior exactly.
    np.testing.assert_allclose(fmu[1], 0.0, atol=2e-4)
    np.testing.assert_allclose(flogvar[1], 0.0, atol=2e-4)


def test_masked_equals_dropping_experts():
    """Masking expert i == physically removing it from the stack."""
    rng = np.random.default_rng(2)
    mu = rng.normal(size=(2, 3, 4)).astype(np.float32)
    logvar = rng.normal(size=(2, 3, 4)).astype(np.float32)
    mask = jnp.asarray([[1.0, 0.0, 1.0], [1.0, 0.0, 1.0]])
    fmu_m, flv_m = product_of_experts(
        jnp.asarray(mu), jnp.asarray(logvar), mask=mask
    )
    fmu_d, flv_d = product_of_experts(
        jnp.asarray(mu[:, [0, 2]]), jnp.asarray(logvar[:, [0, 2]])
    )
    np.testing.assert_allclose(fmu_m, fmu_d, rtol=2e-4)
    np.testing.assert_allclose(flv_m, flv_d, rtol=2e-4)


def test_prior_expert_shape_and_values():
    mu, logvar = prior_expert((2, 3))
    assert mu.shape == (2, 3) and logvar.shape == (2, 3)
    assert jnp.all(mu == 0) and jnp.all(logvar == 0)


def test_torch_parity():
    """Parity vs an eager-PyTorch PoE fixture (SURVEY.md section 4)."""
    torch = pytest.importorskip("torch")

    def torch_poe(mu, logvar, eps=1e-8):
        # Reference-family PoE with explicit prior expert stacking.
        prior = torch.zeros_like(mu[:, :1])
        mu = torch.cat([prior, mu], dim=1)
        logvar = torch.cat([prior, logvar], dim=1)
        var = torch.exp(logvar) + eps
        t = 1.0 / var
        pd_mu = torch.sum(mu * t, dim=1) / torch.sum(t, dim=1)
        pd_var = 1.0 / torch.sum(t, dim=1)
        return pd_mu, torch.log(pd_var)

    rng = np.random.default_rng(3)
    mu = rng.normal(size=(8, 19, 16)).astype(np.float32)  # CelebA-scale: 19
    logvar = rng.normal(size=(8, 19, 16)).astype(np.float32)
    tmu, tlv = torch_poe(torch.from_numpy(mu), torch.from_numpy(logvar))
    jmu, jlv = product_of_experts(jnp.asarray(mu), jnp.asarray(logvar))
    np.testing.assert_allclose(jmu, tmu.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(jlv, tlv.numpy(), rtol=2e-4, atol=2e-4)


def test_jit_and_grad():
    """PoE must be jittable and differentiable (it sits inside the step)."""

    def loss(mu, logvar):
        fmu, flv = product_of_experts(mu, logvar)
        return jnp.sum(fmu**2) + jnp.sum(flv)

    mu = jnp.ones((2, 3, 4))
    logvar = jnp.zeros((2, 3, 4))
    g = jax.jit(jax.grad(loss))(mu, logvar)
    assert g.shape == mu.shape
    assert bool(jnp.all(jnp.isfinite(g)))
