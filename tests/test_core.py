"""Likelihoods, KL, annealing, subsets, reparameterize (SURVEY.md sec. 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.core import (
    annealing_factor,
    bernoulli_nll,
    categorical_nll,
    elbo_subset_masks,
    elbo_terms,
    gaussian_nll,
    kl_std_normal,
    random_subset_masks,
    reparameterize,
)


class TestLikelihoods:
    def test_bernoulli_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(4, 784)).astype(np.float32)
        x = rng.uniform(size=(4, 784)).astype(np.float32)
        expected = torch.nn.functional.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(x), reduction="none"
        ).sum(-1)
        got = bernoulli_nll(jnp.asarray(logits), jnp.asarray(x))
        np.testing.assert_allclose(got, expected.numpy(), rtol=2e-4)

    def test_bernoulli_multi_event_dims(self):
        logits = jnp.zeros((2, 3, 4, 5))
        x = jnp.ones((2, 3, 4, 5)) * 0.5
        out = bernoulli_nll(logits, x, event_ndims=3)
        assert out.shape == (2,)
        np.testing.assert_allclose(out, np.log(2.0) * 60, rtol=2e-4)

    def test_categorical_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(6, 10)).astype(np.float32)
        labels = rng.integers(0, 10, size=(6,))
        expected = torch.nn.functional.cross_entropy(
            torch.from_numpy(logits),
            torch.from_numpy(labels),
            reduction="none",
        )
        got = categorical_nll(jnp.asarray(logits), jnp.asarray(labels))
        np.testing.assert_allclose(got, expected.numpy(), rtol=2e-4)

    def test_categorical_sequence(self):
        """Token sequences: event_ndims=1 sums the per-token CE."""
        logits = jnp.zeros((2, 5, 11))  # (batch, seq, vocab)
        labels = jnp.zeros((2, 5), dtype=jnp.int32)
        out = categorical_nll(logits, labels, event_ndims=1)
        np.testing.assert_allclose(out, np.log(11.0) * 5, rtol=2e-4)

    def test_gaussian_unit_variance(self):
        x = jnp.asarray([[1.0, 2.0]])
        out = gaussian_nll(jnp.zeros((1, 2)), x)
        expected = 0.5 * (2 * np.log(2 * np.pi) + 1.0 + 4.0)
        np.testing.assert_allclose(out[0], expected, rtol=2e-4)


class TestKL:
    def test_standard_normal_is_zero(self):
        kl = kl_std_normal(jnp.zeros((3, 8)), jnp.zeros((3, 8)))
        np.testing.assert_allclose(kl, 0.0, atol=2e-4)

    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        mu = rng.normal(size=(5, 16)).astype(np.float32)
        logvar = rng.normal(size=(5, 16)).astype(np.float32)
        tmu, tlv = torch.from_numpy(mu), torch.from_numpy(logvar)
        expected = -0.5 * torch.sum(1 + tlv - tmu.pow(2) - tlv.exp(), dim=1)
        got = kl_std_normal(jnp.asarray(mu), jnp.asarray(logvar))
        np.testing.assert_allclose(got, expected.numpy(), rtol=2e-4)


class TestAnnealing:
    def test_linear_ramp(self):
        np.testing.assert_allclose(annealing_factor(0, 100), 0.0)
        np.testing.assert_allclose(annealing_factor(50, 100), 0.5)
        np.testing.assert_allclose(annealing_factor(100, 100), 1.0)
        np.testing.assert_allclose(annealing_factor(250, 100), 1.0)

    def test_disabled(self):
        np.testing.assert_allclose(annealing_factor(0, 0), 1.0)

    def test_traced_step(self):
        f = jax.jit(lambda s: annealing_factor(s, 10))
        np.testing.assert_allclose(f(jnp.asarray(5)), 0.5)


class TestSubsets:
    def test_static_masks(self):
        m = elbo_subset_masks(3)
        assert m.shape == (4, 3)
        np.testing.assert_allclose(m[0], 1.0)
        np.testing.assert_allclose(np.asarray(m[1:]), np.eye(3))

    def test_random_masks(self):
        m = random_subset_masks(jax.random.key(0), 8, 19)
        assert m.shape == (8, 19)
        assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}


class TestReparameterize:
    def test_eval_returns_mean(self):
        mu = jnp.arange(6.0).reshape(2, 3)
        z = reparameterize(None, mu, jnp.zeros((2, 3)), sample=False)
        np.testing.assert_allclose(z, mu)

    def test_sample_statistics(self):
        rng = jax.random.key(0)
        mu = jnp.full((20000,), 2.0)
        logvar = jnp.full((20000,), np.log(0.25))
        z = reparameterize(rng, mu, logvar)
        assert abs(float(z.mean()) - 2.0) < 0.02
        assert abs(float(z.std()) - 0.5) < 0.02


class TestElboTerms:
    def test_manual_combination(self):
        nll = jnp.asarray(
            [[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]]
        )  # (T=2, M=2, B=2)
        kl = jnp.asarray([[0.5, 0.5], [1.0, 1.0]])  # (T, B)
        masks = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])
        lambdas = jnp.asarray([1.0, 10.0])
        loss, metrics = elbo_terms(nll, kl, masks, lambdas, beta=0.5)
        # term0: recon = [1+30, 2+40] = [31, 42]; +0.5*0.5 each
        # term1: recon = [5, 6]; +0.5*1.0 each
        expected = np.mean([31.25 + 5.5, 42.25 + 6.5])
        np.testing.assert_allclose(loss, expected, rtol=2e-4)
        np.testing.assert_allclose(
            metrics["recon_per_term"], [36.5, 5.5], rtol=2e-4
        )
