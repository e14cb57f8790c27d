"""IWAE marginal log-likelihood (core/iwae.py, api.log_likelihood):
estimator properties (monotone in k, deterministic under seed), the
k-fold batch fold matching a per-sample loop, and the full-split API."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.core import iwae_bound, product_of_experts
from mmvae_tpu.core.iwae import _diag_normal_logpdf
from mmvae_tpu.data import load_dataset
from mmvae_tpu.models import MnistMVAE
from mmvae_tpu.train import create_train_state


@pytest.fixture(scope="module")
def setup():
    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)
    state = create_train_state(
        model, ds.arrays, jax.random.key(0), 1e-3
    )
    return model, ds, state.params


def test_diag_normal_logpdf_matches_scipy():
    rng = np.random.default_rng(0)
    z = rng.normal(size=(5, 3)).astype(np.float32)
    mu = rng.normal(size=(5, 3)).astype(np.float32)
    logvar = rng.normal(size=(5, 3)).astype(np.float32) * 0.3
    got = np.asarray(_diag_normal_logpdf(z, mu, logvar))
    from scipy import stats

    want = stats.norm.logpdf(
        z, loc=mu, scale=np.exp(0.5 * logvar)
    ).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_iwae_matches_per_sample_loop(setup):
    """The k-fold batch trick must equal k independent single-sample
    evaluations combined by logsumexp (same eps draws)."""
    model, ds, params = setup
    batch = {k: v[:8] for k, v in ds.arrays.items()}
    rng = jax.random.key(7)
    k = 4
    got = np.asarray(iwae_bound(model, params, batch, rng, k=k))

    # Reference: explicit per-sample computation with identical draws.
    variables = {"params": params}
    mu_e, lv_e = model.apply(variables, batch, method="encode")
    mu, logvar = product_of_experts(mu_e, lv_e)
    # Same b-major eps draws as iwae_bound (B, k, L).
    eps = jax.random.normal(
        rng, (mu.shape[0], k) + mu.shape[1:], dtype=mu.dtype
    )
    log_ws = []
    for i in range(k):
        z = mu + jnp.exp(0.5 * logvar) * eps[:, i]
        recons = model.apply(variables, z, None, method="decode")
        nll = model.apply(variables, recons, batch, method="nll_all")
        log_p = -jnp.sum(nll.reshape(model.n_modalities, -1), axis=0)
        log_q = _diag_normal_logpdf(z, mu, logvar)
        log_prior = _diag_normal_logpdf(
            z, jnp.zeros_like(mu), jnp.zeros_like(logvar)
        )
        log_ws.append(log_p + log_prior - log_q)
    want = np.asarray(
        jax.scipy.special.logsumexp(jnp.stack(log_ws), axis=0)
        - jnp.log(float(k))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)


def test_iwae_monotone_in_k(setup):
    """E[IWAE_k] is non-decreasing in k; with 64 examples averaged the
    ordering is stable far beyond MC noise for k 1 -> 32."""
    model, ds, params = setup
    batch = ds.arrays
    rng = jax.random.key(0)
    ll1 = float(
        np.mean(np.asarray(iwae_bound(model, params, batch, rng, k=1)))
    )
    ll32 = float(
        np.mean(np.asarray(iwae_bound(model, params, batch, rng, k=32)))
    )
    assert ll32 >= ll1
    assert np.isfinite(ll1) and np.isfinite(ll32)


def test_iwae_deterministic_under_seed(setup):
    model, ds, params = setup
    batch = {k: v[:8] for k, v in ds.arrays.items()}
    a = np.asarray(
        iwae_bound(model, params, batch, jax.random.key(3), k=8)
    )
    b = np.asarray(
        iwae_bound(model, params, batch, jax.random.key(3), k=8)
    )
    np.testing.assert_array_equal(a, b)
    c = np.asarray(
        iwae_bound(model, params, batch, jax.random.key(4), k=8)
    )
    assert not np.array_equal(a, c)


def test_api_log_likelihood_covers_split(setup):
    """api.log_likelihood runs the padded full split; perturbing a
    remainder example must change the result (nothing is dropped)."""
    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config
    from mmvae_tpu.data.pipelines import Dataset

    model, ds, params = setup
    config = get_config("mnist").replace(n_latents=8, test_size=50)
    arrays = {k: np.asarray(v)[:50] for k, v in ds.arrays.items()}
    d50 = Dataset(
        arrays={k: jnp.asarray(v) for k, v in arrays.items()}, size=50
    )
    ll = api.log_likelihood(
        config, model=model, params=params, dataset=d50,
        batch_size=16, k=4,
    )
    assert np.isfinite(ll)
    # 50 % 16 = 2 remainder examples; perturb the last one.
    arrays2 = dict(arrays)
    arrays2["image"] = arrays["image"].copy()
    arrays2["image"][-1] = 1.0 - arrays2["image"][-1]
    d50b = Dataset(
        arrays={k: jnp.asarray(v) for k, v in arrays2.items()}, size=50
    )
    ll2 = api.log_likelihood(
        config, model=model, params=params, dataset=d50b,
        batch_size=16, k=4,
    )
    assert ll != ll2


@pytest.mark.slow
def test_iwae_seq_model():
    """Sequence modalities (teacher-forced decode) fold through the
    k-sample batch trick too (multimnist)."""
    from mmvae_tpu.models import MultiMnistMVAE

    model = MultiMnistMVAE(n_latents=16)
    ds = load_dataset("multimnist", n=16, seed=0)
    state = create_train_state(
        model, ds.arrays, jax.random.key(0), 1e-3
    )
    ll = iwae_bound(
        model, state.params, ds.arrays, jax.random.key(1), k=4
    )
    assert ll.shape == (16,)
    assert np.isfinite(np.asarray(ll)).all()
