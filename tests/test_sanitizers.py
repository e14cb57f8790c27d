"""Numerics/leak guards (SURVEY.md section 5, race-detection row):
the TPU-native analogue of sanitizers -- jax debug_nans and tracer-leak
checking over the full train step."""

import jax
import numpy as np
import pytest

from mmvae_tpu.data import load_dataset
from mmvae_tpu.models import MnistMVAE, CelebAMVAE
from mmvae_tpu.train import create_train_state, make_train_step


def test_step_clean_under_debug_nans():
    """A full multi-term step produces no NaN/Inf anywhere."""
    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=32, seed=0)
    state = create_train_state(model, ds.arrays, jax.random.key(0))
    with jax.debug_nans(True):
        step = make_train_step(model, annealing_steps=5)
        state, m = step(state, ds.arrays)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_celeba_19_expert_fusion_clean_under_debug_nans():
    """The deep 19-expert PoE stack (the numerically hairiest path:
    precision sums over 20 experts) stays finite."""
    model = CelebAMVAE(n_latents=8)
    ds = load_dataset("celeba", n=8, seed=0)
    state = create_train_state(model, ds.arrays, jax.random.key(0))
    with jax.debug_nans(True):
        step = make_train_step(model, n_random_subsets=4, annealing_steps=5)
        state, m = step(state, ds.arrays)
    assert np.isfinite(float(m["loss"]))


def test_no_tracer_leaks():
    """jax.checking_leaks over trace time of the full step."""
    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=16, seed=0)
    state = create_train_state(model, ds.arrays, jax.random.key(0))
    with jax.checking_leaks():
        step = make_train_step(model, annealing_steps=5)
        state, m = step(state, ds.arrays)
    assert np.isfinite(float(m["loss"]))


def test_extreme_inputs_stay_finite():
    """Saturated images / extreme logvars do not blow up the ELBO."""
    import jax.numpy as jnp

    model = MnistMVAE(n_latents=8)
    batch = {
        "image": jnp.ones((8, 28, 28)),  # fully saturated
        "label": jnp.full((8,), 9, jnp.int32),
    }
    state = create_train_state(model, batch, jax.random.key(0))
    step = make_train_step(model, annealing_steps=0)
    for _ in range(3):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
