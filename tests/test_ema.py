"""EMA (Polyak) parameter shadow: in-program update math, checkpoint
round trip, and the eval/sample preference for EMA weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.data import load_dataset
from mmvae_tpu.models import MnistMVAE
from mmvae_tpu.train import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=32, seed=0)
    return model, ds.arrays


def test_ema_update_math(setup):
    """One step: ema must equal d*init + (1-d)*params_after exactly."""
    model, batch = setup
    d = 0.9
    state = create_train_state(
        model, batch, jax.random.key(0), 1e-3, ema_decay=d
    )
    init = jax.tree.map(np.asarray, state.params)
    step = make_train_step(model, annealing_steps=5)
    state, _ = step(state, batch)
    leaves_p = jax.tree.leaves(state.params)
    leaves_e = jax.tree.leaves(state.ema_params)
    leaves_0 = jax.tree.leaves(init)
    for p, e, p0 in zip(leaves_p, leaves_e, leaves_0):
        np.testing.assert_allclose(
            np.asarray(e),
            d * np.asarray(p0) + (1 - d) * np.asarray(p),
            rtol=1e-5,
            atol=1e-7,
        )


def test_ema_off_by_default(setup):
    model, batch = setup
    state = create_train_state(model, batch, jax.random.key(0), 1e-3)
    assert state.ema_params is None
    step = make_train_step(model, annealing_steps=5)
    state, _ = step(state, batch)
    assert state.ema_params is None
    # eval_params falls back to live params.
    assert state.eval_params is state.params


def test_ema_checkpoint_roundtrip(setup, tmp_path):
    from mmvae_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    model, batch = setup
    state = create_train_state(
        model, batch, jax.random.key(0), 1e-3, ema_decay=0.99
    )
    step = make_train_step(model, annealing_steps=5)
    for _ in range(2):
        state, _ = step(state, batch)
    save_checkpoint(str(tmp_path), state, epoch=1)

    template = create_train_state(
        model, batch, jax.random.key(1), 1e-3, ema_decay=0.99
    )
    restored, _ = load_checkpoint(str(tmp_path), template, which="last")
    for a, b in zip(
        jax.tree.leaves(state.ema_params),
        jax.tree.leaves(restored.ema_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # EMA diverges from live params after steps (sanity).
    pa = jax.tree.leaves(restored.params)[0]
    ea = jax.tree.leaves(restored.ema_params)[0]
    assert not np.array_equal(np.asarray(pa), np.asarray(ea))


def test_ema_via_api(tmp_path, setup):
    """api.train(ema_decay) end to end; _load_params returns the EMA
    weights (the serving weights)."""
    from mmvae_tpu import api
    from mmvae_tpu.configs import build_model, get_config

    config = get_config("mnist").replace(
        n_latents=8, epochs=1, batch_size=16, train_size=32,
        test_size=16, annealing_epochs=1, ema_decay=0.95,
    )
    wd = str(tmp_path)
    result = api.train(config, wd, use_mesh=False, verbose=False)
    assert result.state.ema_params is not None
    assert np.isfinite(result.best_test_elbo)

    model = build_model(config)
    got = api._load_params(config, model, wd)
    want = jax.tree.leaves(result.state.ema_params)
    for a, b in zip(jax.tree.leaves(got), want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_toggle_across_checkpoints(setup, tmp_path):
    """Checkpoints restore across an ema_decay toggle: enabling EMA on
    resume seeds the shadow from the restored params; disabling drops
    the saved shadow (review finding: the conditional tree key used to
    crash the Orbax template match)."""
    from mmvae_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    model, batch = setup

    # Saved WITHOUT ema, restored WITH ema.
    s0 = create_train_state(model, batch, jax.random.key(0), 1e-3)
    step = make_train_step(model, annealing_steps=5)
    s0, _ = step(s0, batch)
    save_checkpoint(str(tmp_path / "a"), s0, epoch=1)
    tmpl = create_train_state(
        model, batch, jax.random.key(1), 1e-3, ema_decay=0.9
    )
    restored, _ = load_checkpoint(str(tmp_path / "a"), tmpl, "last")
    assert restored.ema_params is not None
    for a, b in zip(
        jax.tree.leaves(restored.ema_params),
        jax.tree.leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Saved WITH ema, restored WITHOUT.
    s1 = create_train_state(
        model, batch, jax.random.key(0), 1e-3, ema_decay=0.9
    )
    s1, _ = make_train_step(model, annealing_steps=5)(s1, batch)
    save_checkpoint(str(tmp_path / "b"), s1, epoch=1)
    tmpl2 = create_train_state(model, batch, jax.random.key(1), 1e-3)
    restored2, _ = load_checkpoint(str(tmp_path / "b"), tmpl2, "last")
    assert restored2.ema_params is None
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored2.params)[0]),
        np.asarray(jax.tree.leaves(s1.params)[0]),
    )
