"""Fast-path API smoke: one tiny end-to-end train/eval/sample/generate.

The full API surface is covered by tests/test_api.py (marked slow --
~90s of CPU compiles); this keeps a single end-to-end flow in the
default ``-m "not slow"`` loop so an API regression can't hide behind
the marker split.
"""

import numpy as np

from mmvae_tpu import api
from mmvae_tpu.configs import get_config


def test_api_end_to_end_smoke(tmp_path):
    cfg = get_config("mnist").replace(
        n_latents=8, epochs=1, batch_size=32, train_size=64, test_size=32,
        annealing_epochs=1,
    )
    workdir = str(tmp_path)
    result = api.train(cfg, workdir, use_mesh=False, verbose=False)
    assert np.isfinite(result.best_test_elbo)
    elbo = api.eval_elbo(cfg, workdir=workdir)
    assert np.isfinite(elbo)
    out = api.sample(cfg, n=2, workdir=workdir)
    assert out["image"].shape == (2, 28, 28)
    gen = api.generate(cfg, {"label": np.asarray([3])}, workdir=workdir)
    assert gen["image"].shape == (1, 28, 28)


def test_data_dtype_bfloat16_trains(tmp_path):
    """config.data_dtype='bfloat16' (bf16-resident training data; the
    2.3x HBM-bandwidth knob, DESIGN.md section 10) trains end to end and
    lands within noise of the f32-data run."""
    import jax.numpy as jnp

    base = get_config("mnist").replace(
        n_latents=8, epochs=1, batch_size=32, train_size=64,
        test_size=32, annealing_epochs=1,
    )
    r32 = api.train(base, None, use_mesh=False, verbose=False,
                    dtype=jnp.bfloat16)
    rb16 = api.train(
        base.replace(data_dtype="bfloat16"), None, use_mesh=False,
        verbose=False, dtype=jnp.bfloat16,
    )
    assert np.isfinite(rb16.best_test_elbo)
    # Same data, bf16-rounded targets: trajectories agree within noise.
    np.testing.assert_allclose(
        rb16.best_test_elbo, r32.best_test_elbo, rtol=0.02
    )


def test_cosine_lr_schedule_trains_and_reloads(tmp_path):
    """lr_schedule='cosine': trains, the schedule actually decays, and
    the checkpoint reloads (the schedule changes the Adam pytree, so
    load must rebuild the same transform)."""
    from mmvae_tpu.api import _learning_rate

    cfg = get_config("mnist").replace(
        n_latents=8, epochs=2, batch_size=16, train_size=64,
        test_size=32, annealing_epochs=1,
        lr_schedule="cosine", warmup_epochs=1,
    )
    sched = _learning_rate(cfg)
    steps = cfg.train_size // cfg.batch_size
    assert float(sched(0)) < float(sched(steps))  # warming up
    assert float(sched(cfg.epochs * steps)) < float(sched(steps))  # decayed

    wd = str(tmp_path)
    result = api.train(cfg, wd, use_mesh=False, verbose=False)
    assert np.isfinite(result.best_test_elbo)
    # Reload through the checkpoint path (same opt pytree required).
    elbo = api.eval_elbo(cfg, workdir=wd)
    assert np.isfinite(elbo)
    out = api.sample(cfg, n=2, workdir=wd)
    assert out["image"].shape == (2, 28, 28)


def test_accum_steps_via_api(tmp_path):
    """config.accum_steps trains end to end and reloads (MultiSteps
    changes the opt-state pytree; templates must match)."""
    cfg = get_config("mnist").replace(
        n_latents=8, epochs=1, batch_size=16, train_size=64,
        test_size=32, annealing_epochs=1, accum_steps=2,
    )
    wd = str(tmp_path)
    result = api.train(cfg, wd, use_mesh=False, verbose=False)
    assert np.isfinite(result.best_test_elbo)
    assert np.isfinite(api.eval_elbo(cfg, workdir=wd))


def test_lr_schedule_in_optimizer_update_units():
    """With accum_steps=k, optax.MultiSteps advances the inner schedule
    once per k micro-batches; the cosine horizon must be expressed in
    optimizer-update units or warmup takes k x longer and decay covers
    1/k of the run (round-2 ADVICE.md medium finding)."""
    from mmvae_tpu.api import _learning_rate

    cfg = get_config("mnist").replace(
        n_latents=8, epochs=2, batch_size=16, train_size=64,
        lr_schedule="cosine", warmup_epochs=1, accum_steps=2,
    )
    sched = _learning_rate(cfg)  # 4 micro-steps/epoch -> 2 updates/epoch
    # Warmup ends at update 2; decay completes at update 4.
    np.testing.assert_allclose(
        float(sched(2)), cfg.learning_rate, rtol=1e-6
    )
    assert float(sched(4)) < 1e-8


def test_lr_schedule_horizon_uses_actual_dataset_size():
    """The schedule horizon follows the ACTUAL steps per epoch (the
    loaded dataset can be smaller than config.train_size on real-data
    mounts -- round-2 ADVICE.md finding)."""
    from mmvae_tpu.api import _learning_rate

    cfg = get_config("mnist").replace(
        batch_size=16, train_size=10_000, epochs=2,
        lr_schedule="cosine", warmup_epochs=0,
    )
    sched = _learning_rate(cfg, steps_per_epoch=4)  # actual, not 625
    assert float(sched(8)) < 1e-8  # decayed over the real horizon


def test_ema_updates_only_on_accum_commit():
    """Under accum_steps=k the EMA must blend once per real optimizer
    update, not once per micro-batch (effective decay would silently
    become d^k -- round-2 ADVICE.md finding)."""
    import jax
    import jax.numpy as jnp

    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import create_train_state

    model = MnistMVAE(n_latents=8)
    state = create_train_state(
        model, model.dummy_batch(2), jax.random.key(0), 1e-2,
        ema_decay=0.5, accum_steps=2,
    )
    g = jax.tree.map(jnp.ones_like, state.params)
    ema0 = jax.tree.leaves(state.ema_params)[0].copy()
    s1 = state.apply_gradients(g, state.rng)
    # Micro-step 1 of 2: params frozen, EMA must be untouched.
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(s1.ema_params)[0]), np.asarray(ema0)
    )
    s2 = s1.apply_gradients(g, s1.rng)
    # Commit: params moved, EMA blended exactly once.
    p2 = jax.tree.leaves(s2.params)[0]
    e2 = jax.tree.leaves(s2.ema_params)[0]
    np.testing.assert_allclose(
        np.asarray(e2),
        0.5 * np.asarray(ema0) + 0.5 * np.asarray(p2),
        rtol=1e-6,
    )


def test_corrupt_checkpoint_fails_loudly(tmp_path):
    """A genuinely corrupt checkpoint must surface the original restore
    error, not be masked by the EMA-toggle template retry (round-2
    VERDICT weak #3 / ADVICE.md)."""
    import os

    import jax
    import pytest

    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import create_train_state
    from mmvae_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    model = MnistMVAE(n_latents=8)
    state = create_train_state(
        model, model.dummy_batch(2), jax.random.key(0), 1e-3
    )
    save_checkpoint(str(tmp_path), state, 1)
    from mmvae_tpu.train.checkpoint import _resolve_ckpt_path

    last = _resolve_ckpt_path(str(tmp_path / "ckpt"), "last")
    for root, _dirs, files in os.walk(last):
        for name in files:
            p = os.path.join(root, name)
            if os.path.getsize(p) > 0:
                with open(p, "wb") as fh:
                    fh.write(b"corrupt")
    with pytest.raises(Exception):
        load_checkpoint(str(tmp_path), state, which="last")


def test_runner_caches_are_bounded():
    """The eval/IWAE runner memo caches evict FIFO past the cap
    (round-2 VERDICT weak #8: a long-lived notebook over many configs
    would otherwise leak one compiled program per config forever)."""
    from mmvae_tpu import api

    cache = {}
    made = []
    for i in range(api._RUNNER_CACHE_MAX + 5):
        r = api._memo_runner(cache, i, lambda i=i: made.append(i) or (lambda: i))
        assert r() == i
    assert len(cache) == api._RUNNER_CACHE_MAX
    assert 0 not in cache and 4 not in cache  # oldest evicted
    # Cached key returns the same runner without rebuilding.
    n = len(made)
    r = api._memo_runner(cache, api._RUNNER_CACHE_MAX + 4, lambda: 1 / 0)
    assert len(made) == n
    # Unhashable key -> fresh runner, no crash.
    assert api._memo_runner(cache, {}, lambda: (lambda: "fresh"))() == "fresh"


def test_block_shuffle_mode_matches_roll_on_shuffle_epochs():
    """shuffle_mode='block' (zero-copy between-reshuffle epochs): the
    true-shuffle epoch is bit-identical to roll mode (same permutation,
    identity read order), block epochs leave the donated arrays
    untouched, and training stays finite."""
    import jax
    import jax.numpy as jnp

    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import (
        create_train_state,
        make_gather_epoch_runner,
    )

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)

    def fresh(arrays):
        return create_train_state(
            model, {k: v[:16] for k, v in arrays.items()},
            jax.random.key(0), 1e-3,
        )

    results = {}
    for mode in ("roll", "block"):
        runner = make_gather_epoch_runner(
            model, 4, 16, annealing_steps=10,
            reshuffle_every=4, shuffle_mode=mode,
        )
        arrs = {k: jnp.array(v) for k, v in ds.arrays.items()}
        state = fresh(arrs)
        losses, snaps = [], []
        for ep in range(3):
            state, arrs, ms = runner(state, arrs, ep == 0)
            losses.append(np.asarray(ms["loss"]))
            snaps.append(np.asarray(arrs["image"]).copy())
        results[mode] = (losses, snaps)

    # Epoch 1 is a true shuffle in both modes -> identical losses.
    np.testing.assert_allclose(
        results["roll"][0][0], results["block"][0][0], rtol=1e-6
    )
    # Block epochs 2-3 leave the arrays untouched (roll mode rotates).
    np.testing.assert_array_equal(
        results["block"][1][0], results["block"][1][2]
    )
    assert not np.array_equal(
        results["roll"][1][0], results["roll"][1][2]
    )
    for losses, _ in results.values():
        assert np.isfinite(np.concatenate(losses)).all()


def test_shuffle_mode_validation():
    """block composes with the mesh (round-3 follow-up: the builder
    accepts n_shards>1; full parity is pinned in tests/test_dp.py);
    unknown modes still fail fast."""
    import pytest as _pytest

    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import make_gather_epoch_runner

    make_gather_epoch_runner(
        MnistMVAE(n_latents=8), 4, 16, reshuffle_every=4,
        n_shards=8, shuffle_mode="block",
    )
    with _pytest.raises(ValueError, match="unknown shuffle_mode"):
        make_gather_epoch_runner(
            MnistMVAE(n_latents=8), 4, 16, shuffle_mode="zigzag"
        )


def test_term_fold_orders_agree():
    """The t-major (single-device fast) and b-major (sharding-safe)
    term folds are the same math -- with z = mu (sample=False) loss and
    every metric must agree exactly on identical inputs, with and
    without presence masks / cross-recon. (With sampling the eps draw
    layouts differ -- same distribution, different per-draw values, like
    a different seed.)"""
    import jax

    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import create_train_state, multi_term_loss

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=16, seed=0)
    batch = dict(ds.arrays)
    state = create_train_state(model, batch, jax.random.key(0), 1e-3)
    presence = (
        np.random.default_rng(0)
        .random((16, model.n_modalities))
        .astype(np.float32)
        > 0.3
    ).astype(np.float32)
    presence[0] = 1.0  # at least one fully-observed row

    for extra in (
        {},
        {"cross_recon": True, "n_random_subsets": 2},
    ):
        for with_presence in (False, True):
            b = dict(batch)
            if with_presence:
                b["presence"] = presence
            outs = {}
            for fold in ("t", "b"):
                loss, metrics = multi_term_loss(
                    model, state.params, b, jax.random.key(3), 0.7,
                    term_fold=fold, sample=False, **extra,
                )
                outs[fold] = (float(loss), metrics)
            np.testing.assert_allclose(
                outs["t"][0], outs["b"][0], rtol=1e-5
            )
            for k in outs["t"][1]:
                np.testing.assert_allclose(
                    np.asarray(outs["t"][1][k]),
                    np.asarray(outs["b"][1][k]),
                    rtol=1e-4,
                    atol=1e-5,
                    err_msg=k,
                )


def test_data_dtype_uint8_trains(tmp_path):
    """config.data_dtype='uint8' (uint8-resident training data; quarter
    the f32 HBM bytes, exact for 8-bit-native real data) trains end to
    end through api.train and lands within noise of the f32 run."""
    base = get_config("mnist").replace(
        n_latents=8, epochs=1, batch_size=32, train_size=64,
        test_size=32, annealing_epochs=1,
    )
    r32 = api.train(base, None, use_mesh=False, verbose=False)
    ru8 = api.train(
        base.replace(data_dtype="uint8"), None, use_mesh=False,
        verbose=False,
    )
    assert np.isfinite(ru8.best_test_elbo)
    # Same data on the 1/255 grid: trajectories agree within noise.
    np.testing.assert_allclose(
        ru8.best_test_elbo, r32.best_test_elbo, rtol=0.02
    )
