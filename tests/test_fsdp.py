"""FSDP (ZeRO-3 via GSPMD) on 8 fake CPU devices: sharded-state training
must match the single-device step, and the layouts must actually shard
(params + Adam moments over the mesh; scalars replicated)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mmvae_tpu.data import load_dataset
from mmvae_tpu.models import MnistMVAE
from mmvae_tpu.parallel import (
    fsdp_shard,
    fsdp_sharding,
    make_mesh,
    shard_batch,
    state_shardings,
)
from mmvae_tpu.train import (
    create_train_state,
    make_epoch_runner,
    make_train_step,
)


@pytest.fixture(scope="module")
def setup():
    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)

    def fresh_state():
        return create_train_state(
            model, ds.arrays, jax.random.key(0), 1e-3
        )

    return model, ds.arrays, fresh_state


def test_fsdp_sharding_rule():
    mesh = make_mesh()
    # Large array: the largest mesh-divisible dim gets the axis.
    assert fsdp_sharding(mesh, (784, 512)).spec == P("data", None)
    assert fsdp_sharding(mesh, (100, 512)).spec == P(None, "data")
    # Small arrays replicate regardless of divisibility.
    assert fsdp_sharding(mesh, (8,)).spec == P()
    # Indivisible dims replicate.
    assert fsdp_sharding(mesh, (999, 131)).spec == P()
    # Scalars replicate.
    assert fsdp_sharding(mesh, ()).spec == P()


def test_fsdp_state_layout(setup):
    model, batch, fresh_state = setup
    mesh = make_mesh()
    state = fsdp_shard(fresh_state(), mesh)
    # At least one param leaf is actually sharded 8 ways.
    sharded_leaves = [
        x
        for x in jax.tree.leaves(state.params)
        if not x.sharding.is_fully_replicated
    ]
    assert sharded_leaves, "no param leaf got sharded"
    x = max(sharded_leaves, key=lambda a: a.size)
    assert len(x.addressable_shards) == 8
    shard_elems = sum(s.data.size for s in x.addressable_shards)
    assert shard_elems == x.size  # partitioned, not replicated
    # Adam moments shard like their params (ZeRO: optimizer state too).
    opt_sharded = [
        y
        for y in jax.tree.leaves(state.opt_state)
        if hasattr(y, "sharding") and not y.sharding.is_fully_replicated
    ]
    assert opt_sharded
    # Scalars stay replicated.
    assert state.step.sharding.is_fully_replicated


def test_fsdp_matches_single_device(setup):
    model, batch, fresh_state = setup
    mesh = make_mesh()

    step = make_train_step(model, annealing_steps=10)
    s1 = fresh_state()
    for _ in range(3):
        s1, m1 = step(s1, batch)

    sf = fsdp_shard(fresh_state(), mesh)
    fstep = make_train_step(
        model,
        annealing_steps=10,
        out_state_shardings=state_shardings(sf),
    )
    sharded = shard_batch(batch, mesh)
    for _ in range(3):
        sf, mf = fstep(sf, sharded)

    np.testing.assert_allclose(
        float(m1["loss"]), float(mf["loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sf.params)):
        # atol covers reduction-order noise amplified by Adam's
        # rescaling of near-zero-gradient params (observed max ~6e-5
        # on 1/400k elements after 3 steps).
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )
    # The updated state kept its FSDP layout (out_shardings pinned it).
    big = [
        x
        for x in jax.tree.leaves(sf.params)
        if not x.sharding.is_fully_replicated
    ]
    assert big, "updated params lost their FSDP sharding"


def test_fsdp_epoch_runner_matches(setup):
    """The scan-fused epoch runner under FSDP matches the per-step path."""
    model, batch, fresh_state = setup
    mesh = make_mesh()
    n_steps = 2
    stacked = {
        k: jnp.stack([v] * n_steps) for k, v in batch.items()
    }

    s1 = fresh_state()
    step = make_train_step(model, annealing_steps=10)
    for _ in range(n_steps):
        s1, _ = step(s1, batch)

    sf = fsdp_shard(fresh_state(), mesh)
    runner = make_epoch_runner(
        model,
        annealing_steps=10,
        out_state_shardings=state_shardings(sf),
    )
    from jax.sharding import NamedSharding

    stacked_sh = NamedSharding(mesh, P(None, "data"))
    stacked = {
        k: jax.device_put(v, stacked_sh) for k, v in stacked.items()
    }
    sf, ms = runner(sf, stacked)

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sf.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


def test_fsdp_via_api_train(tmp_path, setup):
    """api.train(config.fsdp=True) runs end-to-end on the fake mesh."""
    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    config = get_config("mnist").replace(
        n_latents=8,
        epochs=1,
        train_size=64,
        test_size=32,
        batch_size=16,
        annealing_epochs=1,
        fsdp=True,
    )
    result = api.train(config, workdir=None, verbose=False)
    assert np.isfinite(result.best_test_elbo)


@pytest.mark.slow
def test_celeba_fsdp_layouts_and_parity():
    """Round-3 VERDICT weak #1 (FSDP side): the flagship's attr banks
    shard over the mesh under ZeRO-3, the step preserves the layout,
    and training matches the single-device step."""
    from mmvae_tpu.models import CelebAMVAE

    model = CelebAMVAE(
        n_latents=16, image_hw=(16, 16), conv_features=(8, 16)
    )
    ds = load_dataset("celeba", n=32, seed=0, gen_kwargs={"hw": 16})
    batch = dict(ds.arrays)

    def fresh():
        return create_train_state(model, batch, jax.random.key(0), 1e-3)

    step = make_train_step(model, annealing_steps=10)
    s1 = fresh()
    for _ in range(2):
        s1, m1 = step(s1, batch)

    mesh = make_mesh()
    sf = fsdp_shard(fresh(), mesh)
    sharded_leaves = [
        x
        for x in jax.tree.leaves(sf.params)
        if not x.sharding.is_fully_replicated
    ]
    assert sharded_leaves, "no CelebA param leaf got sharded"
    fstep = make_train_step(
        model,
        annealing_steps=10,
        out_state_shardings=state_shardings(sf),
    )
    sharded = shard_batch(batch, mesh)
    for _ in range(2):
        sf, mf = fstep(sf, sharded)

    np.testing.assert_allclose(
        float(m1["loss"]), float(mf["loss"]), rtol=2e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sf.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )
    assert [
        x
        for x in jax.tree.leaves(sf.params)
        if not x.sharding.is_fully_replicated
    ], "updated CelebA params lost their FSDP sharding"


def test_fsdp_step_never_gathers_activations(setup):
    """Round-3: FSDP with min_size=1 shards even decoder BIASES; GSPMD
    used to propagate the bias layout into the NLL and fully
    rematerialize the batch-sharded image target (the round-2 dryrun
    SPMD warning). The row constraint on the decode pass
    (train/step.py::_constrain_rows) pins the activations batch-sharded:
    the only all-gathers left are the ZeRO-3 param gathers -- none of
    them image-shaped."""
    model, batch, fresh_state = setup
    mesh = make_mesh()
    fstate = fsdp_shard(fresh_state(), mesh, min_size=1)
    fstep = make_train_step(
        model,
        n_random_subsets=2,
        annealing_steps=10,
        out_state_shardings=state_shardings(fstate),
    )
    sharded = shard_batch(batch, mesh)
    txt = fstep.lower(fstate, sharded).compile().as_text()
    import re

    # Match all-gather DEFINITIONS whose result is image-shaped (a
    # consumer fusion line also mentions the gathered operand -- that is
    # a legit (784,) bias gather feeding a fused add, not an offender).
    offenders = [
        line.strip()[:160]
        for line in txt.splitlines()
        if re.search(
            r"= \S*28,28\S* (all-gather|all-to-all)\(", line
        )
    ]
    assert not offenders, offenders
    assert " all-gather(" in txt  # ZeRO-3 param gathers do exist
