"""Data-parallel step on 8 fake CPU devices (SURVEY.md section 4:
"distributed-without-a-cluster"): the pjit'd DP step must match the
single-device step up to reduction order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.data import load_dataset
from mmvae_tpu.models import MnistMVAE
from mmvae_tpu.parallel import make_mesh, replicate, shard_batch
from mmvae_tpu.train import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    """Returns a fresh-state factory: train steps donate their input
    state buffers, so each scenario needs its own state (identical by
    construction -- same model/rng/data)."""
    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)

    def fresh_state():
        return create_train_state(
            model, ds.arrays, jax.random.key(0), 1e-3
        )

    return model, ds.arrays, fresh_state


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def test_dp_matches_single_device(setup):
    model, batch, fresh_state = setup
    step = make_train_step(model, annealing_steps=10)

    # Single device.
    s1 = fresh_state()
    for _ in range(3):
        s1, m1 = step(s1, batch)

    # DP over the 8-device mesh.
    mesh = make_mesh()
    s8 = replicate(fresh_state(), mesh)
    sharded = shard_batch(batch, mesh)
    for _ in range(3):
        s8, m8 = step(s8, sharded)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-4
    )
    p1 = jax.tree.leaves(s1.params)
    p8 = jax.tree.leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_batch_sharding_layout(setup):
    model, batch, _fresh = setup
    mesh = make_mesh()
    sharded = shard_batch(batch, mesh)
    sh = sharded["image"].sharding
    assert sh.spec == jax.sharding.PartitionSpec("data")
    # 64 examples over 8 devices -> 8 per shard.
    shard_shapes = {
        s.data.shape for s in sharded["image"].addressable_shards
    }
    assert shard_shapes == {(8, 28, 28)}


def test_replicated_state_layout(setup):
    model, batch, fresh_state = setup
    mesh = make_mesh()
    rep = replicate(fresh_state(), mesh)
    leaf = jax.tree.leaves(rep.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_multislice_mesh_matches_single_device(setup):
    """2-D (dcn, data) mesh: hierarchical gradient reduction must still
    match the single-device step (SURVEY.md section 5, comms row)."""
    model, batch, fresh_state = setup
    step = make_train_step(model, annealing_steps=10)

    s1 = fresh_state()
    for _ in range(2):
        s1, m1 = step(s1, batch)

    mesh = make_mesh(n_slices=2)  # 2 fake slices x 4 chips
    assert mesh.axis_names == ("dcn", "data")
    s2 = replicate(fresh_state(), mesh)
    sharded = shard_batch(batch, mesh)
    # batch axis is sharded over both mesh axes (8-way total)
    assert len(sharded["image"].addressable_shards) == 8
    for _ in range(2):
        s2, m2 = step(s2, sharded)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )
