"""Member-only decode pruning (``multi_term_loss(member_prune=...)``).

Under the mvae objective without cross_recon, each subset term
reconstructs only its OWN modalities, yet the decode-all pass ran every
decoder on every term row and multiplied non-member entries by zero —
unprunable by XLA because the mask matrix is traced (random-subset
rows). The pruned path decodes each decode key only on its
possibly-member rows (joint + own unimodal + every random row). These
tests pin exact loss/grad/metric parity against the decode-all pass,
the fold variants, presence composition, the CelebA flagship (where
the win is 24 -> 6 image-decoder rows), and that the compiled program
really does fewer FLOPs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.models import CelebAMVAE, MnistMVAE, MultiMnistMVAE
from mmvae_tpu.train.step import _member_prune_keys, multi_term_loss


@pytest.fixture(scope="module")
def mnist_setup():
    model = MnistMVAE(n_latents=8)
    B = 6
    batch = dict(model.dummy_batch(B))
    batch["image"] = jax.random.uniform(
        jax.random.key(1), batch["image"].shape
    )
    batch["label"] = jax.random.randint(
        jax.random.key(2), batch["label"].shape, 0, 10
    )
    params = model.init(jax.random.key(0), batch, sample=False)["params"]
    return model, params, batch


def test_member_rows_layout():
    model = MnistMVAE(n_latents=8)
    keys = _member_prune_keys(model, 2, 7)  # 3 static + 4 random terms
    assert keys["image"] == ([0, 1, 3, 4, 5, 6], [0])
    assert keys["label"] == ([0, 2, 3, 4, 5, 6], [1])
    cel = CelebAMVAE(n_latents=8)
    ck = _member_prune_keys(cel, 19, 24)
    assert ck["image"][0] == [0, 1, 20, 21, 22, 23]  # 6 of 24 rows
    assert ck["attrs"][0] == [0] + list(range(2, 20)) + [20, 21, 22, 23]
    assert ck["attrs"][1] == list(range(1, 19))


@pytest.mark.parametrize("fold", ["t", "b"])
@pytest.mark.parametrize("k_random", [0, 3])
def test_prune_parity_loss_and_metrics(mnist_setup, fold, k_random):
    model, params, batch = mnist_setup
    rng = jax.random.key(3)
    a, ma = multi_term_loss(
        model, params, batch, rng, 0.7, term_fold=fold,
        n_random_subsets=k_random, member_prune=True, sample=True,
    )
    b, mb = multi_term_loss(
        model, params, batch, rng, 0.7, term_fold=fold,
        n_random_subsets=k_random, member_prune=False, sample=True,
    )
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
    for key in ("recon_per_term", "kl_per_term"):
        np.testing.assert_allclose(
            np.asarray(ma[key]), np.asarray(mb[key]), rtol=1e-5
        )


def test_prune_parity_grads(mnist_setup):
    model, params, batch = mnist_setup
    rng = jax.random.key(4)

    def loss(p, prune):
        return multi_term_loss(
            model, p, batch, rng, 0.9, term_fold="b",
            n_random_subsets=2, member_prune=prune, sample=True,
        )[0]

    ga = jax.grad(lambda p: loss(p, True))(params)
    gb = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7
        )


def test_prune_parity_with_presence(mnist_setup):
    model, params, batch = mnist_setup
    B = jax.tree.leaves(batch)[0].shape[0]
    pres = np.ones((B, 2), np.float32)
    pres[0, 1] = 0.0
    pres[3, 0] = 0.0
    batch = dict(batch, presence=jnp.asarray(pres))
    rng = jax.random.key(5)
    a, _ = multi_term_loss(
        model, params, batch, rng, 1.0, term_fold="t",
        member_prune=True, sample=False,
    )
    b, _ = multi_term_loss(
        model, params, batch, rng, 1.0, term_fold="t",
        member_prune=False, sample=False,
    )
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_prune_inactive_under_cross_recon_and_mixtures(mnist_setup):
    """cross_recon / mixture / mvtcae paths decode every modality from
    every term by construction -- member_prune must be a no-op there
    (same loss with the flag on or off)."""
    model, params, batch = mnist_setup
    rng = jax.random.key(6)
    for kw in (
        dict(cross_recon=True),
        dict(objective="mmvae"),
        dict(objective="mvtcae"),
    ):
        a, _ = multi_term_loss(
            model, params, batch, rng, 1.0, term_fold="t",
            member_prune=True, sample=False, **kw,
        )
        b, _ = multi_term_loss(
            model, params, batch, rng, 1.0, term_fold="t",
            member_prune=False, sample=False, **kw,
        )
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_prune_parity_seq_model():
    """MultiMNIST: the seq decoder's teacher-forcing inputs must tile
    to the pruned row count; parity incl. the cycle term (which decodes
    separately and is untouched by pruning)."""
    from mmvae_tpu.data import load_dataset

    model = MultiMnistMVAE(
        n_latents=8, conv_features=(4, 8), text_embed=8, text_hidden=16
    )
    ds = load_dataset("multimnist", n=8, seed=0)
    params = model.init(
        jax.random.key(0), ds.arrays, sample=False
    )["params"]
    rng = jax.random.key(7)
    for fold in ("t", "b"):
        a, _ = multi_term_loss(
            model, params, ds.arrays, rng, 0.5, term_fold=fold,
            cycle_weight=1.0, member_prune=True, sample=False,
        )
        b, _ = multi_term_loss(
            model, params, ds.arrays, rng, 0.5, term_fold=fold,
            cycle_weight=1.0, member_prune=False, sample=False,
        )
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_prune_parity_celeba_flagship():
    """Tiny-hw CelebA: 19 modalities, random subsets -- the config the
    optimization exists for (image decoder 24 -> 6 term rows)."""
    model = CelebAMVAE(
        n_latents=8, image_hw=(8, 8), conv_features=(4, 8)
    )
    batch = dict(model.dummy_batch(4))
    batch["image"] = jax.random.uniform(
        jax.random.key(1), batch["image"].shape
    )
    batch["attrs"] = (
        jax.random.uniform(jax.random.key(2), batch["attrs"].shape)
        > 0.5
    ).astype(jnp.float32)
    params = model.init(jax.random.key(0), batch, sample=False)["params"]
    rng = jax.random.key(8)
    a, _ = multi_term_loss(
        model, params, batch, rng, 0.6, term_fold="b",
        n_random_subsets=4, member_prune=True, sample=True,
    )
    b, _ = multi_term_loss(
        model, params, batch, rng, 0.6, term_fold="b",
        n_random_subsets=4, member_prune=False, sample=True,
    )
    np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_prune_reduces_compiled_flops():
    """The pruned program must do strictly fewer FLOPs (that is the
    whole point); assert via XLA cost analysis on the lowered step."""
    model = CelebAMVAE(
        n_latents=8, image_hw=(8, 8), conv_features=(4, 8)
    )
    batch = model.dummy_batch(4)
    params = model.init(jax.random.key(0), batch, sample=False)["params"]

    def flops(prune):
        def f(p):
            return multi_term_loss(
                model, p, batch, jax.random.key(1), 0.5,
                term_fold="b", n_random_subsets=4,
                member_prune=prune, sample=True,
            )[0]

        c = jax.jit(f).lower(params).compile().cost_analysis()
        c = c[0] if isinstance(c, list) else c
        return c["flops"]

    pruned, full = flops(True), flops(False)
    assert pruned < 0.55 * full, (pruned, full)


def test_prune_mesh_st_parity():
    """The shard_map "st" fold's pruned local pass matches the
    single-device pruned "b" result on the 8-fake-device mesh."""
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.parallel import make_mesh, replicate, shard_batch
    from mmvae_tpu.train import create_train_state, make_train_step

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)
    step = make_train_step(model, annealing_steps=10, member_prune=True)
    s1 = create_train_state(model, ds.arrays, jax.random.key(0), 1e-3)
    for _ in range(2):
        s1, m1 = step(s1, ds.arrays)

    mesh = make_mesh()
    s8 = replicate(
        create_train_state(model, ds.arrays, jax.random.key(0), 1e-3),
        mesh,
    )
    sharded = shard_batch(ds.arrays, mesh)
    for _ in range(2):
        s8, m8 = step(s8, sharded)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4
        )
