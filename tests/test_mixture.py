"""MMVAE / MoPoE mixture objectives (core/mixture.py + the
``objective`` knob in train/step.py).

The mixture family reuses the framework's static mask-matrix program:
component masks are just term masks, the mixture average is a term
weighting, and inference PoE-fuses each component against the observed
set. These tests pin the math against naive per-component oracles and
the fold/mesh parity contracts the mvae objective already carries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.core.elbo import kl_std_normal
from mmvae_tpu.core.mixture import (
    component_masks,
    fuse_observed_z,
    mixture_z,
    posterior_components,
)
from mmvae_tpu.core.poe import product_of_experts
from mmvae_tpu.core.sampling import reparameterize
from mmvae_tpu.models import MnistMVAE
from mmvae_tpu.train.step import multi_term_loss


# ---------------------------------------------------------------- masks


def test_mmvae_component_masks_are_identity():
    m = np.asarray(component_masks("mmvae", 4))
    np.testing.assert_array_equal(m, np.eye(4, dtype=np.float32))


def test_mopoe_component_masks_full_powerset():
    m = np.asarray(component_masks("mopoe", 3))
    assert m.shape == (7, 3)
    rows = {tuple(int(x) for x in r) for r in m}
    assert len(rows) == 7  # all distinct
    assert (0, 0, 0) not in rows  # nonempty only
    # Singleton {i} sits at row 2^i - 1 (the cycle path's static index).
    for i in range(3):
        expect = tuple(1 if j == i else 0 for j in range(3))
        assert tuple(int(x) for x in m[2**i - 1]) == expect


def test_mopoe_fallback_past_powerset_max():
    # 9 modalities: 2^9-1 = 511 subset terms is past the compiled-term
    # budget; the family degrades to {joint} + {unimodal}.
    m = np.asarray(component_masks("mopoe", 9))
    assert m.shape == (10, 9)
    np.testing.assert_array_equal(m[0], np.ones(9, np.float32))
    np.testing.assert_array_equal(m[1:], np.eye(9, dtype=np.float32))


def test_mvae_has_no_component_masks():
    with pytest.raises(ValueError):
        component_masks("mvae", 3)


def test_mopoe_multiplicity_identity():
    """Fusing the full powerset with an observed mask O maps onto the
    powerset of O with CONSTANT multiplicity 2^(M-|O|) -- the identity
    that makes uniform-over-valid-rows equal uniform-over-subsets-of-O
    (core/mixture.py module docstring)."""
    M = 4
    comp = np.asarray(component_masks("mopoe", M))  # (15, 4)
    observed = np.asarray([1.0, 0.0, 1.0, 1.0], np.float32)  # |O| = 3
    eff = comp * observed[None]
    counts = {}
    for row in eff:
        key = tuple(int(x) for x in row)
        counts[key] = counts.get(key, 0) + 1
    empty = counts.pop((0, 0, 0, 0), 0)
    # Every nonempty subset of O appears exactly 2^(4-3) = 2 times.
    assert set(counts.values()) == {2}
    assert len(counts) == 2**3 - 1
    assert empty == 15 - 2 * 7


# ------------------------------------------------------ inference side


def _expert_stats(key, batch=5, n_mod=3, lat=6):
    k1, k2 = jax.random.split(jax.random.key(key))
    mu = jax.random.normal(k1, (batch, n_mod, lat))
    lv = jax.random.normal(k2, (batch, n_mod, lat)) * 0.3
    return mu, lv


def test_posterior_components_match_manual_poe():
    mu_e, lv_e = _expert_stats(0)
    comp = component_masks("mopoe", 3)
    mu_c, lv_c, w = posterior_components(mu_e, lv_e, None, comp)
    assert mu_c.shape == (5, 7, 6) and w.shape == (5, 7)
    np.testing.assert_array_equal(np.asarray(w), 1.0)
    for k in range(7):
        mask = jnp.broadcast_to(comp[k][None], (5, 3))
        mu_k, lv_k = product_of_experts(mu_e, lv_e, mask=mask)
        np.testing.assert_allclose(
            np.asarray(mu_c[:, k]), np.asarray(mu_k), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(lv_c[:, k]), np.asarray(lv_k), rtol=1e-6
        )


def test_posterior_components_presence_invalidates():
    mu_e, lv_e = _expert_stats(1)
    presence = jnp.asarray(
        [[1, 1, 1], [1, 0, 0], [0, 0, 0], [0, 1, 1], [1, 1, 0]],
        jnp.float32,
    )
    comp = component_masks("mmvae", 3)
    mu_c, lv_c, w = posterior_components(mu_e, lv_e, presence, comp)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(presence))
    # Invalid components ARE the prior (masked PoE with nothing in it).
    np.testing.assert_allclose(np.asarray(mu_c[2]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(lv_c[2]), 0.0, atol=1e-7)


def test_mixture_z_deterministic_mean():
    mu_e, lv_e = _expert_stats(2)
    comp = component_masks("mmvae", 3)
    presence = jnp.asarray(np.ones((5, 3), np.float32))
    presence = presence.at[0, 1:].set(0.0)  # row 0: only expert 0
    mu_c, lv_c, w = posterior_components(mu_e, lv_e, presence, comp)
    z = mixture_z(jax.random.key(0), mu_c, lv_c, w, sample=False)
    np.testing.assert_allclose(
        np.asarray(z[1:]), np.asarray(jnp.mean(mu_c[1:], axis=-2)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(z[0]), np.asarray(mu_c[0, 0]), rtol=1e-6
    )
    # Nothing observed -> the prior mean (0), not NaN.
    z0 = mixture_z(
        jax.random.key(0), mu_c, lv_c, jnp.zeros_like(w), sample=False
    )
    np.testing.assert_allclose(np.asarray(z0), 0.0, atol=1e-7)


def test_mixture_z_single_valid_component_sample():
    """With exactly one valid component the mixture draw IS that
    component's reparameterized sample (same key discipline)."""
    mu_e, lv_e = _expert_stats(3)
    comp = component_masks("mmvae", 3)
    presence = jnp.zeros((5, 3)).at[:, 1].set(1.0)
    mu_c, lv_c, w = posterior_components(mu_e, lv_e, presence, comp)
    rng = jax.random.key(7)
    z = mixture_z(rng, mu_c, lv_c, w, sample=True)
    _, z_rng = jax.random.split(rng)
    want = reparameterize(z_rng, mu_c[:, 1], lv_c[:, 1], sample=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(want), rtol=1e-6)


def test_fuse_observed_z_mvae_bitwise_legacy():
    """objective="mvae" must be bit-identical to the historical
    generate path: PoE of observed experts + prior, reparameterized."""
    mu_e, lv_e = _expert_stats(4)
    presence = jnp.asarray(
        (np.random.default_rng(0).random((5, 3)) > 0.4).astype(
            np.float32
        )
    )
    rng = jax.random.key(3)
    z = fuse_observed_z(rng, mu_e, lv_e, presence, "mvae", sample=True)
    mu, lv = product_of_experts(mu_e, lv_e, mask=presence)
    want = reparameterize(rng, mu, lv, sample=True)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(want))


# ------------------------------------------------------- training side


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


def _component_oracle(model, params, batch, comp, presence, beta):
    """Naive per-component mixture loss: mean over valid components of
    [sum_n lambda_n NLL_n(dec(mean_k)) + beta KL_k], z = component mean
    (the sample=False convention)."""
    variables = {"params": params}
    data = {k: v for k, v in batch.items() if k != "presence"}
    mu_e, lv_e = model.apply(variables, data, method="encode")
    B = mu_e.shape[0]
    lams = model.lambdas()
    comp = np.asarray(comp)
    pres = (
        np.ones((B, comp.shape[1]), np.float32)
        if presence is None
        else np.asarray(presence)
    )
    total = np.zeros((B,), np.float64)
    n_valid = np.zeros((B,), np.float64)
    per_comp = []
    for k in range(comp.shape[0]):
        eff = jnp.asarray(comp[k][None] * pres)
        mu_k, lv_k = product_of_experts(mu_e, lv_e, mask=eff)
        recons = model.apply(variables, mu_k, data, method="decode")
        nll = np.asarray(
            model.apply(variables, recons, data, method="nll_all")
        )  # (M, B)
        nll = nll * pres.T  # unobserved modalities are not targets
        term = np.asarray(lams)[:, None] * nll
        val = term.sum(0) + beta * np.asarray(kl_std_normal(mu_k, lv_k))
        valid = (np.asarray(eff).sum(-1) > 0).astype(np.float64)
        per_comp.append(val * valid)
        n_valid += valid
    for v in per_comp:
        total += v / np.maximum(n_valid, 1.0)
    return float(total.mean())


@pytest.mark.parametrize("objective", ["mmvae", "mopoe"])
def test_mixture_loss_matches_component_oracle(mnist_setup, objective):
    model, params, batch = mnist_setup
    comp = component_masks(objective, model.n_modalities)
    beta = 0.7
    want = _component_oracle(model, params, batch, comp, None, beta)
    got, _ = multi_term_loss(
        model, params, batch, jax.random.key(3), beta,
        sample=False, objective=objective, term_fold="t",
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


@pytest.mark.parametrize("objective", ["mmvae", "mopoe"])
def test_mixture_loss_presence_oracle(mnist_setup, objective):
    """Per-example modality dropout: dropped components leave the
    average (weight renormalizes over the VALID components)."""
    model, params, batch = mnist_setup
    B = jax.tree.leaves(batch)[0].shape[0]
    pres = np.ones((B, 2), np.float32)
    pres[0, 1] = 0.0
    pres[3, 0] = 0.0
    comp = component_masks(objective, model.n_modalities)
    beta = 0.9
    want = _component_oracle(model, params, batch, comp, pres, beta)
    got, _ = multi_term_loss(
        model, params, dict(batch, presence=jnp.asarray(pres)),
        jax.random.key(3), beta,
        sample=False, objective=objective, term_fold="t",
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


@pytest.mark.parametrize("objective", ["mmvae", "mopoe"])
def test_mixture_fold_parity(mnist_setup, objective):
    """t-major, b-major and shard-local-t-major folds agree on the
    mixture loss and grads (same contract the mvae objective carries:
    t vs b with z = mu -- the sampled eps layouts differ by design;
    b vs st even sampled -- z is computed globally in both)."""
    from mmvae_tpu.parallel import make_mesh

    model, params, batch = mnist_setup
    rng = jax.random.key(11)

    def loss_of(fold, mesh_arg):
        def f(p):
            return multi_term_loss(
                model, p, batch, rng, 0.8, sample=False,
                objective=objective, term_fold=fold, mesh=mesh_arg,
            )[0]

        loss, grads = jax.jit(jax.value_and_grad(f))(params)
        return float(loss), grads

    lt, gt = loss_of("t", None)
    lb, gb = loss_of("b", None)
    np.testing.assert_allclose(lt, lb, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gt), jax.tree.leaves(gb)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    # st fold needs the batch to divide over the mesh: 6 rows don't --
    # tile the batch to 8 rows via a fresh 8-row batch instead.
    model8, params8, _ = mnist_setup
    batch8 = dict(model.dummy_batch(8))
    batch8["image"] = jax.random.uniform(
        jax.random.key(5), batch8["image"].shape
    )
    batch8["label"] = jax.random.randint(
        jax.random.key(6), batch8["label"].shape, 0, 10
    )
    mesh = make_mesh()

    def loss8(fold, mesh_arg):
        def f(p):
            return multi_term_loss(
                model8, p, batch8, rng, 0.8, sample=True,
                objective=objective, term_fold=fold, mesh=mesh_arg,
            )[0]

        return float(jax.jit(f)(params8))

    np.testing.assert_allclose(
        loss8("b", None), loss8("st", mesh), rtol=1e-5
    )


def test_mixture_rejects_mvae_term_knobs(mnist_setup):
    model, params, batch = mnist_setup
    for kw in (
        dict(n_random_subsets=2),
        dict(cross_recon=True),
        dict(cross_recon_stopgrad=True),
        dict(unimodal_align_weight=0.5),
    ):
        with pytest.raises(ValueError):
            multi_term_loss(
                model, params, batch, jax.random.key(0), 1.0,
                sample=False, objective="mmvae", **kw,
            )
    with pytest.raises(ValueError):
        multi_term_loss(
            model, params, batch, jax.random.key(0), 1.0,
            sample=False, objective="banana",
        )


def test_mixture_dp_matches_single_device():
    """The mopoe step under the 8-fake-device DP mesh matches the
    single-device step (same contract tests/test_dp.py pins for mvae:
    the term weighting is per-example, so sharding the batch axis
    changes nothing but the reduction order)."""
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.parallel import make_mesh, replicate, shard_batch
    from mmvae_tpu.train import create_train_state, make_train_step

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)
    step = make_train_step(
        model, annealing_steps=10, objective="mopoe"
    )
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
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        # atol 5e-4: the psum's reduction order can flip Adam's
        # normalized direction on near-zero-grad params in the first
        # steps (observed: 1 element of 400k at 1.9e-4 after 2 steps).
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4
        )


# --------------------------------------------------------- end to end


@pytest.mark.slow
@pytest.mark.parametrize("objective", ["mmvae", "mopoe"])
def test_train_eval_generate_roundtrip(tmp_path, objective):
    """api.train/eval_elbo/generate on the mixture objectives: loss
    falls, the eval metric matches train-time best exactly (same
    objective on both sides), and generation draws from the mixture."""
    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    cfg = get_config("mnist").replace(
        n_latents=8, batch_size=16, train_size=128, test_size=48,
        epochs=2, objective=objective,
    )
    result = api.train(cfg, seed=0, workdir=str(tmp_path))
    losses = [h["train_loss"] for h in result.history]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    ev = api.eval_elbo(cfg, model=result.model,
                       params=result.state.params)
    assert np.isfinite(ev)
    # eval_elbo re-runs the train loop's own evaluator on the final
    # params: it must reproduce the last epoch's test metric exactly
    # (same objective on both sides).
    np.testing.assert_allclose(
        ev, result.history[-1]["test_elbo"], rtol=1e-5
    )

    out = api.generate(
        cfg, {"label": np.asarray([1, 2, 3])},
        model=result.model, params=result.state.params,
    )
    assert out["image"].shape[0] == 3
    sam = api.sample(
        cfg, n=4, model=result.model, params=result.state.params
    )
    assert sam["image"].shape[0] == 4
