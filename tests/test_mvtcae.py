"""MVTCAE objective (total-correlation VIB, Hwang et al. 2021) --
``objective="mvtcae"`` in train/step.py.

MVTCAE decodes every modality from the ONE joint PoE posterior and
mixes the KL: ``(1-a) KL(q||p) + (a/M) sum_m KL(q_joint || q_m)``. In
this framework that is a single decoded mask row (no decode waste,
unlike a naive (1+M)-term mask schedule) plus fusion-only cross-KL
work. These tests pin the math and the gradients against a naive
oracle, the dropout semantics, the fold parity, the DP-mesh parity,
and the inference path (plain PoE -- the mvae branch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.core.elbo import kl_gauss_gauss
from mmvae_tpu.core.mixture import component_masks, fuse_observed_z
from mmvae_tpu.core.poe import product_of_experts
from mmvae_tpu.core.sampling import reparameterize
from mmvae_tpu.models import MnistMVAE
from mmvae_tpu.ops import kl_std_normal
from mmvae_tpu.train.step import multi_term_loss


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


def _mvtcae_oracle(model, params, batch, alpha, beta, presence=None):
    """Naive MVTCAE loss, differentiable in ``params``: joint PoE
    posterior (z = mean, the sample=False convention) decodes all
    observed modalities; KL is the (1-a)/a mix of the prior KL and the
    per-OBSERVED-modality reverse cross-KLs."""
    variables = {"params": params}
    data = {k: v for k, v in batch.items() if k != "presence"}
    mu_e, lv_e = model.apply(variables, data, method="encode")
    B, M, _ = mu_e.shape
    pres = (
        jnp.ones((B, M), jnp.float32)
        if presence is None
        else jnp.asarray(presence)
    )
    mu_j, lv_j = product_of_experts(mu_e, lv_e, mask=pres)
    recons = model.apply(variables, mu_j, data, method="decode")
    nll = model.apply(variables, recons, data, method="nll_all")  # (M,B)
    nll = nll * pres.T
    recon = jnp.einsum("m,mb->b", model.lambdas(), nll)
    kl_p = kl_std_normal(mu_j, lv_j)
    ckl = jnp.zeros((B,))
    for m in range(M):
        mask = jnp.zeros((B, M)).at[:, m].set(1.0) * pres
        mu_u, lv_u = product_of_experts(mu_e, lv_e, mask=mask)
        ckl = ckl + pres[:, m] * kl_gauss_gauss(mu_j, lv_j, mu_u, lv_u)
    ckl = ckl / jnp.maximum(pres.sum(-1), 1.0)
    return jnp.mean(recon + beta * ((1 - alpha) * kl_p + alpha * ckl))


@pytest.mark.parametrize("fold", ["t", "b"])
def test_mvtcae_matches_naive_oracle(mnist_setup, fold):
    model, params, batch = mnist_setup
    alpha, beta = 0.7, 0.6
    want = float(_mvtcae_oracle(model, params, batch, alpha, beta))
    got, metrics = multi_term_loss(
        model, params, batch, jax.random.key(3), beta,
        sample=False, objective="mvtcae", mvtcae_alpha=alpha,
        term_fold=fold,
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    assert np.isfinite(float(metrics["cross_kl"]))


def test_mvtcae_alpha_zero_is_joint_elbo(mnist_setup):
    """alpha=0 degrades to the plain joint-term ELBO (prior KL only)."""
    model, params, batch = mnist_setup
    got, _ = multi_term_loss(
        model, params, batch, jax.random.key(3), 1.0,
        sample=False, objective="mvtcae", mvtcae_alpha=0.0,
        term_fold="t",
    )
    variables = {"params": params}
    mu_e, lv_e = model.apply(variables, batch, method="encode")
    mu_j, lv_j = product_of_experts(mu_e, lv_e)
    recons = model.apply(variables, mu_j, batch, method="decode")
    nll = model.apply(variables, recons, batch, method="nll_all")
    want = jnp.mean(
        jnp.einsum("m,mb->b", model.lambdas(), nll)
        + kl_std_normal(mu_j, lv_j)
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_mvtcae_presence_oracle(mnist_setup):
    """Dropout: an unobserved modality contributes no expert, no recon
    target, and no cross-KL (its masked-PoE posterior is the prior,
    which would bias the alpha mix toward the prior KL)."""
    model, params, batch = mnist_setup
    B = jax.tree.leaves(batch)[0].shape[0]
    pres = np.ones((B, 2), np.float32)
    pres[0, 1] = 0.0
    pres[3, 0] = 0.0
    alpha, beta = 0.85, 0.9
    want = float(
        _mvtcae_oracle(model, params, batch, alpha, beta, presence=pres)
    )
    got, _ = multi_term_loss(
        model, params, dict(batch, presence=jnp.asarray(pres)),
        jax.random.key(3), beta,
        sample=False, objective="mvtcae", mvtcae_alpha=alpha,
        term_fold="t",
    )
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_mvtcae_grads_match_oracle(mnist_setup):
    """Gradient parity with the differentiable oracle -- pins that the
    cross-KLs train BOTH sides (joint and unimodal posteriors receive
    gradient; the distillation is what buys cross-modal generation)."""
    model, params, batch = mnist_setup
    alpha, beta = 0.8, 0.5

    g_want = jax.grad(
        lambda p: _mvtcae_oracle(model, p, batch, alpha, beta)
    )(params)
    g_got = jax.grad(
        lambda p: multi_term_loss(
            model, p, batch, jax.random.key(3), beta,
            sample=False, objective="mvtcae", mvtcae_alpha=alpha,
            term_fold="t",
        )[0]
    )(params)
    for a, b in zip(jax.tree.leaves(g_want), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    # And the cross-KL half really reaches the encoders: alpha=1,
    # beta>0 with recon's contribution subtracted still moves encoder
    # grads (sanity that the distillation term is not dead code).
    enc = [k for k in params if "enc" in k]
    assert enc
    flat = jax.tree.leaves({k: g_got[k] for k in enc})
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


def test_mvtcae_rejects_mvae_term_knobs(mnist_setup):
    model, params, batch = mnist_setup
    for kw in (
        dict(n_random_subsets=2),
        dict(cross_recon=True),
        dict(cross_recon_stopgrad=True),
        dict(unimodal_align_weight=0.5),
    ):
        with pytest.raises(ValueError, match="mvae term-structure"):
            multi_term_loss(
                model, params, batch, jax.random.key(0), 1.0,
                sample=False, objective="mvtcae", **kw,
            )


def test_mvtcae_has_no_component_masks():
    with pytest.raises(ValueError):
        component_masks("mvtcae", 3)


def test_fuse_observed_z_mvtcae_is_poe():
    """Inference is plain PoE of the observed experts (the mvae branch)
    -- MVTCAE's alpha term is training-time distillation only."""
    rng = jax.random.key(5)
    k1, k2 = jax.random.split(rng)
    mu_e = jax.random.normal(k1, (5, 3, 4))
    lv_e = jax.random.normal(k2, (5, 3, 4)) * 0.3
    presence = jnp.asarray(
        (np.random.default_rng(0).random((5, 3)) > 0.4).astype(
            np.float32
        )
    )
    z = fuse_observed_z(rng, mu_e, lv_e, presence, "mvtcae", sample=True)
    mu, lv = product_of_experts(mu_e, lv_e, mask=presence)
    want = reparameterize(rng, mu, lv, sample=True)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(want))


def test_mvtcae_dp_matches_single_device():
    """The mvtcae step under the 8-fake-device DP mesh matches the
    single-device step (same contract tests/test_dp.py pins for mvae:
    the cross-KLs are per-example, so sharding the batch axis changes
    nothing but the reduction order)."""
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.parallel import make_mesh, replicate, shard_batch
    from mmvae_tpu.train import create_train_state, make_train_step

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)
    step = make_train_step(
        model, annealing_steps=10, objective="mvtcae",
        mvtcae_alpha=0.8,
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
    for a, b in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-4
        )


def test_cli_parses_mvtcae_flags():
    from mmvae_tpu.cli import _build_parser

    args = _build_parser().parse_args(
        ["train", "--config", "mnist", "--workdir", "/tmp/x",
         "--objective", "mvtcae", "--mvtcae-alpha", "0.75"]
    )
    assert args.objective == "mvtcae"
    assert args.mvtcae_alpha == 0.75


@pytest.mark.slow
def test_train_eval_generate_roundtrip(tmp_path):
    """api.train/eval_elbo/generate under objective="mvtcae": loss
    falls, eval reproduces the train loop's test metric (same objective
    + alpha on both sides), generation runs the PoE path."""
    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    cfg = get_config("mnist").replace(
        n_latents=8, batch_size=16, train_size=128, test_size=48,
        epochs=2, objective="mvtcae", mvtcae_alpha=0.8,
    )
    result = api.train(cfg, seed=0, workdir=str(tmp_path))
    losses = [h["train_loss"] for h in result.history]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    ev = api.eval_elbo(cfg, model=result.model,
                       params=result.state.params)
    assert np.isfinite(ev)
    np.testing.assert_allclose(
        ev, result.history[-1]["test_elbo"], rtol=1e-5
    )
    out = api.generate(
        cfg, {"label": np.asarray([1, 2, 3])},
        model=result.model, params=result.state.params,
    )
    assert out["image"].shape[0] == 3


def test_mvtcae_cycle_composes_and_matches_mvae_cycle_ce():
    """``cycle_*`` composes with mvtcae: the s-only latent comes from
    the unimodal posterior computed for the cross-KLs. At sample=False
    that mean is identical to the mvae unimodal-term mean, so the
    cycle_ce metric must MATCH the mvae run's exactly (the loss bases
    differ -- different KL structures -- but the cycle term is the
    same round trip)."""
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MultiMnistMVAE
    from mmvae_tpu.train import create_train_state

    model = MultiMnistMVAE(
        n_latents=8, conv_features=(4, 8), text_embed=8, text_hidden=16
    )
    ds = load_dataset("multimnist", n=16, seed=0)
    state = create_train_state(
        model, ds.arrays, jax.random.key(0), 1e-3
    )
    rng = jax.random.key(3)

    def run(objective, w):
        return multi_term_loss(
            model, state.params, ds.arrays, rng, beta=0.5,
            term_fold="t", cycle_weight=w, sample=False,
            objective=objective,
        )

    base, m0 = run("mvtcae", 0.0)
    assert "cycle_ce" not in m0
    loss_w, m = run("mvtcae", 2.0)
    np.testing.assert_allclose(
        float(loss_w), float(base) + 2.0 * float(m["cycle_ce"]),
        rtol=1e-6,
    )
    _, m_mvae = run("mvae", 1.0)
    np.testing.assert_allclose(
        float(m["cycle_ce"]), float(m_mvae["cycle_ce"]), rtol=1e-5
    )
