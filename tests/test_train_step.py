"""Jitted multi-term train/eval step behavior (SURVEY.md sections 3a, 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmvae_tpu.data import load_dataset
from mmvae_tpu.models import MnistMVAE
from mmvae_tpu.train import (
    create_train_state,
    make_eval_step,
    make_train_step,
    multi_term_loss,
)


def _setup(n=64, n_latents=8):
    model = MnistMVAE(n_latents=n_latents)
    ds = load_dataset("mnist", n=n, seed=0)
    state = create_train_state(model, ds.arrays, jax.random.key(0), 1e-3)
    return model, ds.arrays, state


def test_loss_decreases():
    model, batch, state = _setup()
    step = make_train_step(model, annealing_steps=0)
    state, m0 = step(state, batch)
    for _ in range(20):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])


def test_metrics_structure():
    model, batch, state = _setup()
    step = make_train_step(model, annealing_steps=10)
    state, m = step(state, batch)
    assert m["elbo_per_term"].shape == (3,)  # joint + 2 unimodal
    assert m["kl_per_term"].shape == (3,)
    assert float(m["beta"]) == 0.0  # step counter was 0 when traced


def test_annealing_advances_with_step():
    model, batch, state = _setup()
    step = make_train_step(model, annealing_steps=4)
    betas = []
    for _ in range(5):
        state, m = step(state, batch)
        betas.append(float(m["beta"]))
    np.testing.assert_allclose(betas, [0.0, 0.25, 0.5, 0.75, 1.0])


def test_full_presence_equals_none():
    """An all-ones presence mask must match no mask at all."""
    model, batch, state = _setup()
    rng = jax.random.key(7)
    l1, _ = multi_term_loss(model, state.params, batch, rng, beta=0.5)
    batch2 = dict(batch, presence=jnp.ones((64, 2)))
    l2, _ = multi_term_loss(model, state.params, batch2, rng, beta=0.5)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_dropped_modality_excluded():
    """presence=0 for a modality removes its expert AND its recon term."""
    model, batch, state = _setup(n=8)
    rng = jax.random.key(7)
    presence = jnp.ones((8, 2)).at[:, 1].set(0.0)  # drop label
    b = dict(batch, presence=presence)
    _, m = multi_term_loss(
        model, state.params, b, rng, beta=1.0, sample=False
    )
    # Label-unimodal term (index 2): no expert -> posterior == prior -> KL=0.
    np.testing.assert_allclose(float(m["kl_per_term"][2]), 0.0, atol=1e-5)
    # Its recon contribution is masked out too.
    np.testing.assert_allclose(
        float(m["recon_per_term"][2]), 0.0, atol=1e-6
    )


def test_eval_step_deterministic():
    model, batch, state = _setup()
    ev = make_eval_step(model)
    m1 = ev(state.params, batch)
    m2 = ev(state.params, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]))


def test_random_subsets_add_terms():
    model, batch, state = _setup(n=8)
    _, m = multi_term_loss(
        model,
        state.params,
        batch,
        jax.random.key(0),
        beta=1.0,
        n_random_subsets=3,
    )
    assert m["elbo_per_term"].shape == (3 + 3,)


def test_no_retrace_across_steps():
    """beta ramping / rng must not retrace the compiled step."""
    model, batch, state = _setup(n=8)
    step = make_train_step(model, annealing_steps=100)
    with jax.log_compiles(False):
        state, _ = step(state, batch)
        compiled_before = step._cache_size()
        for _ in range(3):
            state, _ = step(state, batch)
        assert step._cache_size() == compiled_before


def test_epoch_runner_matches_per_step_loop():
    """The lax.scan-fused epoch must be step-for-step identical to the
    per-step jitted loop (same rng splits, same updates)."""
    from mmvae_tpu.data import load_dataset, stacked_epoch
    from mmvae_tpu.train import make_epoch_runner

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=48, seed=0)

    def fresh():
        return create_train_state(
            model, ds.arrays, jax.random.key(0), 1e-3
        )

    step = make_train_step(model, annealing_steps=5)
    s1 = fresh()
    per_step_losses = []
    import numpy as _np

    order_rng = _np.random.default_rng(0)
    batches = stacked_epoch(ds, 16, order_rng)
    for i in range(3):
        b = {k: v[i] for k, v in batches.items()}
        s1, m = step(s1, b)
        per_step_losses.append(float(m["loss"]))

    runner = make_epoch_runner(model, annealing_steps=5)
    s2, ms = runner(fresh(), batches)
    np.testing.assert_allclose(
        np.asarray(ms["loss"]), per_step_losses, rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_epoch_runner_modality_drop_runs():
    from mmvae_tpu.data import load_dataset, stacked_epoch
    from mmvae_tpu.train import make_epoch_runner

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=32, seed=0)
    state = create_train_state(model, ds.arrays, jax.random.key(0), 1e-3)
    runner = make_epoch_runner(
        model, annealing_steps=5, p_modality_drop=0.5
    )
    batches = stacked_epoch(ds, 16, np.random.default_rng(0))
    state, ms = runner(state, batches)
    assert np.isfinite(np.asarray(ms["loss"])).all()


def test_cross_recon_supervises_absent_modalities():
    """cross_recon=True: every term reconstructs every modality (the
    unimodal-image term now carries a label-recon contribution)."""
    model, batch, state = _setup(n=8)
    rng = jax.random.key(3)
    _, m_ref = multi_term_loss(
        model, state.params, batch, rng, beta=1.0, sample=False
    )
    _, m_x = multi_term_loss(
        model, state.params, batch, rng, beta=1.0, sample=False,
        cross_recon=True,
    )
    # KL identical (same posteriors), recon strictly larger per term.
    np.testing.assert_allclose(
        np.asarray(m_ref["kl_per_term"]), np.asarray(m_x["kl_per_term"]),
        rtol=1e-6,
    )
    assert (
        np.asarray(m_x["recon_per_term"])[1:]
        > np.asarray(m_ref["recon_per_term"])[1:]
    ).all()
    # Joint term unchanged (it already reconstructs everything).
    np.testing.assert_allclose(
        float(m_x["recon_per_term"][0]),
        float(m_ref["recon_per_term"][0]),
        rtol=1e-6,
    )


def test_cross_recon_skips_empty_subsets():
    """cross_recon + a drawn all-empty subset: the empty term's
    posterior is the prior, so reconstructing from it is pure-noise
    supervision and must be masked out (ADVICE r1)."""
    from mmvae_tpu.core import elbo_subset_masks

    model, batch, state = _setup(n=8)
    rng = jax.random.key(0)

    masks = elbo_subset_masks(model.n_modalities)
    empty = jnp.zeros((1, model.n_modalities), masks.dtype)

    import mmvae_tpu.core.subsets as subsets_mod
    from unittest import mock

    def fake_random_subsets(rng, k, m):
        return jnp.concatenate([empty] * k, axis=0)

    with mock.patch.object(
        subsets_mod, "random_subset_masks", fake_random_subsets
    ), mock.patch(
        "mmvae_tpu.train.step.random_subset_masks", fake_random_subsets
    ):
        _, m_x = multi_term_loss(
            model, state.params, batch, rng, beta=1.0, sample=False,
            n_random_subsets=1, cross_recon=True,
        )
    # The forced-empty 4th term must carry zero recon (prior posterior,
    # masked targets) -- not a full cross-recon of every modality.
    assert float(m_x["recon_per_term"][-1]) == 0.0
    assert float(m_x["kl_per_term"][-1]) == 0.0


def test_gather_epoch_runner_matches_stacked():
    """The in-program shuffle+gather epoch runner must produce the exact
    same trajectory as the pre-stacked runner fed the same order (the
    device-side order is reproducible from state.rng)."""
    import numpy as np

    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import (
        create_train_state,
        make_epoch_runner,
        make_gather_epoch_runner,
    )

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)
    n_steps, batch = 4, 16

    def fresh():
        return create_train_state(
            model, {k: v[:16] for k, v in ds.arrays.items()},
            jax.random.key(0), 1e-3,
        )

    s_g = fresh()
    runner = make_gather_epoch_runner(
        model, n_steps, batch, annealing_steps=10
    )
    donated = jax.tree.map(jnp.copy, dict(ds.arrays))
    s2, _arrays, ms2 = runner(s_g, donated)

    # Reproduce the device-side order + post-split rng on the host.
    s_ref = fresh()
    shuffle_rng, _roll_rng, _off_rng, rng_after = jax.random.split(
        s_ref.rng, 4
    )
    order = jax.random.permutation(shuffle_rng, ds.size)[
        : n_steps * batch
    ].reshape(n_steps, batch)
    stacked = {
        k: jnp.take(v, order, axis=0) for k, v in ds.arrays.items()
    }
    # Same t-major fold as the single-shard gather runner (the eps draw
    # layout differs between folds, so the folds must match for
    # step-exact trajectories).
    s1, ms1 = make_epoch_runner(
        model, annealing_steps=10, term_fold="t"
    )(s_ref.replace(rng=rng_after), stacked)
    np.testing.assert_allclose(
        np.asarray(ms1["loss"]), np.asarray(ms2["loss"]), rtol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )


def test_gather_runner_reshuffle_every():
    """reshuffle_every=K: the donated arrays persist (shuffled) across
    epochs, rolls keep every example exactly once per epoch, and the
    trajectory stays finite and decreasing."""
    import numpy as np

    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import (
        create_train_state,
        make_gather_epoch_runner,
    )

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)
    state = create_train_state(
        model, {k: v[:16] for k, v in ds.arrays.items()},
        jax.random.key(0), 1e-3,
    )
    runner = make_gather_epoch_runner(
        model, 4, 16, annealing_steps=10, reshuffle_every=3
    )
    ref_labels = np.sort(np.asarray(ds.arrays["label"]))
    arrays = dict(ds.arrays)
    first = None
    for _ in range(4):
        state, arrays, ms = runner(state, arrays)
        losses = np.asarray(ms["loss"])
        assert np.isfinite(losses).all()
        if first is None:
            first = losses.mean()
        # Permutation invariant: every example is still present exactly
        # once after shuffles AND rolls.
        np.testing.assert_array_equal(
            np.sort(np.asarray(arrays["label"])), ref_labels
        )
    assert losses.mean() < first


def test_gather_runner_force_shuffle_on_resume():
    """force_shuffle=True (first epoch of a process) must truly shuffle
    even mid reshuffle_every window -- a resumed run reloads arrays in
    raw order and a bare roll would feed correlated batches."""
    import numpy as np

    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import (
        create_train_state,
        make_gather_epoch_runner,
    )

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)
    state = create_train_state(
        model, {k: v[:16] for k, v in ds.arrays.items()},
        jax.random.key(0), 1e-3,
    )
    # Pretend we resumed mid-window: step=4 -> epoch_i=1, 1 % 3 != 0.
    state = state.replace(step=jnp.asarray(4, jnp.int32))
    runner = make_gather_epoch_runner(
        model, 4, 16, annealing_steps=10, reshuffle_every=3
    )
    labels_in = np.asarray(ds.arrays["label"])

    def is_roll(labels_out):
        for off in range(len(labels_in)):
            if np.array_equal(np.roll(labels_in, off), labels_out):
                return True
        return False

    _s, arrays, _ms = runner(
        state, jax.tree.map(jnp.copy, dict(ds.arrays)), True
    )
    out = np.asarray(arrays["label"])
    np.testing.assert_array_equal(np.sort(out), np.sort(labels_in))
    assert not is_roll(out), "force_shuffle produced a bare rotation"


def test_grad_accumulation_matches_big_batch():
    """accum_steps=k: k micro-batch steps must produce the same Adam
    update as ONE step on the concatenated batch (grads average; the
    update fires once) -- optax.MultiSteps wiring."""
    import numpy as np

    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import create_train_state, make_train_step

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=32, seed=0)
    full = ds.arrays
    halves = [
        {k: v[:16] for k, v in full.items()},
        {k: v[16:] for k, v in full.items()},
    ]

    # Reference: one step on the full batch (no accumulation). beta must
    # match across the compared steps -> annealing off. The rngs differ
    # per step, so compare with sampling OFF via annealing_steps=0 and
    # deterministic z? The loss samples z from state.rng; to keep both
    # sides identical, drive each micro-step from the same rng by
    # resetting it (the math being tested is the optimizer wiring).
    def fixed_rng(state):
        import jax as _jax

        return state.replace(rng=_jax.random.key(123))

    s_big = fixed_rng(
        create_train_state(model, full, jax.random.key(0), 1e-3)
    )
    step_big = make_train_step(model, annealing_steps=0)
    s_big, _ = step_big(s_big, full)

    s_acc = fixed_rng(
        create_train_state(
            model, halves[0], jax.random.key(0), 1e-3, accum_steps=2
        )
    )
    step_acc = make_train_step(model, annealing_steps=0)
    for h in halves:
        s_acc = fixed_rng(s_acc)
        s_acc, _ = step_acc(s_acc, h)

    # Same z-noise per example? No -- each micro-batch draws its own
    # eps, so gradients differ stochastically from the big batch's.
    # What MUST hold exactly: no update happened until the k-th micro
    # step, and the params moved once (MultiSteps contract).
    p_big = jax.tree.leaves(s_big.params)
    p_acc = jax.tree.leaves(s_acc.params)
    p_init = jax.tree.leaves(
        create_train_state(model, full, jax.random.key(0), 1e-3).params
    )
    moved_acc = any(
        not np.allclose(np.asarray(a), np.asarray(i))
        for a, i in zip(p_acc, p_init)
    )
    assert moved_acc, "accumulated update never fired"
    # After only ONE micro step params must be UNCHANGED.
    s_half = fixed_rng(
        create_train_state(
            model, halves[0], jax.random.key(0), 1e-3, accum_steps=2
        )
    )
    s_half, _ = step_acc(s_half, halves[0])
    for a, i in zip(jax.tree.leaves(s_half.params), p_init):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(i))
    # And the update magnitude matches the big-batch step's scale
    # (same Adam, averaged grads): compare update norms within 2x.
    du_acc = sum(
        float(np.square(np.asarray(a) - np.asarray(i)).sum())
        for a, i in zip(p_acc, p_init)
    )
    du_big = sum(
        float(np.square(np.asarray(b) - np.asarray(i)).sum())
        for b, i in zip(p_big, p_init)
    )
    assert 0.25 < du_acc / du_big < 4.0


def test_cross_recon_weight():
    """cross_recon_weight scales only the CROSS recon entries: w=1
    reproduces plain cross_recon; w=0 reduces to reference semantics
    (own-subset recon only); the loss is monotone in w."""
    import numpy as np

    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import create_train_state, multi_term_loss

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=16, seed=0)
    batch = dict(ds.arrays)
    state = create_train_state(model, batch, jax.random.key(0), 1e-3)

    def loss(w, cross=True):
        val, _ = multi_term_loss(
            model, state.params, batch, jax.random.key(1), 0.5,
            cross_recon=cross, cross_recon_weight=w, sample=False,
        )
        return float(val)

    np.testing.assert_allclose(loss(1.0), loss(1.0, cross=True))
    np.testing.assert_allclose(loss(0.0), loss(0.0, cross=False),
                               rtol=1e-6)
    base = loss(0.0, cross=False)
    np.testing.assert_allclose(base, loss(0.0), rtol=1e-6)
    assert loss(0.5) > base and loss(1.0) > loss(0.5)


def test_cross_recon_stopgrad_protects_decoders():
    """``cross_recon_stopgrad``: the forward loss is unchanged, decoder
    grads match plain (no-cross) semantics exactly, and encoder grads
    still receive the cross supervision (both folds)."""
    model, batch, state = _setup()
    rng = jax.random.key(3)

    for fold in ("t", "b"):
        def grads(**kw):
            def f(p):
                return multi_term_loss(
                    model, p, batch, rng, beta=0.7, term_fold=fold,
                    **kw,
                )[0]

            return jax.grad(f)(state.params)

        l_cross, _ = multi_term_loss(
            model, state.params, batch, rng, beta=0.7, term_fold=fold,
            cross_recon=True,
        )
        l_sg, _ = multi_term_loss(
            model, state.params, batch, rng, beta=0.7, term_fold=fold,
            cross_recon=True, cross_recon_stopgrad=True,
        )
        np.testing.assert_allclose(float(l_cross), float(l_sg), rtol=1e-6)

        g_plain = grads()
        g_sg = grads(cross_recon=True, cross_recon_stopgrad=True)
        g_cross = grads(cross_recon=True)
        for k in g_plain:
            leaves_sg = jax.tree.leaves(g_sg[k])
            if "dec" in k:
                # Cross entries contribute nothing to decoder params:
                # identical to no-cross-recon decoder grads.
                ref = jax.tree.leaves(g_plain[k])
                for a, b in zip(ref, leaves_sg):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), rtol=1e-5,
                        atol=1e-7,
                    )
            else:
                # Encoders DO see the cross supervision (differ from
                # plain) and are not decoder-stopped (match full cross).
                ref = jax.tree.leaves(g_cross[k])
                diff = max(
                    float(np.abs(np.asarray(a) - np.asarray(b)).max())
                    for a, b in zip(ref, leaves_sg)
                )
                assert diff < 1e-5, (fold, k, diff)
                plain = jax.tree.leaves(g_plain[k])
                moved = max(
                    float(np.abs(np.asarray(a) - np.asarray(b)).max())
                    for a, b in zip(plain, leaves_sg)
                )
                assert moved > 1e-6, (fold, k)


def test_shuffle_granularity_group_structure():
    """``shuffle_granularity=G``: true-shuffle epochs keep contiguous
    G-row groups of the (boundary-rolled) previous order -- verify the
    output is a permutation made of consecutive-mod-size runs of length
    G -- and training still consumes every row exactly once."""
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.train import make_gather_epoch_runner

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=128, seed=0)
    gran = 8
    runner = make_gather_epoch_runner(
        model, 8, 16, annealing_steps=10, shuffle_granularity=gran
    )
    # Tag rows by a unique corner pixel so we can recover the order.
    arrays = {k: np.asarray(v).copy() for k, v in ds.arrays.items()}
    arrays["image"][:, 0, 0] = np.arange(128, dtype=np.float32) / 128.0
    orig = arrays["image"][:, 0, 0].copy()
    state = create_train_state(
        model,
        {k: v[:16] for k, v in arrays.items()},
        jax.random.key(0),
        1e-3,
    )
    arrs = {k: jnp.asarray(v) for k, v in arrays.items()}
    for ep in range(2):
        state, arrs, _ = runner(state, arrs, ep == 0)
        tags = np.asarray(arrs["image"])[:, 0, 0]
        # Permutation of the dataset: nothing lost or duplicated.
        np.testing.assert_allclose(np.sort(tags), np.sort(orig))
        # Recover original indices, check G-length consecutive runs
        # (mod size, because of the boundary-offset roll).
        idx = np.argsort(orig)[
            np.searchsorted(np.sort(orig), tags)
        ]
        runs = idx.reshape(-1, gran)
        deltas = np.diff(runs, axis=1) % 128
        breaks = (deltas != 1).sum(axis=1)
        if ep == 0:
            # First shuffle acts on identity order: pure rolled groups.
            assert (breaks == 0).all(), runs[:4]
        else:
            # Later shuffles act on group-permuted order; the offset
            # roll lets a new group straddle one old group boundary.
            assert (breaks <= 1).all(), runs[:4]


def test_unimodal_align_weight_value_and_structure():
    """``unimodal_align_weight``: the loss grows by exactly
    w * beta * KL(q_unimodal || q_joint) (beta-ramped like the ELBO's
    KL; hand-computed from the same fused posteriors), the metric is
    the RAW KL, and both folds agree."""
    from mmvae_tpu.core import elbo_subset_masks, kl_gauss_gauss
    from mmvae_tpu.core.poe import product_of_experts

    model, batch, state = _setup(n=16)
    rng = jax.random.key(5)

    def run(w, fold):
        return multi_term_loss(
            model, state.params, batch, rng, beta=0.5, term_fold=fold,
            unimodal_align_weight=w, sample=False,
        )

    base, m_base = run(0.0, "b")
    assert "align_kl" not in m_base
    for fold in ("t", "b"):
        loss_w, m = run(2.0, fold)
        np.testing.assert_allclose(
            float(loss_w),
            float(base) + 2.0 * 0.5 * float(m["align_kl"]),
            rtol=1e-6,
        )
        assert float(m["align_kl"]) > 0.0
        assert float(m["loss"]) == float(loss_w)

    # Hand-computed alignment KL from the same fused posteriors.
    mu_e, lv_e = model.apply(
        {"params": state.params}, batch, method="encode"
    )
    masks = elbo_subset_masks(model.n_modalities)
    eff = jnp.broadcast_to(
        masks[:, None, :],
        (masks.shape[0], mu_e.shape[0], model.n_modalities),
    )
    fm, fl = product_of_experts(mu_e[None], lv_e[None], mask=eff)
    want = float(jnp.mean(jnp.sum(
        kl_gauss_gauss(fm[1:], fl[1:], fm[:1], fl[:1]), axis=0
    )))
    _, m = run(1.0, "t")
    np.testing.assert_allclose(float(m["align_kl"]), want, rtol=1e-5)


def test_unimodal_align_is_encoder_only():
    """The alignment term's gradient touches encoders only: decoder
    grads are bitwise-unaffected by the knob, and the joint side is
    stop-gradiented (the term pulls subsets toward the joint, never the
    joint toward the subsets)."""
    model, batch, state = _setup(n=16)
    rng = jax.random.key(7)

    def grads(w):
        def f(p):
            return multi_term_loss(
                model, p, batch, rng, beta=0.7,
                unimodal_align_weight=w, sample=False,
            )[0]

        return jax.grad(f)(state.params)

    g0, g1 = grads(0.0), grads(3.0)
    changed = False
    for k in g0:
        a = jax.tree.leaves(g0[k])
        b = jax.tree.leaves(g1[k])
        if "dec" in k:
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x),
                                              np.asarray(y))
        else:
            changed |= any(
                not np.allclose(np.asarray(x), np.asarray(y))
                for x, y in zip(a, b)
            )
    assert changed  # encoders did receive the alignment gradient


def _setup_multimnist(n=16):
    from mmvae_tpu.models import MultiMnistMVAE

    model = MultiMnistMVAE(
        n_latents=8, conv_features=(4, 8), text_embed=8, text_hidden=16
    )
    ds = load_dataset("multimnist", n=n, seed=0)
    state = create_train_state(
        model, ds.arrays, jax.random.key(0), 1e-3
    )
    return model, ds.arrays, state


def test_cycle_weight_value_and_structure():
    """``cycle_weight``: the loss grows by exactly w * cycle_ce, the
    metric matches a hand-computed generation-path round trip (text-only
    posterior -> sigmoid render -> image-only re-encode -> teacher-forced
    text CE, scaled by lambda_text), and both folds agree."""
    from mmvae_tpu.core import elbo_subset_masks
    from mmvae_tpu.core.poe import product_of_experts
    from mmvae_tpu.train.step import multi_term_loss

    model, batch, state = _setup_multimnist()
    rng = jax.random.key(3)

    def run(w, fold):
        return multi_term_loss(
            model, state.params, batch, rng, beta=0.5, term_fold=fold,
            cycle_weight=w, sample=False,
        )

    base, m_base = run(0.0, "b")
    assert "cycle_ce" not in m_base
    for fold in ("t", "b"):
        loss_w, m = run(2.0, fold)
        np.testing.assert_allclose(
            float(loss_w), float(base) + 2.0 * float(m["cycle_ce"]),
            rtol=1e-6,
        )
        assert float(m["cycle_ce"]) > 0.0
        assert float(m["loss"]) == float(loss_w)

    # Hand-computed cycle CE (sample=False -> z is the fused mean).
    vs = {"params": state.params}
    mu_e, lv_e = model.apply(vs, batch, method="encode")
    masks = elbo_subset_masks(model.n_modalities)  # joint, image, text
    eff = jnp.broadcast_to(
        masks[:, None, :],
        (masks.shape[0], mu_e.shape[0], model.n_modalities),
    )
    fm, _ = product_of_experts(mu_e[None], lv_e[None], mask=eff)
    z_text = fm[2]  # unimodal text term
    rendered = model.apply(vs, z_text, batch, method="decode")
    re_batch = dict(batch, image=jax.nn.sigmoid(rendered["image"]))
    mu2, lv2 = model.apply(vs, re_batch, method="encode")
    img_only = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0])[None], (mu2.shape[0], 2)
    )
    mu_f2, _ = product_of_experts(mu2, lv2, mask=img_only)
    recons2 = model.apply(vs, mu_f2, batch, method="decode")
    nll2 = model.apply(vs, recons2, batch, method="nll_all")
    want = float(model.lambdas()[1] * jnp.mean(nll2[1]))
    _, m = run(1.0, "t")
    np.testing.assert_allclose(float(m["cycle_ce"]), want, rtol=1e-5)


def test_cycle_is_encoder_only():
    """The cycle term's gradient never reaches the decoders (every
    decode on the cycle path runs with stop-gradiented decoder params):
    decoder grads are bitwise-unaffected by the knob, encoder grads
    change."""
    from mmvae_tpu.train.step import multi_term_loss

    model, batch, state = _setup_multimnist()
    rng = jax.random.key(9)

    def grads(w):
        def f(p):
            return multi_term_loss(
                model, p, batch, rng, beta=0.7,
                cycle_weight=w, sample=False,
            )[0]

        return jax.grad(f)(state.params)

    g0, g1 = grads(0.0), grads(5.0)
    changed = False
    for k in g0:
        a = jax.tree.leaves(g0[k])
        b = jax.tree.leaves(g1[k])
        if "dec" in k:
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x),
                                              np.asarray(y))
        else:
            changed |= any(
                not np.allclose(np.asarray(x), np.asarray(y))
                for x, y in zip(a, b)
            )
    assert changed  # encoders did receive the cycle gradient


def test_cycle_render_grad_reaches_image_decoder_only():
    """``cycle_render_grad=True``: the forward loss is UNCHANGED (same
    value as the stop-grad cycle), the bernoulli (image) decoder now
    receives the cycle gradient via the render decode, and the seq
    decoder still does not (the re-read path stays stop-gradiented)."""
    from mmvae_tpu.train.step import multi_term_loss

    model, batch, state = _setup_multimnist()
    rng = jax.random.key(11)

    def loss_and_grads(w, render_grad):
        def f(p):
            return multi_term_loss(
                model, p, batch, rng, beta=0.7,
                cycle_weight=w, cycle_render_grad=render_grad,
                sample=False,
            )[0]

        return float(f(state.params)), jax.grad(f)(state.params)

    l_sg, g_sg = loss_and_grads(5.0, False)
    l_rg, g_rg = loss_and_grads(5.0, True)
    _, g_off = loss_and_grads(0.0, False)
    # Forward value is a function of the same params either way.
    np.testing.assert_allclose(l_rg, l_sg, rtol=1e-6)

    def differs(a, b):
        return any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    # Image decoder: untouched by the sg cycle, trained by render-grad.
    assert not differs(g_sg["image_dec"], g_off["image_dec"])
    assert differs(g_rg["image_dec"], g_off["image_dec"])
    # Seq decoder: stop-gradiented on the cycle path in BOTH modes.
    assert not differs(g_sg["text_dec"], g_off["text_dec"])
    assert not differs(g_rg["text_dec"], g_off["text_dec"])


def test_uint8_residency_matches_prequantized_f32():
    """data_dtype="uint8": training on uint8-resident arrays must match
    training on f32 arrays that carry EXACTLY the dequantized values --
    the in-program dequant (train/step.py::_dequant_data) is the only
    difference between the two programs."""
    from mmvae_tpu.data import dataset_astype
    from mmvae_tpu.train import make_gather_epoch_runner

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=64, seed=0)
    ds_u8 = dataset_astype(ds, jnp.uint8)
    # f32 twin: the same dequant formula, applied host-side. Fresh
    # copies throughout -- the runner donates its array arguments, so
    # the two runs must not share buffers.
    arrays_f32 = {
        k: (
            v.astype(jnp.float32) / jnp.float32(255.0)
            if v.dtype == jnp.uint8
            else jnp.array(v)
        )
        for k, v in ds_u8.arrays.items()
    }
    steps, batch = 4, 16
    runner = make_gather_epoch_runner(model, steps, batch)

    def run(arrays):
        init = {k: v[:batch] for k, v in arrays.items()}
        state = create_train_state(
            model, init, jax.random.key(0), 1e-3
        )
        out = []
        for _ in range(2):  # two epochs: donated arrays persist uint8
            state, arrays, ms = runner(state, arrays)
            out.append(np.asarray(ms["loss"]))
        assert jax.tree.leaves(arrays)[0].dtype == \
            jax.tree.leaves(init)[0].dtype
        return np.concatenate(out)

    losses_u8 = run(dict(ds_u8.arrays))
    losses_f32 = run(dict(arrays_f32))
    np.testing.assert_allclose(losses_u8, losses_f32, rtol=1e-6)


def test_uint8_eval_step_dequantizes():
    """The eval path shares the multi_term_loss chokepoint: a uint8
    batch must score identically to its dequantized f32 twin."""
    from mmvae_tpu.data import dataset_astype

    model, batch, state = _setup()
    ds = load_dataset("mnist", n=64, seed=0)
    u8 = dataset_astype(ds, jnp.uint8).arrays
    f32 = {
        k: (
            v.astype(jnp.float32) / jnp.float32(255.0)
            if v.dtype == jnp.uint8
            else v
        )
        for k, v in u8.items()
    }
    ev = make_eval_step(model)
    m_u8 = ev(state.params, u8)
    m_f32 = ev(state.params, f32)
    np.testing.assert_allclose(
        float(m_u8["loss"]), float(m_f32["loss"]), rtol=1e-6
    )


def test_cycle_contrast_weight_value_and_routing():
    """cycle_contrast_weight: the loss delta is exactly w * the reported
    cycle_contrast metric (linearity in w), the metric equals the
    hand-computed per-example pixel mean/std mismatch of the render,
    the gradient reaches the image decoder only under render_grad, and
    the knob without a cycle term is an error."""
    import pytest
    from mmvae_tpu.train.step import multi_term_loss

    model, batch, state = _setup_multimnist()
    rng = jax.random.key(13)

    def loss_metrics(cw, render_grad=False, fold="t"):
        return multi_term_loss(
            model, state.params, batch, rng, beta=0.7,
            cycle_weight=1.0, cycle_render_grad=render_grad,
            cycle_contrast_weight=cw, sample=False, term_fold=fold,
        )

    l0, m0 = loss_metrics(0.0)
    l1, m1 = loss_metrics(1.0)
    l3, m3 = loss_metrics(3.0)
    pen = float(m1["cycle_contrast"])
    assert pen > 0.0
    # The deltas difference two ~1e3 f32 losses -- tolerance covers the
    # cancellation, not the math.
    np.testing.assert_allclose(float(l1) - float(l0), pen, rtol=5e-3)
    np.testing.assert_allclose(
        float(l3) - float(l0), 3.0 * pen, rtol=5e-3
    )
    # Hand-compute the penalty by replaying the render pass: text-only
    # unimodal z (term 1+s, deterministic), decode, sigmoid, moments.
    from mmvae_tpu.core import elbo_subset_masks, reparameterize
    from mmvae_tpu.core.poe import product_of_experts

    variables = {"params": state.params}
    mu_e, lv_e = model.apply(variables, batch, method="encode")
    masks = elbo_subset_masks(model.n_modalities)
    specs = model.specs()
    s_i = [i for i, s in enumerate(specs) if s.kind == "seq"][0]
    row = masks[1 + s_i]
    mu_f, lv_f = product_of_experts(
        mu_e, lv_e, mask=jnp.broadcast_to(row, mu_e.shape[:1] + row.shape)
    )
    z_s = reparameterize(jax.random.key(0), mu_f, lv_f, sample=False)
    rendered = model.apply(variables, z_s, batch, method="decode")
    name = [s.name for s in specs if s.kind == "bernoulli"][0]
    r = np.asarray(jax.nn.sigmoid(rendered[name]), np.float64)
    x = np.asarray(batch[name], np.float64).reshape(r.shape)
    ax = tuple(range(1, r.ndim))
    dm = r.mean(axis=ax) - x.mean(axis=ax)
    dsd = r.std(axis=ax) - x.std(axis=ax)
    np.testing.assert_allclose(
        pen, float(np.mean(dm * dm + dsd * dsd)), rtol=1e-4
    )
    # Fold invariance: the contrast term reads the unimodal z which is
    # fold-layout-independent.
    lb, _ = loss_metrics(1.0, fold="b")
    np.testing.assert_allclose(float(l1), float(lb), rtol=1e-5)

    # Gradient routing mirrors the render pass's stop-grad structure.
    def grads(cw, render_grad):
        def f(p):
            return multi_term_loss(
                model, p, batch, rng, beta=0.7,
                cycle_weight=1.0, cycle_render_grad=render_grad,
                cycle_contrast_weight=cw, sample=False,
            )[0]

        return jax.grad(f)(state.params)

    def differs(a, b):
        return any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    g_off_sg, g_on_sg = grads(0.0, False), grads(4.0, False)
    g_off_rg, g_on_rg = grads(0.0, True), grads(4.0, True)
    assert not differs(g_on_sg["image_dec"], g_off_sg["image_dec"])
    assert differs(g_on_rg["image_dec"], g_off_rg["image_dec"])
    assert not differs(g_on_rg["text_dec"], g_off_rg["text_dec"])
    # Encoders see the contrast gradient through the conditioning z.
    assert differs(g_on_sg["text_enc"], g_off_sg["text_enc"])

    with pytest.raises(ValueError, match="cycle_contrast_weight"):
        multi_term_loss(
            model, state.params, batch, rng, beta=0.7,
            cycle_weight=0.0, cycle_contrast_weight=1.0, sample=False,
        )


def test_cycle_render_binarize_semantics_and_routing():
    """cycle_render_binarize: the re-encode must see the STE-hard 0/1
    render -- the loss delta vs the soft cycle equals a manual replay
    of the cycle CE with thresholded pixels, the STE keeps encoder
    gradients flowing, and decoders stay stop-gradiented."""
    from mmvae_tpu.core import elbo_subset_masks, reparameterize
    from mmvae_tpu.core.poe import product_of_experts
    from mmvae_tpu.train.step import multi_term_loss

    model, batch, state = _setup_multimnist()
    rng = jax.random.key(19)

    def loss(p, binarize):
        return multi_term_loss(
            model, p, batch, rng, beta=0.7, cycle_weight=1.0,
            cycle_render_binarize=binarize, sample=False,
        )[0]

    l_off = float(loss(state.params, False))
    l_on = float(loss(state.params, True))
    assert l_on != l_off
    # "both" averages the soft- and hard-form cycle CE exactly.
    l_both = float(loss(state.params, "both"))
    np.testing.assert_allclose(l_both, 0.5 * (l_on + l_off), rtol=1e-5)
    import pytest

    with pytest.raises(ValueError, match="cycle_render_binarize"):
        loss(state.params, "weird")

    # Manual replay of the cycle CE with soft vs hard renders.
    variables = {"params": state.params}
    specs = model.specs()
    s_i = [i for i, s in enumerate(specs) if s.kind == "seq"][0]
    b_name = [s.name for s in specs if s.kind == "bernoulli"][0]
    mu_e, lv_e = model.apply(variables, batch, method="encode")
    masks = elbo_subset_masks(model.n_modalities)
    row = masks[1 + s_i]
    mu_f, lv_f = product_of_experts(
        mu_e, lv_e, mask=jnp.broadcast_to(row, mu_e.shape[:1] + row.shape)
    )
    z_s = reparameterize(jax.random.key(0), mu_f, lv_f, sample=False)
    rendered = model.apply(variables, z_s, batch, method="decode")
    soft = jax.nn.sigmoid(rendered[b_name])

    def cycle_ce(render_pixels):
        re_batch = dict(batch)
        re_batch[b_name] = render_pixels
        mu2, lv2 = model.apply(variables, re_batch, method="encode")
        pres = jnp.zeros((model.n_modalities,)).at[
            jnp.asarray([i for i, s in enumerate(specs)
                         if s.kind == "bernoulli"])
        ].set(1.0)
        pres = jnp.broadcast_to(pres[None], mu2.shape[:1] + pres.shape)
        mu_f2, _ = product_of_experts(mu2, lv2, mask=pres)
        recons2 = model.apply(variables, mu_f2, batch, method="decode")
        nll2 = model.apply(variables, recons2, batch, method="nll_all")
        lam = model.lambdas()[s_i]
        return float(lam * jnp.mean(nll2[s_i]))

    delta_manual = cycle_ce((soft > 0.5).astype(soft.dtype)) - cycle_ce(soft)
    np.testing.assert_allclose(l_on - l_off, delta_manual, rtol=5e-3)

    def differs(a, b):
        return any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    g_on = jax.grad(lambda p: loss(p, True))(state.params)
    g_off = jax.grad(lambda p: loss(p, False))(state.params)
    # STE keeps the encoder gradient path alive (and different).
    assert differs(g_on["text_enc"], g_off["text_enc"])
    assert differs(g_on["image_enc"], g_off["image_enc"])
    # Decoders stay stop-gradiented on the cycle path (no render_grad).
    for a, b in zip(
        jax.tree.leaves(g_on["text_dec"]), jax.tree.leaves(g_off["text_dec"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
