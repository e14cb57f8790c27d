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


def test_dp_step_has_no_allgather(setup):
    """Sharding-efficiency regression (round-2 VERDICT missing #1): the
    b-major term fold must keep the whole decode+NLL pass data-parallel.
    The t-major fold made GSPMD all-gather the targets AND z (replicating
    the decode pass on every device); with the b-major fold the only
    collective in the DP program is the gradient/metric all-reduce."""
    model, batch, fresh_state = setup
    mesh = make_mesh()
    step = make_train_step(model, annealing_steps=10)
    state = replicate(fresh_state(), mesh)
    sharded = shard_batch(batch, mesh)
    txt = step.lower(state, sharded).compile().as_text()
    assert "all-reduce" in txt  # grads really are reduced over the mesh
    offenders = [
        line.strip()[:160]
        for line in txt.splitlines()
        if "all-gather" in line or "all-to-all" in line
    ]
    assert not offenders, offenders


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


@pytest.mark.slow
def test_gather_runner_mesh_parity_and_no_collectives(setup):
    """Round-3 VERDICT item #2: the in-program shuffle+gather fast path
    composes with the DP mesh. The mesh epoch program must move ZERO
    data between chips (per-shard permutation + stratified batches),
    and -- because the program is identical for any placement of the
    same n_shards-structured arrays -- the 8-device run must match the
    single-device run up to reduction order, step for step."""
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.parallel import batch_sharding
    from mmvae_tpu.train import make_gather_epoch_runner

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=128, seed=0)

    def fresh(arrays):
        return create_train_state(
            model,
            {k: v[:16] for k, v in arrays.items()},
            jax.random.key(0),
            1e-3,
        )

    runner = make_gather_epoch_runner(
        model, 8, 16, annealing_steps=10, reshuffle_every=4, n_shards=8
    )

    arrs1 = {k: jnp.array(v) for k, v in ds.arrays.items()}
    s1 = fresh(arrs1)
    losses1 = []
    for ep in range(3):
        s1, arrs1, ms = runner(s1, arrs1, ep == 0)
        losses1.append(np.asarray(ms["loss"]))

    mesh = make_mesh()
    sh = batch_sharding(mesh)
    arrs8 = {
        k: jax.device_put(np.asarray(v), sh)
        for k, v in ds.arrays.items()
    }
    s8 = replicate(fresh(ds.arrays), mesh)

    txt = runner.lower(s8, arrs8, True).compile().as_text()
    offenders = [
        line.strip()[:160]
        for line in txt.splitlines()
        if "all-gather" in line
        or "all-to-all" in line
        or "collective-permute" in line
    ]
    assert not offenders, offenders

    losses8 = []
    for ep in range(3):
        s8, arrs8, ms = runner(s8, arrs8, ep == 0)
        losses8.append(np.asarray(ms["loss"]))

    np.testing.assert_allclose(
        np.concatenate(losses1), np.concatenate(losses8), rtol=2e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        )
    # The returned (donated) arrays are still a permutation of the
    # dataset -- nothing was lost or duplicated by the shard machinery.
    img = np.asarray(arrs8["image"]).reshape(128, -1)
    orig = np.asarray(ds.arrays["image"]).reshape(128, -1)
    order = np.lexsort(img.T)
    order0 = np.lexsort(orig.T)
    np.testing.assert_allclose(img[order], orig[order0], atol=1e-6)


@pytest.mark.slow
def test_celeba_dp_matches_single_device_and_no_allgather():
    """Round-3 VERDICT weak #1: the FLAGSHIP structures -- the vmapped
    18-attr einsum banks and the 19-expert masked PoE -- must execute
    under the DP mesh, match the single-device step, and reshard
    nothing (tiny image_hw/features keep the CPU compile tractable)."""
    from mmvae_tpu.models import CelebAMVAE

    model = CelebAMVAE(
        n_latents=16, image_hw=(16, 16), conv_features=(8, 16)
    )
    ds = load_dataset("celeba", n=32, seed=0, gen_kwargs={"hw": 16})
    batch = dict(ds.arrays)

    def fresh():
        return create_train_state(model, batch, jax.random.key(0), 1e-3)

    step = make_train_step(
        model, annealing_steps=10, n_random_subsets=2
    )
    s1 = fresh()
    for _ in range(2):
        s1, m1 = step(s1, batch)

    mesh = make_mesh()
    s8 = replicate(fresh(), mesh)
    sharded = shard_batch(batch, mesh)
    txt = step.lower(s8, sharded).compile().as_text()
    offenders = [
        line.strip()[:160]
        for line in txt.splitlines()
        if "all-gather" in line or "all-to-all" in line
    ]
    assert not offenders, offenders
    for _ in range(2):
        s8, m8 = step(s8, sharded)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=2e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_block_mode_mesh_parity_and_no_collectives(setup):
    """Round-3 follow-up: ``shuffle_mode="block"`` composes with the DP
    mesh. Between true reshuffles the epoch must (a) leave the resident
    arrays untouched (zero epoch-level data movement), (b) compile to a
    program with zero data-movement collectives, and (c) -- the program
    being a pure function of n_shards -- match the single-device run of
    the same n_shards-structured arrays step for step."""
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.parallel import batch_sharding
    from mmvae_tpu.train import make_gather_epoch_runner

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=128, seed=0)

    def fresh(arrays):
        return create_train_state(
            model,
            {k: v[:16] for k, v in arrays.items()},
            jax.random.key(0),
            1e-3,
        )

    runner = make_gather_epoch_runner(
        model, 8, 16, annealing_steps=10, reshuffle_every=4,
        n_shards=8, shuffle_mode="block",
    )

    arrs1 = {k: jnp.array(v) for k, v in ds.arrays.items()}
    s1 = fresh(arrs1)
    losses1 = []
    for ep in range(3):
        s1, arrs1, ms = runner(s1, arrs1, ep == 0)
        losses1.append(np.asarray(ms["loss"]))

    mesh = make_mesh()
    sh = batch_sharding(mesh)
    arrs8 = {
        k: jax.device_put(np.asarray(v), sh)
        for k, v in ds.arrays.items()
    }
    s8 = replicate(fresh(ds.arrays), mesh)

    txt = runner.lower(s8, arrs8, True).compile().as_text()
    offenders = [
        line.strip()[:160]
        for line in txt.splitlines()
        if "all-gather" in line
        or "all-to-all" in line
        or "collective-permute" in line
    ]
    assert not offenders, offenders

    losses8 = []
    snap_after_shuffle = None
    for ep in range(3):
        s8, arrs8, ms = runner(s8, arrs8, ep == 0)
        losses8.append(np.asarray(ms["loss"]))
        if ep == 0:
            snap_after_shuffle = jax.tree.map(np.asarray, arrs8)

    # Block epochs between reshuffles read the arrays IN PLACE: epochs
    # 2 and 3 (not multiples of reshuffle_every) must not have moved a
    # byte of the resident data.
    for k in snap_after_shuffle:
        np.testing.assert_array_equal(
            np.asarray(arrs8[k]), snap_after_shuffle[k]
        )

    np.testing.assert_allclose(
        np.concatenate(losses1), np.concatenate(losses8), rtol=2e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        )


def test_align_knob_composes_with_dp(setup):
    """``unimodal_align_weight`` under the DP mesh: batch-mean of the
    alignment KL reduces over the sharded axis like any other term, so
    the DP step must match single-device."""
    model, batch, fresh_state = setup
    step = make_train_step(
        model, annealing_steps=10, unimodal_align_weight=1.5
    )

    s1 = fresh_state()
    s1, m1 = step(s1, batch)

    mesh = make_mesh()
    s8 = replicate(fresh_state(), mesh)
    s8, m8 = step(s8, shard_batch(batch, mesh))

    assert float(m1["align_kl"]) > 0.0
    np.testing.assert_allclose(
        float(m1["align_kl"]), float(m8["align_kl"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-4
    )


def test_st_fold_matches_b_fold_loss_and_grads(setup):
    """``term_fold="st"`` (shard-local t-major decode+NLL under
    shard_map): z is computed globally before the fold, so loss and
    grads must match the GSPMD b-major fold up to reduction order."""
    from mmvae_tpu.train import multi_term_loss

    model, batch, fresh_state = setup
    params = fresh_state().params
    mesh = make_mesh()
    sharded = shard_batch(batch, mesh)
    rng = jax.random.key(11)

    def loss_grads(fold, mesh_arg):
        def f(p):
            return multi_term_loss(
                model, p, sharded, rng, beta=0.7, term_fold=fold,
                mesh=mesh_arg, sample=True,
            )[0]

        # jit: one compiled program instead of hundreds of eager
        # dispatches -- eager shard_map re-rendezvouses 8 one-core
        # device threads per primitive, which flakily trips XLA:CPU's
        # collective watchdog under suite load (process abort).
        loss, grads = jax.jit(jax.value_and_grad(f))(params)
        return float(loss), grads

    lb, gb = loss_grads("b", None)
    ls, gs = loss_grads("st", mesh)
    np.testing.assert_allclose(lb, ls, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gb), jax.tree.leaves(gs)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )

    # With per-example modality-dropout presence masks (the other input
    # structure the folds must agree on): presence multiplies both the
    # fusion mask and the recon weights, globally in both folds.
    presence = jnp.asarray(
        (np.random.default_rng(3).random((64, 2)) > 0.3).astype(
            np.float32
        )
    )
    sharded_p = shard_batch(dict(batch, presence=presence), mesh)

    def loss_p(fold, mesh_arg):
        from mmvae_tpu.train import multi_term_loss

        return float(multi_term_loss(
            model, params, sharded_p, rng, beta=0.7, term_fold=fold,
            mesh=mesh_arg, sample=True,
        )[0])

    np.testing.assert_allclose(
        loss_p("b", None), loss_p("st", mesh), rtol=1e-5
    )


@pytest.mark.slow
def test_st_fold_gather_runner_parity_and_no_collectives():
    """The gather epoch runner auto-selects "st" when handed the mesh;
    the program must stay collective-free (the shard-local fold never
    crosses chips) and match the b-fold runner step for step (same rng
    stream -> identical shuffles and z)."""
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.parallel import batch_sharding
    from mmvae_tpu.train import make_gather_epoch_runner

    model = MnistMVAE(n_latents=8)
    ds = load_dataset("mnist", n=128, seed=0)
    mesh = make_mesh()
    sh = batch_sharding(mesh)

    def fresh():
        return replicate(
            create_train_state(
                model,
                {k: v[:16] for k, v in ds.arrays.items()},
                jax.random.key(0),
                1e-3,
            ),
            mesh,
        )

    kw = dict(annealing_steps=10, reshuffle_every=4, n_shards=8)
    runner_b = make_gather_epoch_runner(model, 8, 16, **kw)
    runner_st = make_gather_epoch_runner(model, 8, 16, mesh=mesh, **kw)

    def sharded_arrays():
        return {
            k: jax.device_put(np.asarray(v), sh)
            for k, v in ds.arrays.items()
        }

    arrs = sharded_arrays()
    txt = runner_st.lower(fresh(), arrs, True).compile().as_text()
    offenders = [
        line.strip()[:160]
        for line in txt.splitlines()
        if "all-gather" in line
        or "all-to-all" in line
        or "collective-permute" in line
    ]
    assert not offenders, offenders

    losses = {}
    params = {}
    for name, runner in (("b", runner_b), ("st", runner_st)):
        s = fresh()
        arrs = sharded_arrays()
        ls = []
        for ep in range(3):
            s, arrs, ms = runner(s, arrs, ep == 0)
            ls.append(np.asarray(ms["loss"]))
        losses[name] = np.concatenate(ls)
        params[name] = s.params

    np.testing.assert_allclose(losses["b"], losses["st"], rtol=2e-4)
    for a, b in zip(
        jax.tree.leaves(params["b"]), jax.tree.leaves(params["st"])
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


@pytest.mark.slow
def test_st_fold_seq_model_matches_b_fold():
    """The st fold's LOCAL teacher-forcing tile (sequence modalities
    must tile t-major inside each shard): tiny MultiMNIST st-vs-b
    loss/grad parity under the mesh, with cross-recon on (the quality
    config for this model family)."""
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MultiMnistMVAE
    from mmvae_tpu.train import multi_term_loss

    model = MultiMnistMVAE(n_latents=8)
    ds = load_dataset("multimnist", n=16, seed=0)
    state = create_train_state(model, ds.arrays, jax.random.key(0), 1e-3)
    mesh = make_mesh()
    sharded = shard_batch(dict(ds.arrays), mesh)
    rng = jax.random.key(13)

    def loss_grads(fold, mesh_arg):
        def f(p):
            return multi_term_loss(
                model, p, sharded, rng, beta=0.6, term_fold=fold,
                mesh=mesh_arg, sample=True, cross_recon=True,
            )[0]

        # jit -- see test_st_fold_matches_b_fold_loss_and_grads.
        loss, grads = jax.jit(jax.value_and_grad(f))(state.params)
        return float(loss), grads

    lb, gb = loss_grads("b", None)
    ls, gs = loss_grads("st", mesh)
    np.testing.assert_allclose(lb, ls, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gb), jax.tree.leaves(gs)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


@pytest.mark.slow
def test_cycle_term_matches_b_fold_under_mesh():
    """The cycle term (now the multimnist/cub DEFAULT) composes with the
    mesh: st-vs-b loss/grad parity with cycle_weight>0 + render-grad +
    the contrast penalty. The cycle path runs on the global (B, L)
    unimodal z outside the shard_map'd decode+NLL pass, so it must be
    fold-invariant."""
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.models import MultiMnistMVAE
    from mmvae_tpu.train import multi_term_loss

    model = MultiMnistMVAE(n_latents=8)
    ds = load_dataset("multimnist", n=16, seed=0)
    state = create_train_state(model, ds.arrays, jax.random.key(0), 1e-3)
    mesh = make_mesh()
    sharded = shard_batch(dict(ds.arrays), mesh)
    rng = jax.random.key(17)

    def loss_grads(fold, mesh_arg):
        def f(p):
            return multi_term_loss(
                model, p, sharded, rng, beta=0.6, term_fold=fold,
                mesh=mesh_arg, sample=True, cross_recon=True,
                cycle_weight=1.0, cycle_render_grad=True,
                cycle_contrast_weight=2.0,
            )[0]

        # jit -- see test_st_fold_matches_b_fold_loss_and_grads.
        loss, grads = jax.jit(jax.value_and_grad(f))(state.params)
        return float(loss), grads

    lb, gb = loss_grads("b", None)
    ls, gs = loss_grads("st", mesh)
    np.testing.assert_allclose(lb, ls, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gb), jax.tree.leaves(gs)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_uint8_residency_composes_with_mesh(setup):
    """data_dtype="uint8" on the mesh fast path: uint8-resident arrays
    shuffle/slice as uint8 (quarter the f32 bytes), the in-program
    dequant runs inside the shard-local fold, and the 8-device run
    matches the single-device run on the same quantized data."""
    from mmvae_tpu.data import dataset_astype, load_dataset
    from mmvae_tpu.parallel import batch_sharding
    from mmvae_tpu.train import make_gather_epoch_runner

    model = MnistMVAE(n_latents=8)
    ds = dataset_astype(load_dataset("mnist", n=128, seed=0), jnp.uint8)
    assert ds.arrays["image"].dtype == jnp.uint8

    def fresh(arrays):
        return create_train_state(
            model,
            {k: v[:16] for k, v in arrays.items()},
            jax.random.key(0),
            1e-3,
        )

    runner = make_gather_epoch_runner(
        model, 8, 16, annealing_steps=10, reshuffle_every=4, n_shards=8
    )

    arrs1 = {k: jnp.array(v) for k, v in ds.arrays.items()}
    s1 = fresh(arrs1)
    losses1 = []
    for ep in range(2):
        s1, arrs1, ms = runner(s1, arrs1, ep == 0)
        losses1.append(np.asarray(ms["loss"]))
    assert arrs1["image"].dtype == jnp.uint8  # donated arrays stay u8

    mesh = make_mesh()
    sh = batch_sharding(mesh)
    arrs8 = {
        k: jax.device_put(np.asarray(v), sh) for k, v in ds.arrays.items()
    }
    s8 = replicate(fresh(ds.arrays), mesh)
    losses8 = []
    for ep in range(2):
        s8, arrs8, ms = runner(s8, arrs8, ep == 0)
        losses8.append(np.asarray(ms["loss"]))

    np.testing.assert_allclose(
        np.concatenate(losses1), np.concatenate(losses8), rtol=2e-4
    )


def test_mesh_sharded_eval_matches_single_device(setup):
    """Eval rides the data mesh (VERDICT r3 missing #5): the
    mesh-sharded split evaluator equals the single-device one modulo
    reduction order, including the presence-masked pad batch, and its
    program gathers no activations."""
    from mmvae_tpu import api

    model, _, fresh_state = setup
    ds = load_dataset("mnist", n=72, seed=1)  # 72 % 32 != 0: pad batch
    params = fresh_state().params

    ev1 = api._make_split_evaluator(model, ds, 32)
    assert ev1.mesh_active is False
    e1 = ev1(params)
    mesh = make_mesh()
    ev8 = api._make_split_evaluator(model, ds, 32, mesh=mesh)
    assert ev8.mesh_active is True
    np.testing.assert_allclose(ev8(params), e1, rtol=1e-5)

    # An odd batch size cannot split over 8 devices as-is: the batch
    # rows are padded UP to divisibility (36 -> 40) so the mesh still
    # engages instead of silently evaluating single-device (round-4
    # VERDICT weak #4); pad-masking keeps the metric exact.
    assert api._eval_mesh_sharding(mesh, 36) is None
    ev_up = api._make_split_evaluator(model, ds, 36, mesh=mesh)
    assert ev_up.mesh_active is True
    ref = api._make_split_evaluator(model, ds, 36)(params)
    np.testing.assert_allclose(ev_up(params), ref, rtol=1e-5)


def test_eval_segment_streaming_matches_whole_split(setup):
    """segment_steps > 0 (host-resident split, bounded HBM) equals the
    pre-stacked whole-split evaluator -- single-device AND mesh-sharded
    -- including an uneven tail that forces an all-pad segment."""
    from mmvae_tpu import api

    model, _, fresh_state = setup
    ds = load_dataset("mnist", n=72, seed=1, device_put=False)
    params = fresh_state().params

    whole = api._make_split_evaluator(model, ds, 16)(params)
    for steps in (2, 3):  # 5 batches: 3+2 and 2+2+1(padded)
        seg = api._make_split_evaluator(
            model, ds, 16, segment_steps=steps
        )(params)
        np.testing.assert_allclose(seg, whole, rtol=1e-6)
    mesh = make_mesh()
    seg_mesh = api._make_split_evaluator(
        model, ds, 16, mesh=mesh, segment_steps=2
    )
    assert seg_mesh.mesh_active is True
    np.testing.assert_allclose(seg_mesh(params), whole, rtol=1e-5)


def test_iwae_segment_streaming_matches_whole_split(setup):
    """Segmented IWAE keeps each batch's global rng fold index, so the
    estimate is identical to the whole-split run (modulo float sum
    order), on and off the mesh."""
    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    model, _, fresh_state = setup
    cfg = get_config("mnist").replace(n_latents=8, batch_size=16)
    ds = load_dataset("mnist", n=72, seed=1, device_put=False)
    params = fresh_state().params

    whole = api.log_likelihood(
        cfg, model=model, params=params, dataset=ds, k=8, seed=3
    )
    seg = api.log_likelihood(
        cfg, model=model, params=params, dataset=ds, k=8, seed=3,
        segment_steps=2,
    )
    np.testing.assert_allclose(seg, whole, rtol=1e-6)
    seg8 = api.log_likelihood(
        cfg, model=model, params=params, dataset=ds, k=8, seed=3,
        mesh=make_mesh(), segment_steps=2,
    )
    np.testing.assert_allclose(seg8, whole, rtol=1e-5)


def test_mesh_sharded_eval_program_no_allgather(setup):
    """The sharded eval program's only collective is the metric
    reduction -- the b-fold keeps the decode+NLL pass data-parallel on
    the eval side too."""
    from mmvae_tpu import api
    from mmvae_tpu.data import stacked_epoch_padded
    from mmvae_tpu.train import make_eval_runner

    model, _, fresh_state = setup
    ds = load_dataset("mnist", n=64, seed=1)
    mesh = make_mesh()
    batches, valid = stacked_epoch_padded(ds, 32)
    batches["presence"] = (
        valid[..., None] * jnp.ones((model.n_modalities,), valid.dtype)
    )
    sh = api._eval_mesh_sharding(mesh, 32)
    batches = {k: jax.device_put(v, sh) for k, v in batches.items()}
    runner = make_eval_runner(model, term_fold="b", mesh=mesh)
    params = replicate(fresh_state(), mesh).params
    txt = runner.lower(params, batches).compile().as_text()
    offenders = [
        line.strip()[:160]
        for line in txt.splitlines()
        if "all-gather" in line or "all-to-all" in line
    ]
    assert not offenders, offenders


def test_mesh_sharded_iwae_matches_single_device(setup):
    """IWAE over the data mesh: k importance samples per example
    compute shard-locally; the estimate matches single-device modulo
    reduction order."""
    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    model, _, fresh_state = setup
    cfg = get_config("mnist").replace(n_latents=8, batch_size=32)
    ds = load_dataset("mnist", n=72, seed=1)
    params = fresh_state().params

    ll1 = api.log_likelihood(
        cfg, model=model, params=params, dataset=ds, k=8, seed=3
    )
    ll8 = api.log_likelihood(
        cfg, model=model, params=params, dataset=ds, k=8, seed=3,
        mesh=make_mesh(),
    )
    np.testing.assert_allclose(ll8, ll1, rtol=1e-5)


def test_eval_elbo_api_takes_mesh(setup):
    """Public eval_elbo accepts a mesh like log_likelihood does."""
    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    model, _, fresh_state = setup
    cfg = get_config("mnist").replace(n_latents=8, batch_size=32)
    ds = load_dataset("mnist", n=64, seed=1)
    params = fresh_state().params
    e1 = api.eval_elbo(cfg, model=model, params=params, dataset=ds)
    e8 = api.eval_elbo(
        cfg, model=model, params=params, dataset=ds, mesh=make_mesh()
    )
    np.testing.assert_allclose(e8, e1, rtol=1e-5)
