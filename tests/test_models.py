"""Model-level shape/behavior tests for all five experiment MVAEs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.data import load_dataset
from mmvae_tpu.models import (
    CelebAMVAE,
    CubMVAE,
    FashionMnistMVAE,
    MnistMVAE,
    MultiMnistMVAE,
)

CASES = [
    ("mnist", MnistMVAE(n_latents=8), 2),
    ("fashionmnist", FashionMnistMVAE(n_latents=8), 2),
    ("multimnist", MultiMnistMVAE(n_latents=8), 2),
    ("celeba", CelebAMVAE(n_latents=8), 19),
    ("cub", CubMVAE(n_latents=8, vocab_size=32), 2),
]


@pytest.fixture(scope="module")
def batches():
    return {
        name: load_dataset(name, n=4, seed=0).arrays
        for name, _, _ in CASES
    }


@pytest.mark.parametrize("name,model,n_mod", CASES, ids=[c[0] for c in CASES])
def test_encode_decode_shapes(name, model, n_mod, batches):
    batch = batches[name]
    variables = model.init(jax.random.key(0), batch, rng=jax.random.key(1))
    mu, lv = model.apply(variables, batch, method="encode")
    assert mu.shape == (4, n_mod, 8)
    assert lv.shape == (4, n_mod, 8)
    z = jnp.zeros((4, 8))
    recons = model.apply(variables, z, batch, method="decode")
    nll = model.apply(variables, recons, batch, method="nll_all")
    assert nll.shape == (n_mod, 4)
    assert bool(jnp.all(jnp.isfinite(nll)))


@pytest.mark.parametrize("name,model,n_mod", CASES, ids=[c[0] for c in CASES])
def test_forward_contract(name, model, n_mod, batches):
    """Forward decodes EVERY modality regardless of presence (SURVEY 3b)."""
    batch = batches[name]
    variables = model.init(jax.random.key(0), batch, rng=jax.random.key(1))
    presence = jnp.zeros((4, n_mod)).at[:, 0].set(1.0)  # image only
    recons, mu, lv = model.apply(
        variables, batch, presence, jax.random.key(2), True
    )
    assert mu.shape == (4, 8)
    assert set(recons) == set(batch)  # all modalities decoded


@pytest.mark.parametrize("name,model,n_mod", CASES, ids=[c[0] for c in CASES])
def test_dummy_batch_matches_real(name, model, n_mod, batches):
    real = batches[name]
    dummy = model.dummy_batch(4)
    assert set(dummy) == set(real)
    for k in real:
        assert dummy[k].shape == real[k].shape, k


def test_seq_generate_stops_and_pads(batches):
    model = MultiMnistMVAE(n_latents=8)
    batch = batches["multimnist"]
    variables = model.init(jax.random.key(0), batch, rng=jax.random.key(1))
    z = jax.random.normal(jax.random.key(3), (6, 8))
    toks = model.apply(
        variables, z, jax.random.key(4), 1.0, method="generate_text"
    )
    assert toks.shape == (6, model.max_len)
    toks = np.asarray(toks)
    for row in toks:
        stops = np.where(row == 2)[0]
        if len(stops):
            assert (row[stops[0] + 1 :] == 0).all()  # PAD after STOP


def test_attribute_bank_is_per_attribute():
    """Each CelebA attribute expert must see only its own attribute."""
    model = CelebAMVAE(n_latents=8)
    batch = model.dummy_batch(2)
    variables = model.init(jax.random.key(0), batch, rng=jax.random.key(1))
    a0 = jnp.zeros((2, 18))
    a1 = a0.at[:, 7].set(1.0)  # flip attribute 7 only
    mu0, _ = model.apply(variables, dict(batch, attrs=a0), method="encode")
    mu1, _ = model.apply(variables, dict(batch, attrs=a1), method="encode")
    diff = jnp.abs(mu0 - mu1).sum(axis=-1)  # (B, 19)
    changed = np.asarray(diff > 1e-7)
    # Only the attr_7 expert (modality index 1+7=8) changes.
    assert changed[:, 8].all()
    assert not changed[:, [i for i in range(19) if i != 8]].any()


@pytest.mark.slow
def test_bfloat16_compute_path():
    """bf16 expert compute (MXU throughput mode); loss math stays f32."""
    import jax
    from mmvae_tpu.train import create_train_state, make_train_step

    model = MnistMVAE(n_latents=8, dtype=jnp.bfloat16)
    ds = load_dataset("mnist", n=16, seed=0)
    state = create_train_state(model, ds.arrays, jax.random.key(0))
    step = make_train_step(model, annealing_steps=5)
    state, m = step(state, ds.arrays)
    assert m["loss"].dtype == jnp.float32
    assert np.isfinite(float(m["loss"]))
    # params stayed f32
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.dtype == jnp.float32


@pytest.mark.slow
def test_cub_high_resolution():
    """CUB scales to 128x128 via image_hw + a deeper conv stack
    (docs/STATUS.md round-3 candidate; reference crop size is
    unverifiable while the mount is empty, so the knob must work)."""
    import jax
    from mmvae_tpu.models import CubMVAE
    from mmvae_tpu.train import multi_term_loss

    m = CubMVAE(
        n_latents=16,
        image_hw=(128, 128),
        conv_features=(16, 32, 64, 128, 256),
    )
    b = m.dummy_batch(2)
    v = m.init(jax.random.key(0), b, rng=jax.random.key(1))
    loss, _ = multi_term_loss(
        m, v["params"], b, jax.random.key(2), beta=0.5
    )
    assert np.isfinite(float(loss))


def test_celeba_space_to_depth_variant_trains():
    """space_to_depth=2 (MXU-friendly input/output conv stages) keeps
    shapes and parameter count (within bias-size noise) and trains to a
    finite loss; it is a perf knob, not a different model family."""
    import jax
    import numpy as np

    from mmvae_tpu.models import CelebAMVAE
    from mmvae_tpu.train import create_train_state, make_train_step

    counts = {}
    for s2d in (1, 2):
        model = CelebAMVAE(
            n_latents=16, image_hw=(16, 16), conv_features=(8, 16),
            space_to_depth=s2d,
        )
        batch = model.dummy_batch(4)
        state = create_train_state(
            model, batch, jax.random.key(0), 1e-3
        )
        counts[s2d] = sum(
            x.size for x in jax.tree.leaves(state.params)
        )
        step = make_train_step(model, annealing_steps=5)
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        recons = model.apply(
            {"params": state.params},
            model.dummy_batch(2),
            rng=jax.random.key(1),
        )[0]
        assert recons["image"].shape == (2, 16, 16, 3)
    # 2x2/1-over-4C and 4x4/2-over-C stages have identical filter
    # parameter counts; only the tiny output-stage bias differs.
    assert abs(counts[1] - counts[2]) < 32


def test_celeba_pixel_shuffle_decoder_variant_trains():
    """upsample_mode="shuffle" (2x2/1 conv + depth-to-space replacing
    every 4x4/2 transposed conv) keeps output shapes and filter
    parameter count (2*2*C_in*4F == 4*4*C_in*F; only per-stage bias
    widths differ) and trains to a finite loss. Perf knob targeting the
    lhs-dilation waste in XLA's ConvTranspose lowering, not a different
    model family."""
    import jax
    import numpy as np

    from mmvae_tpu.models import CelebAMVAE
    from mmvae_tpu.train import create_train_state, make_train_step

    counts = {}
    for mode in ("deconv", "shuffle"):
        model = CelebAMVAE(
            n_latents=16, image_hw=(16, 16), conv_features=(8, 16),
            upsample_mode=mode,
        )
        batch = model.dummy_batch(4)
        state = create_train_state(
            model, batch, jax.random.key(0), 1e-3
        )
        counts[mode] = sum(
            x.size for x in jax.tree.leaves(state.params)
        )
        step = make_train_step(model, annealing_steps=5)
        state, m = step(state, batch)
        assert np.isfinite(float(m["loss"]))
        recons = model.apply(
            {"params": state.params},
            model.dummy_batch(2),
            rng=jax.random.key(1),
        )[0]
        assert recons["image"].shape == (2, 16, 16, 3)
    # Filter params match exactly; the shuffle stages carry 4x-wide
    # biases (4F vs F per stage), a few-hundred-element delta here.
    assert abs(counts["deconv"] - counts["shuffle"]) < 4 * sum(
        (8, 16)
    ) + 4 * 3


def test_multimnist_text_latent_factorization():
    """text_latent_dims=K: the text expert constrains only the first K
    latent dims -- the text-only PoE posterior on the style dims is the
    PRIOR (mu ~ 0, sigma ~ 1), so text-conditioned generation samples a
    concrete style/position instead of the posterior-mean haze."""
    import jax
    import numpy as np

    from mmvae_tpu.core.poe import product_of_experts
    from mmvae_tpu.models import MultiMnistMVAE

    model = MultiMnistMVAE(n_latents=32, text_latent_dims=8)
    batch = model.dummy_batch(4)
    v = model.init(jax.random.key(0), batch, rng=jax.random.key(1))
    mu_e, lv_e = model.apply(v, batch, method="encode")
    mask = np.zeros((4, 2), np.float32)
    mask[:, 1] = 1.0  # text only
    mu, lv = product_of_experts(mu_e, lv_e, mask=mask)
    # Style dims: prior exactly (text precision ~1.7e-5).
    np.testing.assert_allclose(np.asarray(mu[:, 8:]), 0.0, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(np.exp(0.5 * lv[:, 8:])), 1.0, atol=1e-3
    )
    # Content dims: the text expert actually moves them (freshly
    # initialized net: nonzero but small -- just assert it differs
    # from the prior posture on at least some dims).
    assert float(np.abs(np.asarray(lv[:, :8])).max()) > 1e-3
