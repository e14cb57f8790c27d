"""Full-model ELBO parity: JAX MnistMVAE vs eager-PyTorch fixture on
identical weights and inputs -- the in-repo check of the BASELINE.json
1%-parity requirement (SURVEY.md section 4, "Parity" row).
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

torch = pytest.importorskip("torch")

from torch_fixture import (  # noqa: E402
    TorchMnistMVAE,
    copy_flax_params_to_torch,
    torch_multi_term_loss,
)

from mmvae_tpu.data import load_dataset  # noqa: E402
from mmvae_tpu.models import MnistMVAE  # noqa: E402
from mmvae_tpu.train import multi_term_loss  # noqa: E402


@pytest.fixture(scope="module")
def matched_models():
    model = MnistMVAE(n_latents=16)
    ds = load_dataset("mnist", n=32, seed=0, device_put=False)
    batch = {
        "image": jnp.asarray(ds.arrays["image"]),
        "label": jnp.asarray(ds.arrays["label"]),
    }
    variables = model.init(jax.random.key(0), batch, rng=jax.random.key(1))
    tmodel = TorchMnistMVAE(n_latents=16)
    copy_flax_params_to_torch(variables["params"], tmodel)
    tmodel.eval()
    timage = torch.from_numpy(np.asarray(ds.arrays["image"]))
    tlabel = torch.from_numpy(np.asarray(ds.arrays["label"])).long()
    return model, variables["params"], batch, tmodel, timage, tlabel


def test_encoders_match(matched_models):
    model, params, batch, tmodel, timage, tlabel = matched_models
    mu, lv = model.apply({"params": params}, batch, method="encode")
    with torch.no_grad():
        tmu_i, tlv_i = tmodel.image_enc(timage)
        tmu_l, tlv_l = tmodel.label_enc(tlabel)
    np.testing.assert_allclose(mu[:, 0], tmu_i.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(mu[:, 1], tmu_l.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(lv[:, 0], tlv_i.numpy(), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("beta", [1.0, 0.37])
def test_full_elbo_parity_within_1pct(matched_models, beta):
    """The headline check: multi-term ELBO agree within much better than
    the 1% budget [B:5] on identical weights/inputs (eval mode, z=mu)."""
    model, params, batch, tmodel, timage, tlabel = matched_models
    loss_jax, _ = multi_term_loss(
        model, params, batch, jax.random.key(0), beta=beta, sample=False
    )
    with torch.no_grad():
        loss_torch = torch_multi_term_loss(
            tmodel, timage, tlabel, beta=beta, sample=False
        )
    rel = abs(float(loss_jax) - float(loss_torch)) / abs(float(loss_torch))
    assert rel < 1e-3, (float(loss_jax), float(loss_torch), rel)


def test_per_term_parity(matched_models):
    """Term-by-term agreement pins lambda/reduction/annealing conventions
    (the failure modes SURVEY.md section 7 calls out)."""
    from torch_fixture import torch_elbo_term

    model, params, batch, tmodel, timage, tlabel = matched_models
    _, metrics = multi_term_loss(
        model, params, batch, jax.random.key(0), beta=1.0, sample=False
    )
    with torch.no_grad():
        ri, rl, mu, lv = tmodel(timage, tlabel, sample=False)
        joint = torch_elbo_term(ri, timage, rl, tlabel, mu, lv).mean()
        ri2, _, mu2, lv2 = tmodel(timage, None, sample=False)
        img_t = torch_elbo_term(ri2, timage, None, None, mu2, lv2).mean()
        _, rl3, mu3, lv3 = tmodel(None, tlabel, sample=False)
        lab_t = torch_elbo_term(None, None, rl3, tlabel, mu3, lv3).mean()
    got = np.asarray(metrics["elbo_per_term"])
    want = np.asarray([joint.item(), img_t.item(), lab_t.item()])
    np.testing.assert_allclose(got, want, rtol=1e-3)
