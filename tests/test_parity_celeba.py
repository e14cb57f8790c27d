"""CelebA full-model ELBO parity: JAX 19-expert MVAE vs eager PyTorch on
identical weights/inputs (the second config named by the parity metric
[B:2]). Covers the conv/deconv/attr-bank paths the MNIST parity test
doesn't touch.

Layout mappings (verified empirically):
  * Conv:           torch.weight = flax_kernel.transpose(3,2,0,1)
  * ConvTranspose:  torch.weight = flax_kernel[::-1,::-1].transpose(2,3,0,1)
  * flatten:        flax is NHWC-ordered, torch NCHW -- fc weights are
                    re-ordered accordingly on both sides of the bottleneck.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from mmvae_tpu.data import load_dataset  # noqa: E402
from mmvae_tpu.models import CelebAMVAE  # noqa: E402
from mmvae_tpu.train import multi_term_loss  # noqa: E402

N_LAT = 16
FEATS = (32, 64, 128, 256)


def swish(x):
    return x * torch.sigmoid(x)


class TorchCelebABank(torch.nn.Module):
    """Torch twin of CelebAMVAE: conv/deconv image experts + einsum
    attribute banks with the SAME parameterization as the flax model."""

    def __init__(self, params):
        super().__init__()
        p = jax.tree.map(
            lambda a: torch.from_numpy(np.array(a, copy=True)), params
        )
        self.p = p

    # ---- image encoder ----
    def image_encode(self, x):  # x: (B, 64, 64, 3)
        h = x.permute(0, 3, 1, 2)
        enc = self.p["image_enc"]
        for i in range(4):
            w = enc[f"Conv_{i}"]["kernel"].permute(3, 2, 0, 1)
            b = enc[f"Conv_{i}"]["bias"]
            h = swish(torch.nn.functional.conv2d(h, w, b, stride=2,
                                                 padding=1))
        # flax flattens NHWC; emulate by permuting back before flatten.
        h = h.permute(0, 2, 3, 1).flatten(1)
        h = swish(h @ enc["Dense_0"]["kernel"] + enc["Dense_0"]["bias"])
        o = h @ enc["Dense_1"]["kernel"] + enc["Dense_1"]["bias"]
        return o[:, :N_LAT], o[:, N_LAT:]

    # ---- attr encoder bank ----
    def attr_encode(self, attrs):  # (B, 18)
        p = self.p["attr_enc"]
        a = attrs[..., None]
        h0 = p["embed"][None, :, 0, :] * (1 - a) + p["embed"][None, :, 1, :] * a
        h = swish(torch.einsum("bae,aeh->bah", h0, p["w1"]) + p["b1"][None])
        o = torch.einsum("bah,aho->bao", h, p["w2"]) + p["b2"][None]
        return o[..., :N_LAT], o[..., N_LAT:]

    # ---- image decoder ----
    def image_decode(self, z):
        dec = self.p["image_dec"]
        h = swish(z @ dec["Dense_0"]["kernel"] + dec["Dense_0"]["bias"])
        h = swish(h @ dec["Dense_1"]["kernel"] + dec["Dense_1"]["bias"])
        # flax reshapes to NHWC (4, 4, 256); emulate then go NCHW.
        h = h.view(-1, 4, 4, FEATS[-1]).permute(0, 3, 1, 2)
        for i, _feat in enumerate(FEATS[-2::-1]):  # 128, 64, 32
            k = self.p["image_dec"][f"ConvTranspose_{i}"]["kernel"]
            w = torch.flip(k, dims=(0, 1)).permute(2, 3, 0, 1)
            b = self.p["image_dec"][f"ConvTranspose_{i}"]["bias"]
            h = swish(torch.nn.functional.conv_transpose2d(
                h, w, b, stride=2, padding=1))
        k = self.p["image_dec"]["ConvTranspose_3"]["kernel"]
        w = torch.flip(k, dims=(0, 1)).permute(2, 3, 0, 1)
        b = self.p["image_dec"]["ConvTranspose_3"]["bias"]
        h = torch.nn.functional.conv_transpose2d(h, w, b, stride=2,
                                                 padding=1)
        return h.permute(0, 2, 3, 1)  # (B, 64, 64, 3) logits

    def attr_decode(self, z):
        p = self.p["attr_dec"]
        h = swish(torch.einsum("bl,alh->bah", z, p["w1"]) + p["b1"][None])
        return torch.einsum("bah,ah->ba", h, p["w2"]) + p["b2"][None]


def torch_poe(mus, lvs, eps=1e-8):
    t = 1.0 / (torch.exp(lvs) + eps)
    total = t.sum(1)
    return (mus * t).sum(1) / total, torch.log(1.0 / total)


@pytest.fixture(scope="module")
def matched():
    model = CelebAMVAE(n_latents=N_LAT)
    ds = load_dataset("celeba", n=8, seed=0, device_put=False)
    batch = {
        "image": jnp.asarray(ds.arrays["image"]),
        "attrs": jnp.asarray(ds.arrays["attrs"]),
    }
    variables = model.init(jax.random.key(0), batch, rng=jax.random.key(1))
    tw = TorchCelebABank(variables["params"])
    timg = torch.from_numpy(np.asarray(ds.arrays["image"]))
    tattrs = torch.from_numpy(np.asarray(ds.arrays["attrs"]))
    return model, variables["params"], batch, tw, timg, tattrs


def test_image_encoder_parity(matched):
    model, params, batch, tw, timg, tattrs = matched
    mu, lv = model.apply({"params": params}, batch, method="encode")
    with torch.no_grad():
        tmu, tlv = tw.image_encode(timg)
    np.testing.assert_allclose(
        mu[:, 0], tmu.numpy(), rtol=2e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        lv[:, 0], tlv.numpy(), rtol=2e-3, atol=5e-4
    )


def test_attr_bank_parity(matched):
    model, params, batch, tw, timg, tattrs = matched
    mu, lv = model.apply({"params": params}, batch, method="encode")
    with torch.no_grad():
        tmu, tlv = tw.attr_encode(tattrs)
    np.testing.assert_allclose(
        mu[:, 1:], tmu.numpy(), rtol=2e-3, atol=5e-4
    )


def test_decoder_parity(matched):
    model, params, batch, tw, timg, tattrs = matched
    z = jnp.asarray(
        np.random.default_rng(5).normal(size=(8, N_LAT)).astype(np.float32)
    )
    recons = model.apply({"params": params}, z, batch, method="decode")
    with torch.no_grad():
        t_img = tw.image_decode(torch.from_numpy(np.asarray(z)))
        t_attr = tw.attr_decode(torch.from_numpy(np.asarray(z)))
    np.testing.assert_allclose(
        recons["image"], t_img.numpy(), rtol=5e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        recons["attrs"], t_attr.numpy(), rtol=5e-3, atol=2e-3
    )


def test_full_elbo_parity_within_1pct(matched):
    """20-term ELBO (joint + 19 unimodal), eval mode, identical weights:
    must agree well inside the 1% budget [B:5]."""
    model, params, batch, tw, timg, tattrs = matched
    loss_jax, _ = multi_term_loss(
        model, params, batch, jax.random.key(0), beta=0.7, sample=False
    )

    lam_img, lam_attr, beta = 1.0, 10.0, 0.7
    n_mod = 19
    with torch.no_grad():
        mu_i, lv_i = tw.image_encode(timg)
        mu_a, lv_a = tw.attr_encode(tattrs)
        mus = torch.cat([mu_i[:, None], mu_a], dim=1)  # (B, 19, L)
        lvs = torch.cat([lv_i[:, None], lv_a], dim=1)
        prior = torch.zeros_like(mus[:, :1])
        total = torch.zeros(timg.shape[0])
        subsets = [[True] * n_mod] + [
            [i == m for i in range(n_mod)] for m in range(n_mod)
        ]
        for subset in subsets:
            sel = [prior] + [
                mus[:, i : i + 1] for i in range(n_mod) if subset[i]
            ]
            sel_lv = [prior] + [
                lvs[:, i : i + 1] for i in range(n_mod) if subset[i]
            ]
            mu, lv = torch_poe(torch.cat(sel, 1), torch.cat(sel_lv, 1))
            z = mu
            loss = torch.zeros(timg.shape[0])
            if subset[0]:
                ri = tw.image_decode(z)
                loss = loss + lam_img * torch.nn.functional.binary_cross_entropy_with_logits(
                    ri.flatten(1), timg.flatten(1), reduction="none"
                ).sum(-1)
            ra = tw.attr_decode(z)
            for i in range(18):
                if subset[1 + i]:
                    loss = loss + lam_attr * torch.nn.functional.binary_cross_entropy_with_logits(
                        ra[:, i], tattrs[:, i], reduction="none"
                    )
            kl = -0.5 * torch.sum(1 + lv - mu.pow(2) - lv.exp(), dim=-1)
            total = total + loss + beta * kl
        loss_torch = total.mean()

    rel = abs(float(loss_jax) - float(loss_torch)) / abs(float(loss_torch))
    assert rel < 2e-3, (float(loss_jax), float(loss_torch), rel)
