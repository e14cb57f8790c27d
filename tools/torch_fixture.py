"""Eager-PyTorch MVAE fixture: parity oracle + CPU throughput baseline.

This is a *test fixture and baseline generator*, not product code
(SURVEY.md section 4): a minimal reference-family PyTorch MVAE matching
``mmvae_tpu.models.mnist.MnistMVAE`` layer-for-layer, used to

  1. assert per-term ELBO agreement between the JAX model and eager torch
     on identical weights/inputs (the BASELINE.json parity requirement,
     checked in-repo since the reference mount is empty, SURVEY.md 0), and
  2. measure the PyTorch-CPU samples/sec that the >=10x throughput target
     is defined against ([B:2], [B:5]); numbers recorded in BASELINE.md.

Mirrors the reference's structure as reconstructed in SURVEY.md 2.1-2.3,
3a: PoE with explicit prior expert, eps=1e-8 precision, Swish MLPs,
3-term ELBO (joint + image-only + label-only), lambda_image=1,
lambda_label=10, linear KL annealing.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def swish(x):
    return x * torch.sigmoid(x)


class TorchMLPEncoder(nn.Module):
    def __init__(self, in_dim, n_latents, hidden=(512, 512)):
        super().__init__()
        dims = [in_dim] + list(hidden)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])
        )
        self.out = nn.Linear(hidden[-1], 2 * n_latents)
        self.n_latents = n_latents

    def forward(self, x):
        h = x.reshape(x.shape[0], -1)
        for layer in self.layers:
            h = swish(layer(h))
        o = self.out(h)
        return o[:, : self.n_latents], o[:, self.n_latents :]


class TorchMLPDecoder(nn.Module):
    def __init__(self, n_latents, out_dim, hidden=(512, 512)):
        super().__init__()
        dims = [n_latents] + list(hidden)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])
        )
        self.out = nn.Linear(hidden[-1], out_dim)

    def forward(self, z):
        h = z
        for layer in self.layers:
            h = swish(layer(h))
        return self.out(h)


class TorchLabelEncoder(nn.Module):
    def __init__(self, n_classes, n_latents, embed_dim=512, hidden=(512,)):
        super().__init__()
        self.embed = nn.Embedding(n_classes, embed_dim)
        dims = [embed_dim] + list(hidden)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])
        )
        self.out = nn.Linear(hidden[-1], 2 * n_latents)
        self.n_latents = n_latents

    def forward(self, y):
        h = self.embed(y)
        for layer in self.layers:
            h = swish(layer(h))
        o = self.out(h)
        return o[:, : self.n_latents], o[:, self.n_latents :]


class TorchLabelDecoder(nn.Module):
    def __init__(self, n_latents, n_classes, hidden=(512,)):
        super().__init__()
        dims = [n_latents] + list(hidden)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])
        )
        self.out = nn.Linear(hidden[-1], n_classes)

    def forward(self, z):
        h = z
        for layer in self.layers:
            h = swish(layer(h))
        return self.out(h)


def torch_poe(mus, logvars, eps: float = 1e-8):
    """PoE over a stacked (B, n_experts, L) tensor incl. explicit prior."""
    var = torch.exp(logvars) + eps
    t = 1.0 / var
    total = t.sum(dim=1)
    mu = (mus * t).sum(dim=1) / total
    return mu, torch.log(1.0 / total)


class TorchMnistMVAE(nn.Module):
    """Reference-family MNIST image+label MVAE (SURVEY.md 2.3)."""

    def __init__(self, n_latents=64, n_classes=10, img_dim=784):
        super().__init__()
        self.n_latents = n_latents
        self.image_enc = TorchMLPEncoder(img_dim, n_latents)
        self.image_dec = TorchMLPDecoder(n_latents, img_dim)
        self.label_enc = TorchLabelEncoder(n_classes, n_latents)
        self.label_dec = TorchLabelDecoder(n_latents, n_classes)

    def infer(self, image=None, label=None):
        batch = image.shape[0] if image is not None else label.shape[0]
        mus = [torch.zeros(batch, 1, self.n_latents)]
        lvs = [torch.zeros(batch, 1, self.n_latents)]
        if image is not None:
            m, l = self.image_enc(image)
            mus.append(m[:, None]); lvs.append(l[:, None])
        if label is not None:
            m, l = self.label_enc(label)
            mus.append(m[:, None]); lvs.append(l[:, None])
        return torch_poe(torch.cat(mus, 1), torch.cat(lvs, 1))

    def forward(self, image=None, label=None, sample=True):
        mu, logvar = self.infer(image, label)
        if sample:
            z = mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
        else:
            z = mu
        return self.image_dec(z), self.label_dec(z), mu, logvar


def torch_elbo_term(
    recon_image, image, recon_label, label, mu, logvar,
    lambda_image=1.0, lambda_label=10.0, beta=1.0,
):
    """One ELBO term; recon only for the modalities present (SURVEY 2.8)."""
    loss = torch.zeros(mu.shape[0])
    if image is not None:
        loss = loss + lambda_image * F.binary_cross_entropy_with_logits(
            recon_image, image.reshape(image.shape[0], -1), reduction="none"
        ).sum(-1)
    if label is not None:
        loss = loss + lambda_label * F.cross_entropy(
            recon_label, label, reduction="none"
        )
    kl = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp(), dim=-1)
    return loss + beta * kl


def torch_multi_term_loss(model, image, label, beta=1.0, sample=False):
    """Joint + image-only + label-only, summed, batch mean (SURVEY 3a)."""
    ri, rl, mu, lv = model(image, label, sample=sample)
    joint = torch_elbo_term(ri, image, rl, label, mu, lv, beta=beta)
    ri2, _, mu2, lv2 = model(image, None, sample=sample)
    img_t = torch_elbo_term(ri2, image, None, None, mu2, lv2, beta=beta)
    _, rl3, mu3, lv3 = model(None, label, sample=sample)
    lab_t = torch_elbo_term(None, None, rl3, label, mu3, lv3, beta=beta)
    return (joint + img_t + lab_t).mean()


def copy_flax_params_to_torch(params: dict, model: TorchMnistMVAE) -> None:
    """Load the flax MnistMVAE param tree into the torch fixture.

    Flax Dense kernels are (in, out); torch Linear weights are (out, in).
    """

    def set_linear(linear, dense):
        with torch.no_grad():
            linear.weight.copy_(
                torch.from_numpy(np.asarray(dense["kernel"]).T)
            )
            linear.bias.copy_(torch.from_numpy(np.asarray(dense["bias"])))

    ie = params["image_enc"]
    set_linear(model.image_enc.layers[0], ie["Dense_0"])
    set_linear(model.image_enc.layers[1], ie["Dense_1"])
    set_linear(model.image_enc.out, ie["Dense_2"])
    idp = params["image_dec"]
    set_linear(model.image_dec.layers[0], idp["Dense_0"])
    set_linear(model.image_dec.layers[1], idp["Dense_1"])
    set_linear(model.image_dec.out, idp["Dense_2"])
    le = params["label_enc"]
    with torch.no_grad():
        model.label_enc.embed.weight.copy_(
            torch.from_numpy(np.asarray(le["Embed_0"]["embedding"]))
        )
    set_linear(model.label_enc.layers[0], le["Dense_0"])
    set_linear(model.label_enc.out, le["Dense_1"])
    ld = params["label_dec"]
    set_linear(model.label_dec.layers[0], ld["Dense_0"])
    set_linear(model.label_dec.out, ld["Dense_1"])


# ----------------------------------------------------------------------
# CelebA conv fixture (throughput baseline for the second headline
# metric [B:2]). Mirrors the reference's structure: deep conv enc/dec +
# 18 SEPARATE per-attribute expert modules, and the multi-forward
# training step (joint + each unimodal + k random subsets) -- the
# reference's actual hot-loop cost on CPU (SURVEY.md 2.6, 3a).
# ----------------------------------------------------------------------


class TorchConvEncoder(nn.Module):
    def __init__(self, n_latents, in_ch=3, feats=(32, 64, 128, 256)):
        super().__init__()
        chans = [in_ch] + list(feats)
        self.convs = nn.ModuleList(
            nn.Conv2d(a, b, 4, stride=2, padding=1)
            for a, b in zip(chans[:-1], chans[1:])
        )
        self.fc = nn.Linear(feats[-1] * 4 * 4, 512)
        self.out = nn.Linear(512, 2 * n_latents)
        self.n_latents = n_latents

    def forward(self, x):  # x: (B, H, W, 3) in [0,1]
        h = x.permute(0, 3, 1, 2)
        for conv in self.convs:
            h = swish(conv(h))
        h = swish(self.fc(h.flatten(1)))
        o = self.out(h)
        return o[:, : self.n_latents], o[:, self.n_latents :]


class TorchDeconvDecoder(nn.Module):
    def __init__(self, n_latents, out_ch=3, feats=(256, 128, 64, 32)):
        super().__init__()
        self.fc1 = nn.Linear(n_latents, 512)
        self.fc2 = nn.Linear(512, feats[0] * 4 * 4)
        self.feats = feats
        chans = list(feats) + [out_ch]
        self.deconvs = nn.ModuleList(
            nn.ConvTranspose2d(a, b, 4, stride=2, padding=1)
            for a, b in zip(chans[:-1], chans[1:])
        )

    def forward(self, z):
        h = swish(self.fc2(swish(self.fc1(z))))
        h = h.view(z.shape[0], self.feats[0], 4, 4)
        for deconv in self.deconvs[:-1]:
            h = swish(deconv(h))
        h = self.deconvs[-1](h)
        return h.permute(0, 2, 3, 1)  # (B, H, W, 3) logits


class TorchAttrEncoder(nn.Module):
    """One tiny Gaussian expert for one binary attribute."""

    def __init__(self, n_latents, hidden=64):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(1, hidden), nn.SiLU(), nn.Linear(hidden, 2 * n_latents)
        )
        self.n_latents = n_latents

    def forward(self, a):  # (B,) float
        o = self.net(a[:, None])
        return o[:, : self.n_latents], o[:, self.n_latents :]


class TorchAttrDecoder(nn.Module):
    def __init__(self, n_latents, hidden=64):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(n_latents, hidden), nn.SiLU(), nn.Linear(hidden, 1)
        )

    def forward(self, z):
        return self.net(z)[:, 0]


class TorchCelebAMVAE(nn.Module):
    """Reference-family CelebA MVAE: image + 18 attribute experts."""

    def __init__(self, n_latents=100, n_attrs=18):
        super().__init__()
        self.n_latents = n_latents
        self.n_attrs = n_attrs
        self.image_enc = TorchConvEncoder(n_latents)
        self.image_dec = TorchDeconvDecoder(n_latents)
        self.attr_encs = nn.ModuleList(
            TorchAttrEncoder(n_latents) for _ in range(n_attrs)
        )
        self.attr_decs = nn.ModuleList(
            TorchAttrDecoder(n_latents) for _ in range(n_attrs)
        )

    def infer(self, image=None, attrs=None, attr_mask=None):
        batch = image.shape[0] if image is not None else attrs.shape[0]
        mus = [torch.zeros(batch, 1, self.n_latents)]
        lvs = [torch.zeros(batch, 1, self.n_latents)]
        if image is not None:
            m, l = self.image_enc(image)
            mus.append(m[:, None]); lvs.append(l[:, None])
        if attrs is not None:
            for i, enc in enumerate(self.attr_encs):
                if attr_mask is None or attr_mask[i]:
                    m, l = enc(attrs[:, i])
                    mus.append(m[:, None]); lvs.append(l[:, None])
        return torch_poe(torch.cat(mus, 1), torch.cat(lvs, 1))

    def forward(self, image=None, attrs=None, attr_mask=None, sample=True):
        mu, logvar = self.infer(image, attrs, attr_mask)
        z = (
            mu + torch.randn_like(mu) * torch.exp(0.5 * logvar)
            if sample
            else mu
        )
        recon_attrs = torch.stack(
            [dec(z) for dec in self.attr_decs], dim=1
        )
        return self.image_dec(z), recon_attrs, mu, logvar


def torch_celeba_elbo_term(
    recon_image, image, recon_attrs, attrs, subset, mu, logvar,
    lambda_image=1.0, lambda_attr=10.0, beta=1.0,
):
    """subset: bool list over [image, attr_0..17]."""
    loss = torch.zeros(mu.shape[0])
    if subset[0]:
        loss = loss + lambda_image * F.binary_cross_entropy_with_logits(
            recon_image.flatten(1), image.flatten(1), reduction="none"
        ).sum(-1)
    for i in range(attrs.shape[1]):
        if subset[1 + i]:
            loss = loss + lambda_attr * F.binary_cross_entropy_with_logits(
                recon_attrs[:, i], attrs[:, i], reduction="none"
            )
    kl = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp(), dim=-1)
    return loss + beta * kl


def torch_celeba_multi_term_loss(
    model, image, attrs, beta=1.0, n_random_subsets=4, sample=True,
    generator=None,
):
    """Reference hot loop: one forward per subset (joint + 19 unimodal +
    k random) -- the multi-forward structure SURVEY.md 3a describes."""
    n_mod = 1 + model.n_attrs
    subsets = [[True] * n_mod]
    for m in range(n_mod):
        subsets.append([i == m for i in range(n_mod)])
    for _ in range(n_random_subsets):
        bits = torch.randint(0, 2, (n_mod,), generator=generator)
        subsets.append([bool(b) for b in bits])
    total = torch.zeros(image.shape[0])
    for subset in subsets:
        img_in = image if subset[0] else None
        attr_in = attrs if any(subset[1:]) else None
        ri, ra, mu, lv = model(
            img_in, attr_in, attr_mask=subset[1:], sample=sample
        )
        total = total + torch_celeba_elbo_term(
            ri, image, ra, attrs, subset, mu, lv, beta=beta
        )
    return total.mean()


# ----------------------------------------------------------------------
# Trainable CelebA twin: a parameter-registered torch module built
# DIRECTLY from a flax CelebAMVAE param tree. Weights stay in flax
# layout (kernels HWIO / einsum banks); forward does the permutes --
# the exact mappings tests/test_parity_celeba.py verified empirically.
# Exists for trained-TRAJECTORY parity (tools/trajectory_parity.py):
# unlike TorchCelebAMVAE above (independent random init, separate attr
# modules), this twin starts weight-identical to the JAX model and its
# parameters are registered, so torch Adam can train it.
# ----------------------------------------------------------------------


class TorchCelebATwin(nn.Module):
    def __init__(self, flax_params, n_latents, feats=(32, 64, 128, 256)):
        super().__init__()
        self.n_latents = n_latents
        self.feats = tuple(feats)
        self.params = nn.ParameterDict()
        self._register("", flax_params)

    def _register(self, prefix, tree):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                self._register(key, v)
            else:
                self.params[key] = nn.Parameter(
                    torch.from_numpy(np.array(v, copy=True))
                )

    def _p(self, key):
        return self.params[key]

    def image_encode(self, x):  # (B, 64, 64, 3) NHWC in [0,1]
        h = x.permute(0, 3, 1, 2)
        for i in range(len(self.feats)):
            w = self._p(f"image_enc/Conv_{i}/kernel").permute(3, 2, 0, 1)
            b = self._p(f"image_enc/Conv_{i}/bias")
            h = swish(F.conv2d(h, w, b, stride=2, padding=1))
        h = h.permute(0, 2, 3, 1).flatten(1)  # flax flattens NHWC
        h = swish(h @ self._p("image_enc/Dense_0/kernel")
                  + self._p("image_enc/Dense_0/bias"))
        o = (h @ self._p("image_enc/Dense_1/kernel")
             + self._p("image_enc/Dense_1/bias"))
        return o[:, : self.n_latents], o[:, self.n_latents:]

    def attr_encode(self, attrs):  # (B, 18) float in {0,1}
        a = attrs[..., None]
        emb = self._p("attr_enc/embed")
        h0 = emb[None, :, 0, :] * (1 - a) + emb[None, :, 1, :] * a
        h = swish(torch.einsum("bae,aeh->bah", h0, self._p("attr_enc/w1"))
                  + self._p("attr_enc/b1")[None])
        o = (torch.einsum("bah,aho->bao", h, self._p("attr_enc/w2"))
             + self._p("attr_enc/b2")[None])
        return o[..., : self.n_latents], o[..., self.n_latents:]

    def image_decode(self, z):
        h = swish(z @ self._p("image_dec/Dense_0/kernel")
                  + self._p("image_dec/Dense_0/bias"))
        h = swish(h @ self._p("image_dec/Dense_1/kernel")
                  + self._p("image_dec/Dense_1/bias"))
        h = h.view(-1, 4, 4, self.feats[-1]).permute(0, 3, 1, 2)
        n = len(self.feats)
        for i in range(n - 1):
            k = self._p(f"image_dec/ConvTranspose_{i}/kernel")
            w = torch.flip(k, dims=(0, 1)).permute(2, 3, 0, 1)
            b = self._p(f"image_dec/ConvTranspose_{i}/bias")
            h = swish(F.conv_transpose2d(h, w, b, stride=2, padding=1))
        k = self._p(f"image_dec/ConvTranspose_{n - 1}/kernel")
        w = torch.flip(k, dims=(0, 1)).permute(2, 3, 0, 1)
        b = self._p(f"image_dec/ConvTranspose_{n - 1}/bias")
        h = F.conv_transpose2d(h, w, b, stride=2, padding=1)
        return h.permute(0, 2, 3, 1)  # (B, 64, 64, 3) logits

    def attr_decode(self, z):
        h = swish(torch.einsum("bl,alh->bah", z, self._p("attr_dec/w1"))
                  + self._p("attr_dec/b1")[None])
        return (torch.einsum("bah,ah->ba", h, self._p("attr_dec/w2"))
                + self._p("attr_dec/b2")[None])


def torch_celeba_twin_loss(
    twin, image, attrs, beta=1.0, sample=False, generator=None,
    lambda_image=1.0, lambda_attr=10.0,
):
    """20 fixed terms (joint + image-only + 18 attr-only) on the twin --
    the n_random_subsets=0 multi-term ELBO, batch mean. Random-subset
    terms are excluded because the two frameworks draw them from
    different RNGs; the fixed terms already exercise the 19-expert PoE.
    """
    n_mod = 1 + 18
    mu_i, lv_i = twin.image_encode(image)
    mu_a, lv_a = twin.attr_encode(attrs)
    mus = torch.cat([mu_i[:, None], mu_a], dim=1)  # (B, 19, L)
    lvs = torch.cat([lv_i[:, None], lv_a], dim=1)
    prior = torch.zeros_like(mus[:, :1])
    subsets = [[True] * n_mod] + [
        [i == m for i in range(n_mod)] for m in range(n_mod)
    ]
    total = torch.zeros(image.shape[0])
    for subset in subsets:
        sel_mu = [prior] + [
            mus[:, i: i + 1] for i in range(n_mod) if subset[i]
        ]
        sel_lv = [prior] + [
            lvs[:, i: i + 1] for i in range(n_mod) if subset[i]
        ]
        mu, lv = torch_poe(torch.cat(sel_mu, 1), torch.cat(sel_lv, 1))
        if sample:
            eps = (
                torch.randn(mu.shape, generator=generator)
                if generator is not None else torch.randn_like(mu)
            )
            z = mu + eps * torch.exp(0.5 * lv)
        else:
            z = mu
        loss = torch.zeros(image.shape[0])
        if subset[0]:
            ri = twin.image_decode(z)
            loss = loss + lambda_image * F.binary_cross_entropy_with_logits(
                ri.flatten(1), image.flatten(1), reduction="none"
            ).sum(-1)
        ra = twin.attr_decode(z)
        for i in range(18):
            if subset[1 + i]:
                loss = loss + lambda_attr * F.binary_cross_entropy_with_logits(
                    ra[:, i], attrs[:, i], reduction="none"
                )
        kl = -0.5 * torch.sum(1 + lv - mu.pow(2) - lv.exp(), dim=-1)
        total = total + loss + beta * kl
    return total.mean()


# ---------------------------------------------------------------------------
# MultiMNIST twin (round 3): conv image expert + explicit-GRU seq expert.
# Like TorchCelebATwin, the twin REGISTERS the flax param tree directly and
# reimplements the forward math in eager torch, so trajectory parity trains
# the exact same weights on both sides. The GRU is the repo's explicit cell
# (models/text.py::_gru_step -- single bias, b_n OUTSIDE the r-gate product,
# so torch.nn.GRUCell is NOT equivalent); the conv stack needs XLA-SAME
# asymmetric padding because 50x50 halves to odd sizes (50 -> 25 -> 13).
# ---------------------------------------------------------------------------


def torch_gru_step(h, xw, u, b):
    """models/text.py::_gru_step in eager torch (same gate layout)."""
    hidden = h.shape[-1]
    gates = xw[..., : 2 * hidden] + h @ u[:, : 2 * hidden] + b[: 2 * hidden]
    r = torch.sigmoid(gates[..., :hidden])
    zg = torch.sigmoid(gates[..., hidden : 2 * hidden])
    n = torch.tanh(
        xw[..., 2 * hidden :] + r * (h @ u[:, 2 * hidden :]) + b[2 * hidden :]
    )
    return (1.0 - zg) * n + zg * h


def _xla_same_pad(hw, k=4, s=2):
    """F.pad arg replicating XLA/TF SAME for a k x k stride-s conv:
    per dim, total = max((ceil(d/s)-1)*s + k - d, 0), lo = total // 2."""
    pads = []
    for d in reversed(hw):  # F.pad wants (w_lo, w_hi, h_lo, h_hi)
        out = -(-d // s)
        total = max((out - 1) * s + k - d, 0)
        pads += [total // 2, total - total // 2]
    return pads


class TorchMultiMnistTwin(nn.Module):
    """MultiMNIST MVAE twin over a flax param tree (reference semantics:
    no cross-recon / cycle; ``text_latent_dims`` must be 0)."""

    START, PAD = 1, 0

    def __init__(self, flax_params, n_latents, feats=(4, 8)):
        super().__init__()
        self.n_latents = n_latents
        self.feats = tuple(feats)
        self.params = nn.ParameterDict()
        self._register("", flax_params)

    def _register(self, prefix, tree):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                self._register(key, v)
            else:
                self.params[key] = nn.Parameter(
                    torch.from_numpy(np.array(v, copy=True))
                )

    def _p(self, key):
        return self.params[key]

    def image_encode(self, x):  # (B, 50, 50) in [0,1]
        h = x[:, None]  # NCHW grayscale
        for i in range(len(self.feats)):
            w = self._p(f"image_enc/Conv_{i}/kernel").permute(3, 2, 0, 1)
            b = self._p(f"image_enc/Conv_{i}/bias")
            h = F.pad(h, _xla_same_pad(h.shape[-2:]))
            h = swish(F.conv2d(h, w, b, stride=2))
        h = h.permute(0, 2, 3, 1).flatten(1)  # flax flattens NHWC
        h = swish(h @ self._p("image_enc/Dense_0/kernel")
                  + self._p("image_enc/Dense_0/bias"))
        o = (h @ self._p("image_enc/Dense_1/kernel")
             + self._p("image_enc/Dense_1/bias"))
        return o[:, : self.n_latents], o[:, self.n_latents :]

    def text_encode(self, tokens):  # (B, T) long
        emb = self._p("text_enc/Embed_0/embedding")[tokens]  # (B, T, E)
        xw = emb @ self._p("text_enc/w_in")
        u, b = self._p("text_enc/u_rec"), self._p("text_enc/b")
        mask = (tokens != self.PAD).to(xw.dtype)
        h = torch.zeros(tokens.shape[0], u.shape[0], dtype=xw.dtype)
        for t in range(tokens.shape[1]):
            h_new = torch_gru_step(h, xw[:, t], u, b)
            h = mask[:, t, None] * h_new + (1.0 - mask[:, t, None]) * h
        o = (h @ self._p("text_enc/Dense_0/kernel")
             + self._p("text_enc/Dense_0/bias"))
        return o[:, : self.n_latents], o[:, self.n_latents :]

    def image_decode(self, z):  # -> (B, 50, 50) logits
        h = swish(z @ self._p("image_dec/Dense_0/kernel")
                  + self._p("image_dec/Dense_0/bias"))
        h = swish(h @ self._p("image_dec/Dense_1/kernel")
                  + self._p("image_dec/Dense_1/bias"))
        rfeats = tuple(reversed(self.feats))  # decoder feature order
        base = -(-50 // (2 ** len(rfeats)))
        h = h.view(-1, base, base, rfeats[0]).permute(0, 3, 1, 2)
        n = len(rfeats)
        for i in range(n):
            k = self._p(f"image_dec/ConvTranspose_{i}/kernel")
            w = torch.flip(k, dims=(0, 1)).permute(2, 3, 0, 1)
            b = self._p(f"image_dec/ConvTranspose_{i}/bias")
            h = F.conv_transpose2d(h, w, b, stride=2, padding=1)
            if i < n - 1:
                h = swish(h)
        return h[:, 0, :50, :50]  # flax top-left crop + channel squeeze

    def text_decode(self, z, targets):  # teacher-forced (B, T, V) logits
        inputs = torch.cat(
            [torch.full_like(targets[:, :1], self.START), targets[:, :-1]],
            dim=1,
        )
        emb = self._p("text_dec/embed/embedding")[inputs]
        xw = emb @ self._p("text_dec/w_in")
        u, b = self._p("text_dec/u_rec"), self._p("text_dec/b")
        h = torch.tanh(z @ self._p("text_dec/init_proj/kernel")
                       + self._p("text_dec/init_proj/bias"))
        hs = []
        for t in range(targets.shape[1]):
            h = torch_gru_step(h, xw[:, t], u, b)
            hs.append(h)
        hs = torch.stack(hs, dim=1)
        return (hs @ self._p("text_dec/out_proj/kernel")
                + self._p("text_dec/out_proj/bias"))


def torch_multimnist_twin_loss(
    twin, image, text, beta=1.0, sample=False,
    lambda_image=1.0, lambda_text=10.0,
):
    """3 fixed terms (joint, image-only, text-only), reference semantics,
    batch mean -- the multi_term_loss twin for trajectory parity."""
    mu_i, lv_i = twin.image_encode(image)
    mu_t, lv_t = twin.text_encode(text)
    total = torch.zeros(image.shape[0])
    for subset in ([True, True], [True, False], [False, True]):
        mus = [torch.zeros_like(mu_i[:, None])]
        lvs = [torch.zeros_like(lv_i[:, None])]
        if subset[0]:
            mus.append(mu_i[:, None]); lvs.append(lv_i[:, None])
        if subset[1]:
            mus.append(mu_t[:, None]); lvs.append(lv_t[:, None])
        mu, lv = torch_poe(torch.cat(mus, 1), torch.cat(lvs, 1))
        z = (
            mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
            if sample
            else mu
        )
        term = -0.5 * torch.sum(1 + lv - mu * mu - torch.exp(lv), dim=-1)
        term = beta * term
        if subset[0]:
            term = term + lambda_image * F.binary_cross_entropy_with_logits(
                twin.image_decode(z), image, reduction="none"
            ).sum(dim=(1, 2))
        if subset[1]:
            logits = twin.text_decode(z, text)
            ce = F.cross_entropy(
                logits.reshape(-1, logits.shape[-1]), text.reshape(-1),
                reduction="none",
            ).view(text.shape)
            mask = (text != twin.PAD).to(ce.dtype)
            term = term + lambda_text * (ce * mask).sum(dim=1)
        total = total + term
    return total.mean()
