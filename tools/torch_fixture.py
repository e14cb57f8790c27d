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
