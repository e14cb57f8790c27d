"""Latent-space diagnostics for a trained checkpoint.

Usage:  python tools/latent_report.py <config> <workdir>

Institutionalizes the posterior-collapse forensics the round-3
MultiMNIST investigation did by hand (docs/DESIGN.md section 9: the
text expert's posterior had collapsed to the prior, diagnosed via
ad-hoc KL probes). Reports, over the test split:

  * **per-dimension KL** of the joint posterior to the prior — the
    standard unit-level collapse profile (a dead dimension's KL ~ 0);
  * **active units** (Burda et al. 2016): ``Var_x(E[z_d|x]) > 0.01``
    — how many latent dimensions the encoder actually uses;
  * **per-modality posterior agreement**: mean ``KL(q_m || q_joint)``
    and ``KL(q_joint || q_m)`` for each unimodal posterior — a
    collapsed expert sits at ``KL(q_m || p) ~ 0`` while the joint is
    far away, exactly the MultiMNIST text-expert signature (and the
    quantity MVTCAE's alpha term explicitly minimizes);
  * **traversal grids**: for the top-k most-active dimensions, vary
    that dimension over +/-3 of its posterior std around one test
    example's joint mean and decode the image modality (one PNG per
    dim, ``traversal_d<dim>.png``);
  * **interpolation grid**: linear interpolation between two test
    examples' joint means, decoded (``interpolation.png``).

Writes ``latent_report.json`` + the PNGs into the workdir. Pure-math
helpers (``per_dim_kl``, ``active_units``, ``modality_agreement``) are
importable and unit-tested without a checkpoint
(tests/test_latent_report.py).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ACTIVE_UNIT_THRESHOLD = 0.01  # Burda et al. 2016 convention


def per_dim_kl(mu: np.ndarray, logvar: np.ndarray) -> np.ndarray:
    """Mean KL(q||N(0,1)) per latent dimension, shape ``(L,)``.

    ``mu``/``logvar``: ``(B, L)`` posterior stats over a split.
    """
    kl = 0.5 * (mu**2 + np.exp(logvar) - 1.0 - logvar)
    return kl.mean(axis=0)


def active_units(
    mu: np.ndarray, threshold: float = ACTIVE_UNIT_THRESHOLD
) -> tuple[int, np.ndarray]:
    """(count, per-dim variance of the posterior mean over the split).

    A dimension is ACTIVE when the posterior mean varies with the input
    (``Var_x(E[z_d|x]) > threshold``); a collapsed dimension emits the
    prior regardless of x and its mean-variance is ~0.
    """
    var = mu.var(axis=0)
    return int((var > threshold).sum()), var


def modality_agreement(
    mu_e: np.ndarray,
    lv_e: np.ndarray,
    mu_j: np.ndarray,
    lv_j: np.ndarray,
) -> list[dict[str, float]]:
    """Per-modality posterior agreement with the joint posterior.

    ``mu_e``/``lv_e``: ``(B, M, L)`` RAW expert stats; each unimodal
    posterior is the masked PoE of that single expert with the prior
    (precision-weighted), matching what generation conditions on.
    Returns per-modality mean ``kl_to_joint`` = KL(q_m||q_joint),
    ``kl_from_joint`` = KL(q_joint||q_m), and ``kl_to_prior`` =
    KL(q_m||p) — the collapse telltale.
    """
    out = []
    # Masked-PoE with the prior: precision T = 1 + e^-lv, the same
    # math core/poe.py runs with a one-hot mask.
    for m in range(mu_e.shape[1]):
        t_m = np.exp(-lv_e[:, m])
        prec = 1.0 + t_m
        mu_m = (mu_e[:, m] * t_m) / prec
        lv_m = -np.log(prec)

        def kl(mu1, lv1, mu2, lv2):
            return (
                0.5
                * (
                    lv2
                    - lv1
                    + (np.exp(lv1) + (mu1 - mu2) ** 2) / np.exp(lv2)
                    - 1.0
                ).sum(axis=-1)
            ).mean()

        out.append(
            {
                "kl_to_joint": float(kl(mu_m, lv_m, mu_j, lv_j)),
                "kl_from_joint": float(kl(mu_j, lv_j, mu_m, lv_m)),
                "kl_to_prior": float(
                    kl(
                        mu_m,
                        lv_m,
                        np.zeros_like(mu_m),
                        np.zeros_like(lv_m),
                    )
                ),
            }
        )
    return out


def _decode_images(model, params, z):
    import jax

    recons = model.apply({"params": params}, z, None, method="decode")
    kinds = model.decode_kinds()
    name = next(
        s.name for s in model.specs() if s.kind == "bernoulli"
    )
    assert kinds.get(name, "bernoulli") == "bernoulli"
    return np.asarray(jax.nn.sigmoid(recons[name]))


def main(config_name: str, workdir: str, n: int = 512) -> int:
    import jax

    from mmvae_tpu import api
    from mmvae_tpu.configs import build_model
    from mmvae_tpu.core.poe import product_of_experts
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.utils import save_image_grid

    # Pass the NAME: _resolve_with_workdir only prefers the workdir's
    # config snapshot (the exact trained model) for string configs.
    config = api._resolve_with_workdir(config_name, workdir)
    model = build_model(config)
    params = api._load_params(config, model, workdir)
    test = load_dataset(
        config.dataset, "test", n=min(n, config.test_size),
        gen_kwargs=getattr(config, "data_kwargs", None),
    )

    mu_e, lv_e = model.apply(
        {"params": params}, test.arrays, method="encode"
    )
    mu_j, lv_j = product_of_experts(mu_e, lv_e)
    mu_e, lv_e = np.asarray(mu_e), np.asarray(lv_e)
    mu_j, lv_j = np.asarray(mu_j), np.asarray(lv_j)

    dim_kl = per_dim_kl(mu_j, lv_j)
    n_active, mean_var = active_units(mu_j)
    agree = modality_agreement(mu_e, lv_e, mu_j, lv_j)
    names = [s.name for s in model.specs()]

    report = {
        "config": config.name,
        "objective": getattr(config, "objective", "mvae"),
        "n_latents": int(mu_j.shape[-1]),
        "n_examples": int(mu_j.shape[0]),
        "active_units": n_active,
        "active_unit_threshold": ACTIVE_UNIT_THRESHOLD,
        "total_kl": float(dim_kl.sum()),
        "per_dim_kl_top8": [
            [int(d), float(dim_kl[d])]
            for d in np.argsort(dim_kl)[::-1][:8]
        ],
        "dead_dims": int((dim_kl < 0.01).sum()),
        "modality_agreement": dict(zip(names, agree)),
    }

    # Traversals: top-4 active dims, +/-3 posterior std, 9 steps.
    top = np.argsort(mean_var)[::-1][:4]
    steps = np.linspace(-3.0, 3.0, 9)
    z0 = mu_j[0]
    sd = np.sqrt(np.exp(lv_j[0]))
    for d in top:
        zs = np.tile(z0, (len(steps), 1))
        zs[:, d] = z0[d] + steps * max(sd[d], 1.0)
        imgs = _decode_images(model, params, jax.numpy.asarray(zs))
        save_image_grid(
            imgs, os.path.join(workdir, f"traversal_d{int(d)}.png"),
            n_cols=len(steps),
        )
    report["traversal_dims"] = [int(d) for d in top]

    # Interpolation between the first two test examples.
    alphas = np.linspace(0.0, 1.0, 9)[:, None]
    zs = (1 - alphas) * mu_j[0][None] + alphas * mu_j[1][None]
    imgs = _decode_images(model, params, jax.numpy.asarray(zs))
    save_image_grid(
        imgs, os.path.join(workdir, "interpolation.png"),
        n_cols=len(alphas),
    )

    path = os.path.join(workdir, "latent_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
