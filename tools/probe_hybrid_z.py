"""Hybrid-latent ablation of the MultiMNIST text->image failure.

Usage:  python tools/probe_hybrid_z.py <workdir>

Decodes images from four constructions of z on a trained (factored)
checkpoint, re-encodes each decoded image alone, greedy-decodes the
caption back, and scores the position-invariant multiset match against
the true caption. Isolates WHICH latent slice the decoder refuses:

  A  z = joint posterior mean                      (upper bound)
  B  content from TEXT-only PoE, style from JOINT  (is content-from-text
                                                    decodable?)
  C  content from JOINT, style ~ prior sample      (is style-from-prior
                                                    decodable?)
  D  content from TEXT, style ~ prior sample       (the generation path;
                                                    should match the
                                                    measured ~3%)

B high + C low  -> the decoder rejects PRIOR-STYLE inputs (the cross-
                   recon averaging gradient taught it haze for latents
                   whose style slice looks like a prior draw).
B low           -> the decoder keys on the content slice's text-vs-joint
                   distribution shift instead.

CPU-safe; uses the checkpoint's own config (needs text_latent_dims>0).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(workdir: str) -> int:
    import jax
    import jax.numpy as jnp

    from mmvae_tpu import api
    from mmvae_tpu.configs import build_model, get_config
    from mmvae_tpu.core.poe import product_of_experts
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.utils import save_image_grid

    config = api.load_run_config(workdir) or get_config("multimnist")
    model = build_model(config)
    params = api._load_params(config, model, workdir)
    n_content = int(getattr(model, "text_latent_dims", 0))
    if n_content <= 0:
        print(json.dumps({"error": "checkpoint has no factored latent"}))
        return 1

    test = load_dataset(
        "multimnist", "test", n=256,
        gen_kwargs=getattr(config, "data_kwargs", None),
    )
    texts = np.asarray(test.arrays["text"])
    batch = {
        "image": jnp.asarray(test.arrays["image"]),
        "text": jnp.asarray(texts),
    }
    variables = {"params": params}
    mu_e, lv_e = model.apply(variables, batch, method="encode")  # (B,2,L)

    def fuse(mask):
        m = jnp.asarray(mask, jnp.float32)[None, :]
        m = jnp.broadcast_to(m, (mu_e.shape[0], 2))
        return product_of_experts(mu_e, lv_e, mask=m)

    mu_joint, _ = fuse([1.0, 1.0])
    mu_text, _ = fuse([0.0, 1.0])
    style_prior = jax.random.normal(
        jax.random.key(1), mu_joint.shape, mu_joint.dtype
    )

    content = jnp.arange(mu_joint.shape[-1]) < n_content

    def mix(content_src, style_src):
        return jnp.where(content, content_src, style_src)

    variants = {
        "A_joint": mu_joint,
        "B_textcontent_jointstyle": mix(mu_text, mu_joint),
        "C_jointcontent_priorstyle": mix(mu_joint, style_prior),
        "D_textcontent_priorstyle": mix(mu_text, style_prior),
    }

    report = {"workdir": workdir, "n": int(texts.shape[0])}
    for name, z in variants.items():
        recons = model.apply(variables, z, None, method="decode")
        img = jax.nn.sigmoid(recons["image"])
        back = api.generate(
            config, {"image": np.asarray(img)}, model=model,
            params=params, temperature=0.0,
        )
        got = np.asarray(back["text"])
        hits = [
            sorted(g[g != 0].tolist()) == sorted(w[w != 0].tolist())
            for g, w in zip(got, texts)
        ]
        report[name + "_multiset_exact"] = round(float(np.mean(hits)), 4)
        report[name + "_max_pixel"] = round(float(np.max(img)), 3)
        save_image_grid(
            np.asarray(img)[:64],
            os.path.join(workdir, f"hybrid_{name}.png"),
        )
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
