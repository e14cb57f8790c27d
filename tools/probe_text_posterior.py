"""Diagnose the MultiMNIST text->image gap on a trained checkpoint.

Usage:  python tools/probe_text_posterior.py <workdir>

Prints, per latent slice (content = first ``text_latent_dims`` dims when
the checkpoint was trained with the factorization, else the full latent):
  * text expert posterior stats (mean |mu|, mean sigma) vs the image
    expert's -- a near-prior text posterior (|mu|~0, sigma~1) means the
    encoder collapsed and text-only conditioning yields a prior z;
  * text->text round trip THROUGH THE LATENT ONLY: encode text alone,
    fuse with the prior, greedy-decode the caption back. High text->text
    with low text->image->text isolates the failure to the image decoder;
    low text->text means the text posterior does not even carry digit
    identity (encoder-side collapse).

CPU-safe and cheap (one encode + one greedy decode over 512 rows).
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
    import jax.numpy as jnp

    from mmvae_tpu import api
    from mmvae_tpu.configs import build_model, get_config
    from mmvae_tpu.data import load_dataset

    config = api.load_run_config(workdir) or get_config("multimnist")
    model = build_model(config)
    params = api._load_params(config, model, workdir)

    test = load_dataset(
        "multimnist", "test", n=512,
        gen_kwargs=getattr(config, "data_kwargs", None),
    )
    texts = np.asarray(test.arrays["text"])
    images = np.asarray(test.arrays["image"])

    batch = {"text": jnp.asarray(texts), "image": jnp.asarray(images)}
    mu, lv = model.apply({"params": params}, batch, method=model.encode)
    mu = np.asarray(mu)  # (B, M=2 [image, text], L)
    sigma = np.exp(0.5 * np.asarray(lv))

    n_content = getattr(model, "text_latent_dims", 0) or mu.shape[-1]
    sl_content = slice(0, n_content)
    sl_style = slice(n_content, mu.shape[-1])

    def stats(m: int, sl: slice) -> dict:
        if sl.start == sl.stop or (sl.stop is not None and sl.stop <= sl.start):
            return {}
        return {
            "mean_abs_mu": round(float(np.abs(mu[:, m, sl]).mean()), 4),
            "mean_sigma": round(float(sigma[:, m, sl].mean()), 4),
        }

    # text -> text through the latent: condition on text alone (PoE with
    # the prior), greedy-decode the caption back.
    out = api.generate(
        config, {"text": texts}, model=model, params=params,
        temperature=0.0,
    )
    dec = np.asarray(out["text"])
    mask = texts != 0
    t2t_exact = float(
        (np.where(mask, dec == texts, True)).all(axis=1).mean()
    )
    t2t_token = float((dec[mask] == texts[mask]).mean())

    report = {
        "workdir": workdir,
        "text_latent_dims": int(getattr(model, "text_latent_dims", 0)),
        "image_expert_content": stats(0, sl_content),
        "text_expert_content": stats(1, sl_content),
        "image_expert_style": stats(0, sl_style),
        "text_expert_style": stats(1, sl_style),
        "text_to_text_exact": round(t2t_exact, 4),
        "text_to_text_per_token": round(t2t_token, 4),
    }
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
