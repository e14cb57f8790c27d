"""Cross-modal quality report for a trained checkpoint.

Usage:  python tools/quality_check.py <config> <workdir>

Reports the MVAE-paper style cross-modal evals (SURVEY.md 2.13):
  * image -> label accuracy: condition on test images only, decode labels
    (cross-modal classification through the shared latent);
  * label -> image -> label round trip: generate images conditioned on
    each label, re-encode the generated image alone, decode the label;
  * joint-sample consistency: prior samples decoded into both modalities,
    then image re-encoded -- do the two decodes agree?

Works for the label-bearing configs (mnist, fashionmnist). Writes sample
grids next to the checkpoint.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def check_celeba(config, model, params, workdir: str) -> dict:
    """Attr <-> image round trips for the 19-expert config."""
    from mmvae_tpu import api
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.utils import save_image_grid

    test = load_dataset(
        "celeba", "test", n=512,
        gen_kwargs=getattr(config, "data_kwargs", None),
    )
    images = test.arrays["image"]
    attrs = np.asarray(test.arrays["attrs"])

    out = api.generate(config, {"image": images}, model=model, params=params)
    img2attr = float(
        ((np.asarray(out["attrs"]) > 0.5) == (attrs > 0.5)).mean()
    )
    gen = api.generate(
        config, {"attrs": attrs[:256]}, model=model, params=params,
        sample_z=True, seed=1,
    )
    back = api.generate(
        config, {"image": np.asarray(gen["image"])},
        model=model, params=params,
    )
    roundtrip = float(
        ((np.asarray(back["attrs"]) > 0.5) == (attrs[:256] > 0.5)).mean()
    )
    save_image_grid(
        np.asarray(gen["image"])[:64],
        os.path.join(workdir, "attr_conditioned.png"),
    )
    return {
        "config": "celeba",
        "image_to_attr_accuracy": round(img2attr, 4),
        "attr_to_image_to_attr_accuracy": round(roundtrip, 4),
        "test_elbo": api.eval_elbo(config, model=model, params=params),
    }


def check_text_config(config, model, params, workdir: str, name: str) -> dict:
    """Image <-> token-sequence round trips (multimnist / cub)."""
    from mmvae_tpu import api
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.utils import save_image_grid

    test = load_dataset(
        name, "test", n=512,
        gen_kwargs=getattr(config, "data_kwargs", None),
    )
    images = test.arrays["image"]
    texts = np.asarray(test.arrays["text"])

    # image -> text: greedy decode conditioned on the image alone.
    out = api.generate(
        config, {"image": images}, model=model, params=params,
        temperature=0.0,
    )
    gen = np.asarray(out["text"])
    pad_mask = texts != 0
    token_acc = float(
        (np.where(pad_mask, gen == texts, True)).all(axis=1).mean()
    )
    per_token = float((gen[pad_mask] == texts[pad_mask]).mean())

    # text -> image -> text round trip: generate images from the
    # captions alone, re-encode the generated image alone, greedy-decode
    # the caption back.
    img_out = api.generate(
        config, {"text": texts[:256]}, model=model, params=params,
        sample_z=True, seed=1,
    )
    back = api.generate(
        config, {"image": np.asarray(img_out["image"])},
        model=model, params=params, temperature=0.0,
    )
    rt = np.asarray(back["text"])
    rt_mask = texts[:256] != 0
    rt_exact = float(
        (np.where(rt_mask, rt == texts[:256], True)).all(axis=1).mean()
    )
    rt_token = float((rt[rt_mask] == texts[:256][rt_mask]).mean())
    rt_thresh = None
    if getattr(config, "cycle_render_binarize", False):
        # The binarized cycle trains the channel on HARD 0/1 renders --
        # consume the render in its trained form too (threshold at 0.5)
        # and report that round trip alongside the soft one (the
        # measured gap between them is the whole story of this knob).
        hard = (np.asarray(img_out["image"]) > 0.5).astype(np.float32)
        back_h = api.generate(
            config, {"image": hard}, model=model, params=params,
            temperature=0.0,
        )
        rt_h = np.asarray(back_h["text"])
        rt_thresh = float(
            (np.where(rt_mask, rt_h == texts[:256], True))
            .all(axis=1).mean()
        )
    save_image_grid(
        np.asarray(img_out["image"])[:64],
        os.path.join(workdir, "text_conditioned.png"),
    )
    # Visual-contrast numbers for the text-conditioned render (the
    # BASELINE.md "machine-readable but dim" caveat, ~0.12 max pixel):
    # per-example max pixel and pixel std, next to the TRUE images'
    # values as the target band.
    rimg = np.asarray(img_out["image"], np.float32)
    timg = np.asarray(images[:256], np.float32)
    rflat = rimg.reshape(rimg.shape[0], -1)
    tflat = timg.reshape(timg.shape[0], -1)
    report = {
        "config": name,
        "image_to_text_exact_match": round(token_acc, 4),
        "image_to_text_per_token_accuracy": round(per_token, 4),
        "text_to_image_to_text_exact": round(rt_exact, 4),
        "text_to_image_to_text_per_token": round(rt_token, 4),
        "render_max_pixel": round(float(rflat.max(1).mean()), 4),
        "render_pixel_std": round(float(rflat.std(1).mean()), 4),
        "true_max_pixel": round(float(tflat.max(1).mean()), 4),
        "true_pixel_std": round(float(tflat.std(1).mean()), 4),
        "test_elbo": api.eval_elbo(config, model=model, params=params),
    }
    if rt_thresh is not None:
        report["text_to_image_to_text_exact_thresholded"] = round(
            rt_thresh, 4
        )
    if name == "multimnist":
        # Position-invariant (sorted-multiset) variants: MultiMNIST
        # digit ORDER is claimed ambiguous from the rendered image
        # (round-2 BASELINE note); these metrics measure the claim --
        # if the multiset round trip is also low, the ambiguity story
        # is false and the gap is a real model deficiency (round-3
        # VERDICT item #6).
        report["image_to_text_multiset_exact"] = round(
            _multiset_exact(gen, texts), 4
        )
        report["text_to_image_to_text_multiset_exact"] = round(
            _multiset_exact(rt, texts[:256]), 4
        )
    return report


def _multiset_exact(got: np.ndarray, want: np.ndarray) -> float:
    """Fraction of rows whose non-pad token MULTISETS match (order
    ignored, multiplicity respected)."""
    hits = [
        sorted(g[g != 0].tolist()) == sorted(w[w != 0].tolist())
        for g, w in zip(got, want)
    ]
    return float(np.mean(hits))


def main(config_name: str, workdir: str) -> int:
    import jax

    from mmvae_tpu import api
    from mmvae_tpu.configs import build_model, get_config
    from mmvae_tpu.data import load_dataset
    from mmvae_tpu.utils import save_image_grid

    config = api.load_run_config(workdir) or get_config(config_name)
    model = build_model(config)
    params = api._load_params(config, model, workdir)

    if config_name in ("multimnist", "cub"):
        report = check_text_config(
            config, model, params, workdir, config_name
        )
        print(json.dumps(report, indent=2))
        with open(os.path.join(workdir, "quality.json"), "w") as f:
            json.dump(report, f, indent=2)
        return 0

    if config_name == "celeba":
        report = check_celeba(config, model, params, workdir)
        print(json.dumps(report, indent=2))
        with open(os.path.join(workdir, "quality.json"), "w") as f:
            json.dump(report, f, indent=2)
        return 0

    test = load_dataset(
        config.dataset, "test", n=1000,
        gen_kwargs=getattr(config, "data_kwargs", None),
    )
    images = test.arrays["image"]
    labels = np.asarray(test.arrays["label"])

    # image -> label
    out = api.generate(
        config, {"image": images}, model=model, params=params
    )
    img2lab = float((np.asarray(out["label"]) == labels).mean())

    # label -> image -> label
    per_label = 32
    cond_labels = np.repeat(np.arange(10), per_label).astype(np.int32)
    gen = api.generate(
        config,
        {"label": cond_labels},
        model=model,
        params=params,
        sample_z=True,
        seed=1,
    )
    back = api.generate(
        config,
        {"image": np.asarray(gen["image"])},
        model=model,
        params=params,
    )
    roundtrip = float((np.asarray(back["label"]) == cond_labels).mean())
    save_image_grid(
        np.asarray(gen["image"])[::per_label // 4],
        os.path.join(workdir, "label_conditioned.png"),
        n_cols=10,
    )

    # joint prior samples: label decode vs re-encoded-image decode
    joint = api.sample(config, n=256, model=model, params=params, seed=2)
    again = api.generate(
        config,
        {"image": np.asarray(joint["image"])},
        model=model,
        params=params,
    )
    consistency = float(
        (np.asarray(joint["label"]) == np.asarray(again["label"])).mean()
    )
    save_image_grid(
        np.asarray(joint["image"])[:64],
        os.path.join(workdir, "prior_samples.png"),
    )

    report = {
        "config": config_name,
        "image_to_label_accuracy": round(img2lab, 4),
        "label_to_image_to_label_accuracy": round(roundtrip, 4),
        "joint_sample_consistency": round(consistency, 4),
        "test_elbo": api.eval_elbo(config, model=model, params=params),
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(workdir, "quality.json"), "w") as f:
        json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
