"""CLI entry point: ``python -m mmvae_tpu.cli <cmd> --config mnist ...``.

One parameterized CLI replacing the reference's per-experiment
``train.py`` / ``sample.py`` scripts, with the same flags
(SURVEY.md 2.11: --n-latents --epochs --lr --annealing-epochs
--batch-size --log-interval) plus config selection and conditioning
flags for cross-modal generation (SURVEY.md 2.13).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    from mmvae_tpu.configs import CONFIGS

    # Derived, not hardcoded: a config registered in CONFIGS is
    # reachable from the CLI by construction (deep_cub was silently
    # unreachable for a few hours of round 4).
    p.add_argument("--config", required=True, choices=list(CONFIGS))
    p.add_argument("--workdir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="compute dtype for the experts (params stay float32)",
    )
    p.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed before any device use "
        "(multi-host pod slices; autodetects on TPU, or set "
        "MMVAE_COORDINATOR / MMVAE_NUM_PROCESSES / MMVAE_PROCESS_ID "
        "on CPU/GPU harnesses -- parallel/multihost.py)",
    )


def _overrides(args, config):
    for field in (
        "n_latents", "epochs", "batch_size", "annealing_epochs",
        "log_interval", "train_size", "test_size", "n_random_subsets",
        "keep_epoch_ckpts", "ema_decay", "data_dtype",
        "reshuffle_every", "warmup_epochs", "lr_schedule",
        "accum_steps", "shuffle_mode", "shuffle_granularity",
        "nan_rollback", "objective", "mvtcae_alpha", "tp", "pp",
        "ckpt_every", "grain_stream_steps", "ckpt_async",
        "eval_segment_steps",
        "cross_recon_weight",
        "cross_recon_stopgrad",
        "unimodal_align_weight",
        "cycle_weight",
        "cycle_render_grad",
        "cycle_contrast_weight",
        "cycle_render_binarize",
    ):
        v = getattr(args, field, None)
        if v is not None:
            config = config.replace(**{field: v})
    if getattr(args, "lr", None) is not None:
        config = config.replace(learning_rate=args.lr)
    if getattr(args, "p_modality_drop", None) is not None:
        config = config.replace(p_modality_drop=args.p_modality_drop)
    if getattr(args, "data_backend", None) is not None:
        config = config.replace(data_backend=args.data_backend)
    if getattr(args, "cross_recon", None) is not None:
        config = config.replace(cross_recon=args.cross_recon)
    if getattr(args, "fsdp", None) is not None:
        config = config.replace(fsdp=args.fsdp)
    return config


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="mmvae-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train", help="train an experiment config")
    _add_common(pt)
    pt.add_argument("--n-latents", dest="n_latents", type=int)
    pt.add_argument("--epochs", type=int)
    pt.add_argument("--lr", type=float)
    pt.add_argument("--batch-size", dest="batch_size", type=int)
    pt.add_argument(
        "--annealing-epochs", dest="annealing_epochs", type=int
    )
    pt.add_argument("--log-interval", dest="log_interval", type=int)
    pt.add_argument("--train-size", dest="train_size", type=int)
    pt.add_argument("--test-size", dest="test_size", type=int)
    pt.add_argument(
        "--n-random-subsets", dest="n_random_subsets", type=int
    )
    pt.add_argument(
        "--objective",
        choices=["mvae", "mmvae", "mopoe", "mvtcae"],
        help="multimodal objective family: mvae (PoE subset ELBOs, "
        "reference semantics), mmvae (mixture-of-experts posterior, "
        "Shi et al. 2019), mopoe (mixture of subset-PoEs, Sutter et "
        "al. 2021) or mvtcae (total-correlation VIB, Hwang et al. "
        "2021); eval + generation follow the training objective",
    )
    pt.add_argument(
        "--mvtcae-alpha", dest="mvtcae_alpha", type=float,
        help="objective=mvtcae KL mix: (1-a)*KL(q||p) + a/M * sum_m "
        "KL(q_joint||q_m) (default 0.9)",
    )
    pt.add_argument(
        "--p-modality-drop", dest="p_modality_drop", type=float
    )
    pt.add_argument(
        "--cross-recon", dest="cross_recon", action="store_true",
        default=None,
        help="add cross-reconstruction terms (every modality decoded "
        "from every subset posterior; docs/DESIGN.md section 9)",
    )
    pt.add_argument(
        "--data-backend", dest="data_backend",
        choices=["device", "grain"],
        help="input pipeline: device-resident gathers (default) or the "
        "Grain host-streaming pipeline",
    )
    pt.add_argument(
        "--grain-stream-steps", dest="grain_stream_steps", type=int,
        help="grain backend: stream the epoch in K-batch double-"
        "buffered segments (bounded memory for beyond-HBM datasets; "
        "0 = ship the whole stacked epoch)",
    )
    pt.add_argument(
        "--keep-epoch-ckpts", dest="keep_epoch_ckpts", type=int,
        help="retain the newest N per-epoch checkpoints "
        "(reference save-each-epoch contract; 0 = last/best only)",
    )
    pt.add_argument(
        "--accum-steps", dest="accum_steps", type=int,
        help="average gradients over k micro-batches before each Adam "
        "update (effective batch = k * batch-size)",
    )
    pt.add_argument(
        "--nan-rollback", dest="nan_rollback", type=int,
        help="on a non-finite epoch, restore the last finite checkpoint "
        "and continue (at most N times per run; 0 = off, needs "
        "--workdir)",
    )
    pt.add_argument(
        "--lr-schedule", dest="lr_schedule",
        choices=["constant", "cosine"],
        help="constant (reference semantics) or warmup->cosine decay",
    )
    pt.add_argument(
        "--warmup-epochs", dest="warmup_epochs", type=int,
        help="linear LR warmup epochs (cosine schedule)",
    )
    pt.add_argument(
        "--reshuffle-every", dest="reshuffle_every", type=int,
        help="true device-side reshuffle every K epochs (rotation in "
        "between); K>1 amortizes the HBM row-gather",
    )
    pt.add_argument(
        "--cross-recon-weight", dest="cross_recon_weight", type=float,
        help="weight on cross-modal recon entries when --cross-recon "
        "is on (>1 pressures unimodal posteriors toward cross-modal "
        "generation)",
    )
    pt.add_argument(
        "--cross-recon-stopgrad", dest="cross_recon_stopgrad",
        action="store_true", default=None,
        help="cross-modal recon entries update the encoders only "
        "(decoder weights stop-gradiented in cross entries)",
    )
    pt.add_argument(
        "--unimodal-align-weight", dest="unimodal_align_weight",
        type=float,
        help="w * KL(q(z|S) || sg(q(z|joint))) over non-joint subset "
        "terms: distill subset posteriors toward the joint one",
    )
    pt.add_argument(
        "--cycle-weight", dest="cycle_weight", type=float,
        help="generation-path cycle consistency: seq-only posterior -> "
        "render image -> re-encode -> decode the sequence back, CE vs "
        "the true sequence (decoders stop-gradiented: encoders only)",
    )
    pt.add_argument(
        "--cycle-render-grad", dest="cycle_render_grad",
        action="store_true", default=None,
        help="let the cycle term's RENDER decode train the bernoulli "
        "decoders (re-encode and final seq decode stay stop-gradiented)",
    )
    pt.add_argument(
        "--cycle-render-binarize", dest="cycle_render_binarize",
        nargs="?", const=True, default=None,
        type=lambda s: True if s == "true" else s,
        choices=[True, "both"],
        help="hard-threshold the cycle render at 0.5 (straight-through)"
        " before the re-encode: information must survive binarization,"
        " forcing above-threshold strokes (requires --cycle-weight > 0)."
        " Bare flag = hard form only; 'both' additionally keeps the"
        " soft-form cycle CE (channel reads back from either form)",
    )
    pt.add_argument(
        "--cycle-contrast-weight", dest="cycle_contrast_weight",
        type=float,
        help="per-example pixel mean+std matching between the cycle "
        "render and the paired true image (decoder-side contrast "
        "objective; requires --cycle-weight > 0)",
    )
    pt.add_argument(
        "--shuffle-granularity", dest="shuffle_granularity", type=int,
        help="true-shuffle epochs permute contiguous G-row groups "
        "(HBM-contiguous reads) instead of single rows; 1 = exact",
    )
    pt.add_argument(
        "--shuffle-mode", dest="shuffle_mode",
        choices=["roll", "block"],
        help="between-reshuffle epochs: 'roll' rotates the resident "
        "arrays, 'block' re-randomizes batch order with zero copy "
        "(with --reshuffle-every K>1)",
    )
    pt.add_argument(
        "--data-dtype", dest="data_dtype",
        choices=["float32", "bfloat16", "uint8"],
        help="storage dtype for resident float modalities (bfloat16 "
        "halves the per-step HBM batch read, uint8 quarters it and is "
        "exact for 8-bit-native image data; train data only, eval "
        "stays f32)",
    )
    pt.add_argument(
        "--config-file", dest="config_file", default=None,
        help="JSON dict of config-field overrides applied on top of "
        "--config (reaches every field incl. model_kwargs; explicit "
        "flags still win)",
    )
    pt.add_argument(
        "--ema-decay", dest="ema_decay", type=float,
        help="Polyak/EMA shadow of the params (e.g. 0.999); "
        "eval/sample then use the EMA weights",
    )
    pt.add_argument(
        "--fsdp", dest="fsdp", action="store_true", default=None,
        help="shard params + optimizer state over the data mesh "
        "(ZeRO-3 via GSPMD; needs >1 device)",
    )
    pt.add_argument(
        "--ckpt-every", dest="ckpt_every", type=int,
        help="checkpoint every N epochs (default 1 = each epoch; the "
        "final epoch always saves; best tracks saved epochs)",
    )
    pt.add_argument(
        "--ckpt-async", dest="ckpt_async", action="store_true",
        default=None,
        help="overlapped checkpointing: snapshot on device, stream to "
        "host while training continues, serialize on a disk-only "
        "worker; save points are coalesced when the I/O path is the "
        "bottleneck (the final epoch always saves synchronously)",
    )
    pt.add_argument(
        "--eval-segment-steps", dest="eval_segment_steps", type=int,
        help="stream the eval split to device in K-batch segments "
        "(bounded HBM; -1 = follow --grain-stream-steps on the grain "
        "backend, 0 = whole split device-resident)",
    )
    pt.add_argument(
        "--tp", dest="tp", type=int,
        help="tensor parallelism: fold the devices into a 2-D "
        "(data, model) mesh with TP-way model groups "
        "(column/row-parallel Dense stacks; parallel/tp.py)",
    )
    pt.add_argument(
        "--pp", dest="pp", type=int,
        help="pipeline parallelism: fold the devices into a 2-D "
        "(data, pipe) mesh; the model's stage-stacked trunks run the "
        "GPipe microbatch schedule (trunk models only, e.g. the "
        "deep_mnist config with trunk_stages == PP; parallel/pp.py)",
    )
    pt.add_argument("--resume", action="store_true")
    pt.add_argument(
        "--no-mesh", action="store_true",
        help="disable the data-parallel mesh even with >1 device",
    )

    pe = sub.add_parser("eval", help="test-split ELBO from a checkpoint")
    _add_common(pe)
    pe.add_argument("--split", default="test", choices=["train", "test"])
    pe.add_argument("--test-size", dest="test_size", type=int)
    pe.add_argument("--n-latents", dest="n_latents", type=int)
    pe.add_argument(
        "--iwae-k", dest="iwae_k", type=int, default=0,
        help="also report the importance-sampled marginal "
        "log-likelihood with k samples (0 = ELBO only)",
    )

    ps = sub.add_parser("sample", help="prior samples from a checkpoint")
    _add_common(ps)
    ps.add_argument("--n", type=int, default=64)
    ps.add_argument("--temperature", type=float, default=1.0)
    ps.add_argument("--out", default=None, help="write samples to .npz")
    ps.add_argument("--n-latents", dest="n_latents", type=int)

    pg = sub.add_parser(
        "generate", help="cross-modal generation from a modality subset"
    )
    _add_common(pg)
    pg.add_argument(
        "--condition-on", action="append", default=[],
        metavar="MODALITY=NPYFILE",
        help="e.g. --condition-on image=img.npy (repeatable); "
        "label/attr values may be given inline: label=3, attr_6=1",
    )
    pg.add_argument("--n", type=int, default=None)
    pg.add_argument("--sample-z", action="store_true")
    pg.add_argument("--temperature", type=float, default=1.0)
    pg.add_argument("--out", default=None)
    pg.add_argument("--n-latents", dest="n_latents", type=int)

    px = sub.add_parser(
        "export",
        help="AOT-export the generation program (params baked in) to a "
        "self-contained StableHLO serving artifact",
    )
    _add_common(px)
    px.add_argument("--out", required=True, help="artifact path")
    px.add_argument(
        "--batch-size-export", dest="batch_size_export", default="8",
        help="static batch size of the artifact, or 'dynamic' for a "
        "batch-polymorphic export (one artifact, any request size)",
    )
    px.add_argument("--sample-z", action="store_true")
    px.add_argument(
        "--seed-mode", dest="seed_mode", default="per_row",
        choices=["per_row", "scalar"],
        help="per_row (default): (batch,) row seeds, rows are batch-"
        "position-independent so the serving host can coalesce "
        "concurrent requests exactly; scalar: legacy whole-batch seed",
    )
    px.add_argument("--n-latents", dest="n_latents", type=int)
    px.add_argument(
        "--platforms", default="cpu,tpu",
        help="comma-separated lowering platforms (default cpu,tpu)",
    )

    return parser


def main(argv=None) -> int:
    parser = _build_parser()
    args = parser.parse_args(argv)

    if getattr(args, "multihost", False):
        # Must run before any other JAX use (backends bind at first
        # device enumeration).
        from mmvae_tpu.parallel.multihost import initialize

        initialize()

    import jax.numpy as jnp

    from mmvae_tpu import api
    from mmvae_tpu.api import load_run_config as api_load_run_config
    from mmvae_tpu.configs import get_config

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    # Non-train commands start from the workdir's config snapshot (the
    # exact trained model); explicit flags still override.
    base = None
    if args.cmd != "train" and args.workdir:
        base = api_load_run_config(args.workdir)
        if base is not None and base.name != args.config:
            base = None
    config = base or get_config(args.config)
    explicit: set[str] = set()
    if getattr(args, "config_file", None):
        from mmvae_tpu.api import _tuplify

        with open(args.config_file) as f:
            overrides = json.load(f)
        overrides.pop("name", None)  # --config picks the experiment
        for kw_field in ("model_kwargs", "data_kwargs"):
            if kw_field in overrides:
                overrides[kw_field] = _tuplify(overrides[kw_field])
        config = config.replace(**overrides)
        explicit |= set(overrides)
    config = _overrides(args, config)

    # Choosing a non-mvae objective on a config whose DEFAULTS carry
    # mvae-only term knobs (celeba's n_random_subsets=4, cub's
    # cross_recon) should not trip the step guard: clear any knob the
    # user did not EXPLICITLY set (flag or config file). Explicit
    # conflicts still reach multi_term_loss's ValueError.
    if getattr(config, "objective", "mvae") != "mvae":
        inert = {}
        for field, v0 in (
            ("n_random_subsets", 0),
            ("cross_recon", False),
            ("cross_recon_stopgrad", False),
            ("unimodal_align_weight", 0.0),
        ):
            if (
                field not in explicit
                and getattr(args, field, None) is None
                and getattr(config, field) != v0
            ):
                inert[field] = v0
        if inert:
            print(
                f"[{config.name}] objective={config.objective}: "
                f"clearing mvae-only defaults {sorted(inert)}"
            )
            config = config.replace(**inert)

    if args.cmd == "train":
        result = api.train(
            config,
            args.workdir,
            seed=args.seed,
            dtype=dtype,
            use_mesh=not args.no_mesh,
            resume=args.resume,
        )
        import jax

        if jax.process_index() == 0:  # one JSON line per RUN, not host
            print(json.dumps({"best_test_elbo": result.best_test_elbo}))
        return 0

    if args.cmd == "eval":
        # Honor the config's eval-split segmenting (beyond-HBM lane):
        # a config that streams its eval split in train() must not
        # pre-stack it device-resident here either (round-5 review).
        eval_segs = api.resolve_eval_segments(config)
        elbo = api.eval_elbo(
            config, workdir=args.workdir, split=args.split, dtype=dtype,
            segment_steps=eval_segs,
        )
        out = {"split": args.split, "elbo": elbo}
        if args.iwae_k > 0:
            out["log_likelihood"] = api.log_likelihood(
                config,
                workdir=args.workdir,
                split=args.split,
                k=args.iwae_k,
                dtype=dtype,
                segment_steps=eval_segs,
            )
            out["iwae_k"] = args.iwae_k
        print(json.dumps(out))
        return 0

    if args.cmd == "sample":
        out = api.sample(
            config,
            n=args.n,
            workdir=args.workdir,
            seed=args.seed,
            temperature=args.temperature,
            dtype=dtype,
        )
        _dump(out, args.out, config_name=args.config)
        return 0

    if args.cmd == "generate":
        condition = {}
        for spec in args.condition_on:
            key, _, val = spec.partition("=")
            if os.path.exists(val):
                condition[key] = np.load(val)
            else:
                condition[key] = np.asarray(
                    json.loads(val)
                )  # inline scalar / list
                if condition[key].ndim == 0:
                    condition[key] = condition[key][None]
        out = api.generate(
            config,
            condition,
            n=args.n,
            workdir=args.workdir,
            seed=args.seed,
            sample_z=args.sample_z,
            temperature=args.temperature,
            dtype=dtype,
        )
        _dump(out, args.out, config_name=args.config)
        return 0

    if args.cmd == "export":
        from mmvae_tpu import serving

        path = serving.export_generate(
            config,
            args.out,
            batch_size=args.batch_size_export,
            workdir=args.workdir,
            sample_z=args.sample_z,
            platforms=tuple(args.platforms.split(",")),
            dtype=dtype,
            seed_mode=args.seed_mode,
        )
        print(
            json.dumps(
                {"written": path, "bytes": os.path.getsize(path)}
            )
        )
        return 0

    return 1


def _decode_text(tokens: np.ndarray, config_name: str) -> list[str]:
    """Human-readable decode of generated token sequences."""
    if config_name == "cub":
        # Must be the SAME vocabulary that sized the model: the real
        # corpus vocab when MMVAE_DATA_DIR mounts real CUB (ids up to
        # ~2004), else the synthetic one (configs._cub_vocab_size).
        vocab = None
        data_dir = os.environ.get("MMVAE_DATA_DIR", "")
        cub_dir = os.path.join(data_dir, "cub") if data_dir else ""
        if cub_dir and os.path.isdir(cub_dir):
            from mmvae_tpu.data.formats import cub_data_vocab

            vocab = cub_data_vocab(cub_dir)
        if vocab is None:
            from mmvae_tpu.data.synthetic import cub_vocab

            vocab = cub_vocab()
        return [vocab.decode(row) for row in tokens[:8]]
    # multimnist digit strings: token d+3 -> digit d.
    out = []
    for row in tokens[:8]:
        digits = [str(int(t) - 3) for t in row if t >= 3]
        out.append("".join(digits))
    return out


def _dump(out: dict, path: str | None, config_name: str = "") -> None:
    shapes = {k: list(np.asarray(v).shape) for k, v in out.items()}
    text = (
        {"text_decoded": _decode_text(np.asarray(out["text"]), config_name)}
        if "text" in out
        else {}
    )
    if path and path.endswith(".png"):
        # Reference sample.py parity: save the decoded images as a grid.
        from mmvae_tpu.utils import save_image_grid

        save_image_grid(np.asarray(out["image"]), path)
        print(json.dumps({"written": path, "shapes": shapes, **text}))
    elif path:
        np.savez(path, **{k: np.asarray(v) for k, v in out.items()})
        print(json.dumps({"written": path, "shapes": shapes, **text}))
    else:
        print(json.dumps({"shapes": shapes, **text}))


if __name__ == "__main__":
    sys.exit(main())
