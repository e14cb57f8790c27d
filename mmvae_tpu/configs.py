"""The five experiment configs (reference parity, [B:6-12] / SURVEY.md 2).

One dataclass config per experiment plus a single parameterized entry
point, replacing the reference's copy-of-train.py-per-experiment layout
(SURVEY.md section 5, config row). CLI flags override any field.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from mmvae_tpu.data.synthetic import cub_vocab
from mmvae_tpu.models import (
    CelebAMVAE,
    CubMVAE,
    DeepCubMVAE,
    DeepMnistMVAE,
    FashionMnistMVAE,
    MnistMVAE,
    MultiMnistMVAE,
)

__all__ = ["ExperimentConfig", "CONFIGS", "get_config", "build_model"]


@dataclasses.dataclass
class ExperimentConfig:
    """Hyperparameters of one experiment (reference CLI flags, SURVEY 2.11)."""

    name: str
    dataset: str
    n_latents: int
    epochs: int = 20
    batch_size: int = 100
    learning_rate: float = 1e-3
    annealing_epochs: int = 10  # --annealing-epochs (SURVEY.md 2.9)
    n_random_subsets: int = 0  # k sub-sampled modality combinations [B:5]
    objective: str = "mvae"  # multimodal training objective family:
    # "mvae" (reference: PoE joint + per-subset ELBOs, Wu & Goodman),
    # "mmvae" (mixture-of-experts posterior, Shi et al. 2019),
    # "mopoe" (mixture of subset-PoEs, Sutter et al. 2021) or
    # "mvtcae" (total-correlation VIB, Hwang et al. 2021). All four
    # run the same fused mask-matrix program (train/step.py); eval and
    # generation follow the objective (core/mixture.py)
    mvtcae_alpha: float = 0.9  # objective="mvtcae" KL mix: (1-a) to
    # the prior, a spread over the per-modality reverse cross-KLs
    # KL(q_joint || q_m) (the paper's alpha; its experiments run high
    # values -- cross-modal quality comes from the distillation term)
    member_prune: bool = True  # mvae-without-cross-recon only: decode
    # each decode key on its possibly-member term rows instead of all
    # T rows (identical loss/grads, parity-tested -- the zeroed decode
    # work is unprunable by XLA because the mask matrix is traced).
    # Escape hatch; measured on the v5e in BASELINE.md
    p_modality_drop: float = 0.0  # data-side modality dropout [B:5]
    grad_clip: float = 0.0  # global-norm gradient clipping (0 = off)
    cross_recon_weight: float = 1.0  # weight on CROSS recon entries
    # (modality m from a subset without m) when cross_recon is on;
    # >1 pressures unimodal posteriors toward cross-modal generation
    cross_recon: bool = False  # reconstruct all modalities from every
    # subset posterior (cross-modal supervision beyond reference
    # semantics; see docs/DESIGN.md section 9)
    cross_recon_stopgrad: bool = False  # cross entries supervise the
    # encoders only (decoder params stop-gradiented in cross recon --
    # the cross-modal averaging gradient never reaches the decoder)
    unimodal_align_weight: float = 0.0  # w*beta*KL(q(z|S)||sg(q(z|joint)))
    # over every non-joint subset term: distill subset posteriors toward
    # the (stop-gradiented) joint posterior -- encoder-side fix for
    # unimodal experts that collapse to the prior (train/step.py)
    cycle_weight: float = 0.0  # generation-path cycle consistency: seq
    # posterior -> render bernoulli modalities -> re-encode -> decode the
    # sequence back, CE vs the true sequence (decoders stop-gradiented;
    # trains encoders only -- train/step.py::multi_term_loss)
    cycle_render_binarize: bool | str = False  # hard-threshold the
    # cycle render at 0.5 (straight-through) before the re-encode: the
    # info channel must survive binarization, forcing above-threshold
    # strokes wherever the round trip carries content (structural
    # attack on the dim-render residual; train/step.py). True = hard
    # form only; "both" = cycle CE averaged over soft AND hard forms
    # (the channel must read back from either consumption form)
    cycle_contrast_weight: float = 0.0  # per-example pixel-moment match
    # (mean+std) between the cycle render and the paired true image --
    # the decoder-side contrast objective for dim-but-readable renders
    # (a uniform haze cannot match per-image std; stroke placement stays
    # free, so no position-averaging gradient). Requires cycle_weight>0
    cycle_render_grad: bool = False  # relax the cycle stop-grad on the
    # RENDER decode only: bernoulli decoders receive the cycle gradient
    # (measured attack on the low-contrast text-conditioned renders;
    # re-encode + final seq decode stay stop-gradiented)
    nan_rollback: int = 0  # failure containment: when an epoch's train
    # loss or test ELBO goes non-finite, restore the last finite
    # checkpoint, perturb the data-order rng, and continue -- at most N
    # rollbacks per run (0 = off, the run raises on the N+1th). Needs a
    # workdir (the rollback source is the epoch checkpoint); an epoch-1
    # blast with no checkpoint yet re-initializes from scratch instead
    train_size: int = 10000
    test_size: int = 2000
    log_interval: int = 100
    keep_epoch_ckpts: int = 0  # retain newest N per-epoch checkpoints
    # (reference saves every epoch, SURVEY.md 2.12; 0 = last/best only)
    data_backend: str = "device"  # "device" (HBM-resident gathers) or
    # "grain" (the [B:5] Grain pipeline: host-side shuffle/dropout
    # stream, stacked + shipped to device once per epoch)
    grain_stream_steps: int = 0  # grain backend delivery granularity:
    # 0 ships the whole stacked epoch (one transfer/epoch, epoch-sized
    # HBM residency); K>0 streams the epoch in K-batch segments with
    # double-buffered host gather + transfer (api._GrainStream) --
    # bounded memory (O(2 segments) host, O(1-2 segments) HBM) for
    # beyond-HBM datasets, trajectory bit-identical to whole-epoch
    eval_segment_steps: int = -1  # eval-split delivery granularity:
    # 0 keeps the padded split device-resident for the whole run (one
    # transfer, fastest); K>0 keeps it host-resident and streams K
    # batches at a time per eval (O(1 segment) HBM -- the eval half of
    # the beyond-HBM lane, api._make_split_evaluator); -1 = auto:
    # follow grain_stream_steps on the grain backend (a dataset big
    # enough to stream for training should not pre-stack its eval
    # split either), 0 otherwise
    data_dtype: str = "float32"  # stacked-batch storage dtype for float
    # modalities ("bfloat16" halves the per-step HBM batch read; measured
    # 2.3x on the MNIST bf16 point with identical loss trajectories --
    # docs/DESIGN.md section 10; "uint8" quarters it, quantizing to the
    # 1/255 grid -- EXACT for 8-bit-native real image data and 0/1
    # labels/attrs, dequantized in-program; eval/test data stays f32)
    accum_steps: int = 1  # gradient accumulation: average grads over k
    # micro-batches before one Adam update (optax.MultiSteps; effective
    # batch = k * batch_size at per-micro-batch memory)
    lr_schedule: str = "constant"  # "constant" (reference semantics) or
    # "cosine" (linear warmup over warmup_epochs -> cosine decay to 0
    # across the full run; optax schedule fed straight to Adam)
    warmup_epochs: int = 0  # linear LR warmup epochs (cosine schedule)
    shuffle_granularity: int = 1  # true-shuffle epochs permute
    # contiguous G-row groups (HBM-contiguous gather reads) instead of
    # single rows; 1 = exact row shuffle. A per-shuffle boundary-offset
    # roll keeps group membership from being permanent.
    reshuffle_every: int = 1  # true device-side reshuffle every K epochs
    # between-reshuffle epochs: "roll" rotates the resident arrays
    # (full streaming copy), "block" re-randomizes batch ORDER via
    # in-scan dynamic slices (zero copy; single-device path only)
    shuffle_mode: str = "roll"
    # (cheap rotation in between; K>1 amortizes the HBM row-gather that
    # dominates small-model steps -- docs/DESIGN.md section 10)
    ema_decay: float = 0.0  # Polyak/EMA shadow of params (0 = off);
    # eval/sample use the EMA weights when tracked
    fsdp: bool = False  # shard params + Adam moments over the data mesh
    # (ZeRO-3 via GSPMD, parallel/fsdp.py); default off -- these models
    # replicate trivially, the flag is the memory-scaling escape hatch
    ckpt_async: bool = False  # overlapped checkpointing
    # (train/checkpoint.py::AsyncCheckpointWriter): saves snapshot the
    # state on-device, stream it to host WHILE training continues, and
    # serialize/pointer-flip on a disk-only worker; a save point whose
    # pipeline is still draining is coalesced (skipped) instead of
    # stalling training. Bounded-resume semantics of ckpt_every with N
    # picked by the I/O path; the final epoch always saves
    # synchronously. Single-process only (multi-host keeps the
    # collective sync path)
    ckpt_every: int = 1  # checkpoint every N epochs (1 = reference
    # semantics: save each epoch). The save's device->host fetch
    # dominates big-model epochs on a relay-attached chip (CUB-128:
    # ~182 MB state, measured 6-9 s/epoch vs 2.5 s of compute+eval);
    # N>1 amortizes it. The final epoch always saves; best-tracking
    # then names the best among SAVED epochs, and preemption resume
    # restarts from the last saved epoch.
    tp: int = 1  # tensor parallelism: devices fold into a 2-D
    # (data, model) mesh with tp-way model groups -- column/row-parallel
    # Dense stacks + expert-parallel attr banks (parallel/tp.py);
    # mutually exclusive with fsdp, takes the pre-stacked epoch path
    pp: int = 1  # pipeline parallelism: devices fold into a 2-D
    # (data, pipe) mesh; the model's stage-stacked trunks shard their
    # stage axis and run the GPipe microbatch schedule (parallel/pp.py).
    # Needs a trunk model ("deep_cub"/"deep_mnist") with trunk_stages
    # == pp; mutually exclusive with fsdp/tp, pre-stacked epoch path
    model_kwargs: dict[str, Any] = dataclasses.field(default_factory=dict)
    data_kwargs: dict[str, Any] = dataclasses.field(default_factory=dict)
    # kwargs forwarded to the synthetic data generator (e.g. hw=128 for
    # the 128x128 CUB config); ignored when real data is mounted under
    # $MMVAE_DATA_DIR -- mounted data must already match the model shape

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


CONFIGS: dict[str, ExperimentConfig] = {
    # 1. MVAE on MNIST image+label -- MLP encoders, PoE, full ELBO [B:7]
    "mnist": ExperimentConfig(
        name="mnist", dataset="mnist", n_latents=64,
        annealing_epochs=10,
    ),
    # 1b. Deep-trunk MNIST -- the pipeline-parallelism vehicle (rebuild
    # extension, no reference counterpart): image experts carry a
    # stage-stacked residual trunk; with pp == trunk_stages the trunk
    # runs the GPipe schedule over a (data, pipe) mesh (DESIGN.md 14)
    "deep_mnist": ExperimentConfig(
        name="deep_mnist", dataset="mnist", n_latents=64,
        annealing_epochs=10,
    ),
    # 2. FashionMNIST bimodal -- conv image encoder + label expert [B:8]
    "fashionmnist": ExperimentConfig(
        name="fashionmnist", dataset="fashionmnist", n_latents=64,
    ),
    # 3. MultiMNIST -- conv encoder + digit-string sequence decoder [B:9]
    # Validated settings (rounds 2-3, BASELINE.md): 256-latent, 4-stage
    # conv, wider GRU, cross-recon terms, 100k synthetic train set
    # (round 2: 89.0% per-token / 79.1% exact image->digit-string; the
    # round-1 128-latent/3-stage variant scored 79.7%/66.0% --
    # exact-match was capacity-limited). Round 3 adds the measured
    # text->image fix: cycle_weight=1 + a 128-dim content slice
    # (text_latent_dims) lifts text->image->text from 3.9% to 87.9%
    # exact -- the only knob of five measured that moved the round trip
    # -- and cycle_render_grad=True (the render decode also trains the
    # image decoder) takes it to 98.4% exact while IMPROVING
    # image->text (78.7%/86.5% multiset) and test ELBO (497.5 vs
    # 520.2); renders stay low-contrast either way (BASELINE.md).
    # Round 4 promoted cycle_render_binarize="both" (dual-form cycle
    # CE): the 2-seed matrix (BASELINE.md, tools/run_mm_seeds.sh)
    # showed the round-3 blocker (-2pt image->text) was seed noise
    # (default 77.9/77.2 vs both 76.8/77.9 exact), while "both"
    # consistently wins the round trip (99.2-99.6 vs 96.9-97.3 exact)
    # AND renders genuinely sharp strokes (max pixel ~0.59 vs the
    # steganographic ~0.12) for ~15 test-ELBO nats -- the honest
    # (non-steganographic) channel is now the default.
    "multimnist": ExperimentConfig(
        name="multimnist", dataset="multimnist", n_latents=256,
        cross_recon=True, grad_clip=500.0, epochs=60, train_size=100000,
        cycle_weight=1.0, cycle_render_grad=True,
        cycle_render_binarize="both",
        model_kwargs={
            "conv_features": (32, 64, 128, 256),
            "lambda_text": 30.0,
            "text_hidden": 256,
            "text_latent_dims": 128,
        },
    ),
    # 4. CelebA image + 18 attrs -- per-attribute experts, k subsets [B:10]
    "celeba": ExperimentConfig(
        name="celeba", dataset="celeba", n_latents=100,
        batch_size=64, n_random_subsets=4, grad_clip=500.0,
    ),
    # 5. CUB images + captions -- conv + text experts, largest [B:11]
    # Validated settings (round 2, BASELINE.md: 99.9% per-token / 98.8%
    # exact-match captions vs 96.4%/52.3% at 128 latents without
    # cross-recon -- caption exact-match was capacity-limited too).
    # Round 3: the MultiMNIST cycle fix transfers at LOW weight only --
    # cycle_weight=0.1 + render-grad lifts caption->image->caption from
    # 52.7% to 96.1% exact at ~2pt image->caption cost and BETTER test
    # ELBO (15598 vs 15607); weight 1 instead crashes image->caption to
    # 51% (both measured, docs/experiments/round3_cub/).
    "cub": ExperimentConfig(
        name="cub", dataset="cub", n_latents=256, batch_size=64,
        cross_recon=True, epochs=60, train_size=16000,
        cycle_weight=0.1, cycle_render_grad=True,
    ),
    # 5b. Deep-trunk CUB -- the reference-family pipeline-parallelism
    # config (round 4): the cub experiment with stage-stacked residual
    # trunks at the image experts' bottlenecks; --pp == trunk_stages
    # runs them as GPipe pipelines over a (data, pipe) mesh while the
    # conv/text/fusion dataflow stays DP (models/pipeline.py
    # ::DeepCubMVAE, DESIGN.md 14). Quality: parity with cub (99.8%
    # exact captions at seed 1, round 5); NOTE the whole cub family's
    # exact-match metrics are bimodal across seeds (85-100% vs ~50%
    # basins at ~0.1% ELBO delta, BASELINE.md round-5 table) -- train
    # 2 seeds for quality-critical runs and keep the better basin.
    "deep_cub": ExperimentConfig(
        name="deep_cub", dataset="cub", n_latents=256, batch_size=64,
        cross_recon=True, epochs=60, train_size=16000,
        cycle_weight=0.1, cycle_render_grad=True,
    ),
}

_MODEL_CLASSES = {
    "mnist": MnistMVAE,
    "deep_mnist": DeepMnistMVAE,
    "fashionmnist": FashionMnistMVAE,
    "multimnist": MultiMnistMVAE,
    "celeba": CelebAMVAE,
    "cub": CubMVAE,
    "deep_cub": DeepCubMVAE,
}


def get_config(name: str) -> ExperimentConfig:
    if name not in CONFIGS:
        raise ValueError(f"unknown config {name!r}; have {list(CONFIGS)}")
    return CONFIGS[name]


def build_model(
    config: ExperimentConfig, dtype=jnp.float32, pp_mesh=None,
    tp_mesh=None,
):
    """Model from a config. ``pp_mesh`` builds the PIPELINED execution
    variant (same parameter tree as the sequential default — states and
    checkpoints move freely between the two; models/pipeline.py).
    ``tp_mesh`` builds the TP execution variant: conv activations are
    pinned to the col/row chain layout so the conv FLOPs run
    model-parallel (models/experts.py) — also the same parameter tree;
    models without conv chains (mnist) ignore it (their Dense stacks
    need no in-model hooks)."""
    cls = _MODEL_CLASSES[config.name]
    kwargs = dict(config.model_kwargs)
    if config.dataset == "cub" and "vocab_size" not in kwargs:
        kwargs["vocab_size"] = _cub_vocab_size()
    if pp_mesh is not None:
        if "pp_mesh" not in {f.name for f in dataclasses.fields(cls)}:
            raise ValueError(
                f"config {config.name!r} has no pipeline trunks; "
                "pp>1 needs a trunk model (deep_cub or deep_mnist)"
            )
        kwargs["pp_mesh"] = pp_mesh
    if tp_mesh is not None and "tp_mesh" in {
        f.name for f in dataclasses.fields(cls)
    }:
        kwargs["tp_mesh"] = tp_mesh
    return cls(n_latents=config.n_latents, dtype=dtype, **kwargs)


def _cub_vocab_size() -> int:
    """CUB text-expert vocab size: the real corpus vocabulary when a
    real CUB dataset is mounted (its persisted ``vocab.json``), else the
    synthetic vocabulary."""
    import os

    data_dir = os.environ.get("MMVAE_DATA_DIR", "")
    if data_dir:
        cub_dir = os.path.join(data_dir, "cub")
        if os.path.isdir(cub_dir):
            from mmvae_tpu.data.formats import cub_data_vocab

            v = cub_data_vocab(cub_dir)
            if v is not None:
                return len(v)
    return len(cub_vocab())
