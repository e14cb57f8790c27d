"""Public API: train, eval_elbo, sample, generate (reference parity [B:5]).

The reference exposes these four capabilities through per-experiment
``train.py`` / ``sample.py`` scripts (SURVEY.md 2.11-2.13); here they are
one parameterized API over the five experiment configs, with Orbax
checkpointing wired through all four (SURVEY.md section 5).
"""

from __future__ import annotations

import collections.abc as _collections_abc
import os
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mmvae_tpu.configs import ExperimentConfig, build_model, get_config
from mmvae_tpu.data import load_dataset, stacked_epoch, stacked_epoch_padded
from mmvae_tpu.data import grain_pipeline as epoch_plan_mod
from mmvae_tpu.core import fuse_observed_z
from mmvae_tpu.parallel import make_mesh, replicate
from mmvae_tpu.train import (
    create_train_state,
    make_epoch_runner,
    make_eval_runner,
)
from mmvae_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from mmvae_tpu.train.metrics import AverageMeter, MetricsWriter

__all__ = [
    "train",
    "eval_elbo",
    "sample",
    "generate",
    "TrainResult",
    "load_run_config",
    "resolve_eval_segments",
]


def _resolve(config) -> ExperimentConfig:
    return get_config(config) if isinstance(config, str) else config


def _save_run_config(workdir: str, config: ExperimentConfig) -> None:
    """Snapshot the experiment config next to the checkpoints so later
    eval/sample/generate rebuild the exact same model (no flag-matching
    footgun)."""
    import dataclasses
    import json

    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(config), f, indent=2)


def _tuplify(obj):
    """JSON round trip turns tuples into lists; model_kwargs feed flax
    module fields which must stay hashable (runner memoization keys on
    the module) -- convert lists back to tuples recursively."""
    if isinstance(obj, list):
        return tuple(_tuplify(x) for x in obj)
    if isinstance(obj, dict):
        return {k: _tuplify(v) for k, v in obj.items()}
    return obj


def load_run_config(workdir: str) -> ExperimentConfig | None:
    """Config snapshot saved by :func:`train`, or None if absent."""
    import json

    path = os.path.join(workdir, "config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    d["model_kwargs"] = _tuplify(d.get("model_kwargs", {}))
    d["data_kwargs"] = _tuplify(d.get("data_kwargs", {}))
    return ExperimentConfig(**d)


def resolve_eval_segments(config) -> int:
    """The effective eval-split segmenting for a config:
    ``eval_segment_steps`` with -1 (auto) resolving to the grain
    backend's ``grain_stream_steps`` (a dataset big enough to stream
    for training should not pre-stack its eval split either), else 0.
    One definition shared by ``train`` and the CLI eval command."""
    segs = getattr(config, "eval_segment_steps", -1)
    if segs < 0:
        segs = (
            getattr(config, "grain_stream_steps", 0)
            if getattr(config, "data_backend", "device") == "grain"
            else 0
        )
    return segs


def _resolve_with_workdir(config, workdir: str | None) -> ExperimentConfig:
    """Prefer the workdir's config snapshot (exact trained model) when
    the caller passed only a config name."""
    if isinstance(config, str) and workdir is not None:
        stored = load_run_config(workdir)
        if stored is not None and stored.name == config:
            return stored
    return _resolve(config)


# Storage dtypes the ``data_dtype`` knob accepts for float modalities
# (int/token modalities are never touched).
_DATA_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "uint8": jnp.uint8,
}


def _grain_seed(seed: int, epoch: int, rollbacks: int) -> int:
    """The grain backend's per-epoch shuffle seed.

    Epoch-indexed (preemption-exact resume: a restarted process replays
    the same orders); rollback retries perturb it so a data-order NaN
    is not replayed deterministically. One definition shared by the
    train loop and the prefetcher -- a hit/miss mismatch between them
    would silently train on the wrong epoch's order."""
    return seed * 100003 + epoch + rollbacks * 7919


def _cast_source_arrays(
    arrays: dict[str, np.ndarray], data_dtype: str
) -> dict[str, np.ndarray]:
    """Apply the ``data_dtype`` storage cast ONCE at source granularity.

    Same bandwidth knob as the device backend: float modalities ship
    and stream as bf16 (halves the host->device transfer AND the
    per-step HBM batch read) or uint8 (quarter bytes, exact for
    8-bit-native real data; dequantized in-program). Casting the
    SOURCE (not each stacked epoch) makes the cast a one-time cost and
    shrinks every subsequent per-epoch gather's bytes -- the gather is
    the whole host cost of a grain epoch now (data/grain_pipeline.py).
    Cast-then-gather equals gather-then-cast bit-for-bit (elementwise),
    so the trajectory is unchanged. The presence mask never passes
    through here (it is plan-derived, not source data -- see
    ``grain_pipeline.epoch_plan``), staying float32 as the step
    requires.

    Delegates to ``data.pipelines.dataset_astype`` so the grain and
    device backends share ONE cast implementation -- the quantizer
    contract (pipelines.quantize_uint8) says the two must stay
    rounding-identical, which rules out a second copy of the
    selection logic here."""
    if data_dtype == "float32":
        return arrays
    from mmvae_tpu.data.pipelines import Dataset, dataset_astype

    size = len(next(iter(arrays.values())))
    return dataset_astype(
        Dataset(arrays=arrays, size=size), _DATA_DTYPES[data_dtype]
    ).arrays


def _grain_epoch_host(
    train_ds, config, model, seed: int, arrays=None
) -> dict[str, np.ndarray]:
    """Host half of a grain epoch: plan -> one gather per modality.

    Pure vectorized numpy (no jax dispatch, no per-example Python) so
    it can run on the stream's worker thread while the device trains
    the previous epoch/segment. ~150x the per-example grain loader's
    rate on this 1-core host (BASELINE.md grain delta, round 4).
    ``arrays`` optionally supplies pre-cast source arrays (the stream
    caches them); otherwise the ``data_dtype`` cast applies here."""
    from mmvae_tpu.data.grain_pipeline import epoch_plan, gather_batches

    names = [s.name for s in model.specs()]
    if arrays is None:
        arrays = _cast_source_arrays(
            {k: np.asarray(v) for k, v in train_ds.arrays.items()},
            config.data_dtype,
        )
    perm, presence = epoch_plan(
        train_ds.size,
        config.batch_size,
        seed,
        n_modalities=len(names),
        p_drop=config.p_modality_drop,
    )
    return gather_batches(arrays, perm, presence, config.batch_size)


def _stacked_to_device(stacked, sharding=None):
    if sharding is not None:
        return {k: jax.device_put(v, sharding) for k, v in stacked.items()}
    return {k: jnp.asarray(v) for k, v in stacked.items()}


def _grain_epoch(train_ds, config, model, seed: int, sharding=None):
    """One epoch through the Grain pipeline ([B:5]), stacked for the
    scan-fused runner: Grain does the shuffle + modality-dropout on the
    host, the result ships to device once (one transfer per epoch --
    same dispatch profile as the device-resident path)."""
    return _stacked_to_device(
        _grain_epoch_host(train_ds, config, model, seed), sharding
    )


class _LazyConcatMetrics(_collections_abc.Mapping):
    """Per-key lazy concatenation of per-segment metric dicts.

    The train loop reads ``ms["loss"]`` every epoch but the other ~8
    metric keys only when a writer is attached; eagerly fetching every
    key forces n_segs x n_keys blocking device->host reads per epoch
    on the latency-bound relay. Concatenate (and fetch) per key on
    first access, cache the result. A ``Mapping`` subclass so every
    consumer of the plain-dict metrics (``.items()``/``.get()``/
    ``.keys()``) works identically on the segmented path (round-4
    ADVICE)."""

    def __init__(self, mss: list):
        self._mss = mss
        self._cache: dict[str, np.ndarray] = {}

    def __contains__(self, name) -> bool:
        # Cheaper than Mapping's default (which would FETCH the key).
        return name in self._mss[0]

    def __iter__(self):
        return iter(self._mss[0])

    def __len__(self) -> int:
        return len(self._mss[0])

    def __getitem__(self, name) -> np.ndarray:
        if name not in self._cache:
            self._cache[name] = np.concatenate(
                [np.asarray(m[name]) for m in self._mss]
            )
        return self._cache[name]


class _GrainStream:
    """Double-buffered, segment-granular pipeline for the grain backend.

    The epoch is planned once (permutation + presence --
    ``grain_pipeline.epoch_plan``) and delivered in SEGMENTS of
    ``config.grain_stream_steps`` batches (0 = whole epoch, the
    one-epoch-ahead behavior). A single worker thread gathers the HOST
    half of segment k+1 (vectorized fancy-index over pre-cast source
    arrays -- pure numpy, no jax dispatch) while the device trains
    segment k; the main thread issues the host->device transfer.
    Memory is O(2 segments) on host and O(1-2 segments) in HBM, not
    O(2 epochs) -- the bounded-buffer path for beyond-HBM datasets
    (VERDICT r3 missing #1).

    The worker is deliberately host-only: a first version also issued
    the ``device_put`` from the worker, and while jax dispatch is
    documented thread-safe, one CLI run wedged indefinitely on the
    experimental axon TPU client with the worker's transfer racing the
    first-epoch eval compile / Orbax save (observed 2026-08-19;
    intermittent -- the same command then passed repeatedly). Keeping
    every jax entry on one thread removes that class of hazard; the
    host gather is the measured dominator of the grain epoch, so the
    overlap win survives (BASELINE.md grain delta).

    EXACTNESS: every delivered segment is a pure function of
    ``(seed, seg_idx)`` over the same plan the serial/whole-epoch path
    uses, and ``lax.scan`` over concatenated segments is the same
    computation as one epoch-long scan with the state threaded through
    -- so the streamed trajectory is bit-identical to the whole-epoch
    one (pinned by tests/test_grain.py). A ``take`` whose key does not
    match the scheduled one (first epoch; nan_rollback retries, which
    perturb the seed) computes inline -- the stream can go stale,
    never wrong.
    """

    def __init__(self, train_ds, config, model, sharding=None):
        import threading
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(
            1, thread_name_prefix="grain-stream"
        )
        self._ds = train_ds
        self._config = config
        self._model = model
        self._arrays = _cast_source_arrays(
            {k: np.asarray(v) for k, v in train_ds.arrays.items()},
            config.data_dtype,
        )
        self._names = [s.name for s in model.specs()]
        self._sharding = sharding
        self._steps = train_ds.size // config.batch_size
        if self._steps == 0:
            # Surface the informative error at construction (the old
            # prefetcher surfaced it on the first take; a bare
            # ZeroDivisionError below would lose the batch-size hint).
            raise ValueError(
                f"grain epoch yields no batches: train_size "
                f"{train_ds.size} < batch_size {config.batch_size}"
            )
        seg = int(getattr(config, "grain_stream_steps", 0) or 0)
        self._seg_steps = (
            self._steps if seg <= 0 else min(seg, self._steps)
        )
        self._n_segs = -(-self._steps // self._seg_steps)
        self._key: tuple[int, int] | None = None
        self._fut = None
        self._plans: dict[int, tuple] = {}
        self._plan_lock = threading.Lock()
        # Prefetch observability (round-4 VERDICT weak #6): a take()
        # whose scheduled future matches is a hit; a miss computes the
        # segment inline -- correct but serial. A persistently low
        # hit rate means the double-buffering has silently degraded
        # (wedged worker, scheduling bug); surfaced per epoch as the
        # ``stream_hit_rate`` JSONL field.
        self.hits = 0
        self.misses = 0

    @property
    def hit_rate(self) -> float:
        """Cumulative fraction of segment takes served by the prefetch
        worker (NaN before the first take)."""
        n = self.hits + self.misses
        return self.hits / n if n else float("nan")

    def _plan(self, seed: int):
        """Per-epoch plan, memoized (current + lookahead epochs live at
        once; worker and main thread both resolve plans -- the lock
        keeps the memo coherent, and recomputing on a lost race would
        only waste work, never change the result)."""
        with self._plan_lock:
            if seed not in self._plans:
                # Evict oldest-first (insertion order): the current and
                # lookahead epochs' plans are the newest entries, so
                # they survive -- a blanket clear() here forced a
                # redundant O(N) replan every ~5 epochs (round-4
                # ADVICE).
                while len(self._plans) > 4:
                    del self._plans[next(iter(self._plans))]
                self._plans[seed] = epoch_plan_mod.epoch_plan(
                    self._ds.size,
                    self._config.batch_size,
                    seed,
                    n_modalities=len(self._names),
                    p_drop=self._config.p_modality_drop,
                )
            return self._plans[seed]

    def _host_seg(self, seed: int, k: int) -> dict[str, np.ndarray]:
        perm, presence = self._plan(seed)
        b = self._config.batch_size
        lo = k * self._seg_steps * b
        hi = min((k + 1) * self._seg_steps, self._steps) * b
        return epoch_plan_mod.gather_batches(
            self._arrays,
            perm[lo:hi],
            None if presence is None else presence[lo:hi],
            b,
        )

    def schedule(self, key: tuple[int, int]) -> None:
        if self._fut is not None and self._key == key:
            return
        self._key = key
        self._fut = self._pool.submit(self._host_seg, *key)

    def take(self, key: tuple[int, int]) -> dict[str, np.ndarray]:
        fut, hit = self._fut, self._key == key
        self._fut = self._key = None
        if fut is not None and hit:
            self.hits += 1
            return fut.result()
        if fut is not None:
            fut.cancel()
        self.misses += 1
        return self._host_seg(*key)

    def run_epoch(self, state, runner, seed: int, next_seed=None):
        """Stream one epoch through ``runner``: (state, metrics).

        For each segment: take the (usually prefetched) host half,
        schedule the next one, transfer from this thread, dispatch the
        scan. XLA dispatch is async, so while the device trains
        segment k the worker gathers k+1. ``next_seed`` prefetches the
        FIRST segment of the next epoch behind the final dispatch."""
        mss = []
        for k in range(self._n_segs):
            host = self.take((seed, k))
            if k + 1 < self._n_segs:
                self.schedule((seed, k + 1))
            elif next_seed is not None:
                self.schedule((next_seed, 0))
            state, ms = runner(
                state, _stacked_to_device(host, self._sharding)
            )
            mss.append(ms)
        if len(mss) == 1:
            return state, mss[0]
        return state, _LazyConcatMetrics(mss)

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)


class TrainResult(NamedTuple):
    config: ExperimentConfig
    model: Any
    state: Any
    best_test_elbo: float
    history: list[dict[str, float]]


def train(
    config: str | ExperimentConfig,
    workdir: str | None = None,
    *,
    seed: int = 0,
    dtype=jnp.float32,
    use_mesh: bool = True,
    resume: bool = False,
    verbose: bool = True,
    fault_hook=None,
) -> TrainResult:
    """Train an experiment config; checkpoint each epoch, track best.

    Mirrors the reference training loop (SURVEY.md 3a): per-epoch train
    pass with KL annealing, test-ELBO eval, best-model checkpointing --
    but as one jitted multi-term step over a data-parallel mesh.

    ``config.nan_rollback > 0`` adds failure containment (SURVEY.md
    section 5 "failure detection / elastic recovery"): a non-finite
    epoch (train loss or test ELBO) restores the last finite
    checkpoint, perturbs the data-order rng so the retry is not a
    deterministic replay, and continues -- at most ``nan_rollback``
    times per run before raising. ``fault_hook(epoch, state) -> state``
    is the fault-injection seam (SURVEY.md section 5): called after
    every epoch's train pass, it lets recovery tests poison the live
    state exactly the way a hardware blast would. None in production.
    """
    config = _resolve(config)
    if config.nan_rollback > 0 and workdir is None:
        raise ValueError(
            "nan_rollback needs a workdir: the rollback source is the "
            "per-epoch checkpoint"
        )
    # Multi-host: every process runs the identical loop over the global
    # mesh (deterministic data + seeds keep them in lockstep); exactly
    # one process owns host-side writes (parallel/multihost.py).
    primary = jax.process_index() == 0
    if workdir is not None and primary:
        _save_run_config(workdir, config)
    model = build_model(config, dtype=dtype)
    tp = getattr(config, "tp", 1)
    pp = getattr(config, "pp", 1)
    if tp < 1:
        raise ValueError(f"tp must be >= 1, got {tp}")
    if pp < 1:
        raise ValueError(f"pp must be >= 1, got {pp}")
    if tp > 1 and config.fsdp:
        raise ValueError("tp>1 and fsdp are mutually exclusive")
    if pp > 1 and (config.fsdp or tp > 1):
        raise ValueError("pp>1 is mutually exclusive with fsdp/tp")
    train_model = model
    if tp > 1:
        if not use_mesh or len(jax.devices()) % tp:
            raise ValueError(
                f"tp={tp} needs use_mesh and a device count divisible "
                f"by tp (have {len(jax.devices())})"
            )
        from mmvae_tpu.parallel import make_mesh_2d

        mesh = make_mesh_2d(tp)
        # The TRAIN step runs the TP execution variant (in-model conv
        # activation constraints -- same parameter tree); eval,
        # sampling and checkpoint templates keep the sequential one.
        train_model = build_model(config, dtype=dtype, tp_mesh=mesh)
    elif pp > 1:
        if not use_mesh or len(jax.devices()) % pp:
            raise ValueError(
                f"pp={pp} needs use_mesh and a device count divisible "
                f"by pp (have {len(jax.devices())})"
            )
        if getattr(model, "trunk_stages", None) != pp:
            raise ValueError(
                f"pp={pp} needs a trunk model with trunk_stages == pp "
                f"(got {getattr(model, 'trunk_stages', None)!r}; "
                "use the deep_cub or deep_mnist config)"
            )
        from mmvae_tpu.parallel import make_mesh_pp

        mesh = make_mesh_pp(pp)
        n_data = len(jax.devices()) // pp
        micro = model.pp_n_micro
        if config.batch_size % (n_data * micro):
            raise ValueError(
                f"batch_size={config.batch_size} must divide into "
                f"{micro} microbatches per {n_data}-way data shard"
            )
        # The TRAIN step runs the pipelined variant; eval, sampling and
        # checkpoint templates keep the sequential one (same parameter
        # tree -- models/pipeline.py).
        train_model = build_model(config, dtype=dtype, pp_mesh=mesh)
    else:
        mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None

    train_ds = load_dataset(
        config.dataset, "train", n=config.train_size,
        gen_kwargs=config.data_kwargs,
        # The grain backend streams host->device itself (whole epochs
        # or bounded segments); loading with device_put=True would
        # commit the full f32 dataset to HBM first -- an OOM for the
        # beyond-HBM datasets the stream exists for, and a wasted
        # full-dataset round trip through the relay otherwise.
        device_put=(config.data_backend != "grain"),
    )
    eval_segs = resolve_eval_segments(config)
    test_ds = load_dataset(
        config.dataset, "test", n=config.test_size,
        gen_kwargs=config.data_kwargs,
        # Segmented eval keeps the split host-resident (beyond-HBM
        # lane); committing it to HBM at load would defeat that.
        device_put=(eval_segs == 0),
    )
    if config.data_dtype != "float32" and config.data_backend == "device":
        # Store the device-resident float modalities in bf16 or uint8
        # ONCE: every epoch's gather and every step's batch read then
        # move half (bf16) or a quarter (uint8) of the f32 HBM bytes
        # (measured 2.3x on the MNIST bf16 point, loss trajectories
        # identical -- docs/DESIGN.md section 10; uint8 is exact for
        # 8-bit-native real image data and dequantizes in-program,
        # train/step.py::_dequant_data). Eval data stays f32: the
        # parity metric is untouched. (The grain backend applies the
        # same cast once at source granularity -- _cast_source_arrays.)
        from mmvae_tpu.data import dataset_astype

        train_ds = dataset_astype(
            train_ds, _DATA_DTYPES[config.data_dtype]
        )
    steps_per_epoch = train_ds.size // config.batch_size
    annealing_steps = config.annealing_epochs * steps_per_epoch

    rng = jax.random.key(seed)
    init_batch = {
        k: v[: config.batch_size] for k, v in train_ds.arrays.items()
    }
    state = create_train_state(
        model, init_batch, rng,
        _learning_rate(config, steps_per_epoch=steps_per_epoch),
        grad_clip=config.grad_clip, ema_decay=config.ema_decay,
        accum_steps=config.accum_steps,
    )
    start_epoch = 1
    best = float("inf")
    if resume and workdir is not None:
        from mmvae_tpu.train.checkpoint import latest_epoch

        if latest_epoch(workdir) is not None:
            state, extra = load_checkpoint(workdir, state, which="last")
            start_epoch = int(extra.get("epoch", 0)) + 1
            best = float(extra.get("best_test_elbo", best))
    # Best among SAVED epochs (== best when ckpt_every=1): the best
    # checkpoint pointer can only ever name an epoch that was saved.
    best_saved = best
    out_state_shardings = None
    if mesh is not None:
        if config.fsdp:
            from mmvae_tpu.parallel import fsdp_shard, state_shardings

            state = fsdp_shard(state, mesh)
            out_state_shardings = state_shardings(state)
        elif tp > 1:
            from mmvae_tpu.parallel import state_shardings, tp_shard

            state = tp_shard(state, mesh)
            out_state_shardings = state_shardings(state)
        elif pp > 1:
            from mmvae_tpu.parallel import pp_shard, state_shardings

            state = pp_shard(state, mesh)
            out_state_shardings = state_shardings(state)
        else:
            state = replicate(state, mesh)

    # The whole epoch is one lax.scan'd XLA program (zero per-step host
    # dispatch); metrics come back stacked and are fetched once per epoch.
    # Single-device + device-backend: the batch gather runs INSIDE the
    # program too (one dispatch per epoch, no stacked HBM copy; the
    # remote relay's per-dispatch latency made the pre-stacked gather
    # measurable -- docs/DESIGN.md section 10).
    runner_kwargs = dict(
        n_random_subsets=config.n_random_subsets,
        annealing_steps=annealing_steps,
        p_modality_drop=config.p_modality_drop,
        cross_recon=config.cross_recon,
        cross_recon_weight=getattr(config, "cross_recon_weight", 1.0),
        cross_recon_stopgrad=getattr(
            config, "cross_recon_stopgrad", False
        ),
        unimodal_align_weight=getattr(
            config, "unimodal_align_weight", 0.0
        ),
        cycle_weight=getattr(config, "cycle_weight", 0.0),
        cycle_render_grad=getattr(config, "cycle_render_grad", False),
        cycle_contrast_weight=getattr(
            config, "cycle_contrast_weight", 0.0
        ),
        cycle_render_binarize=getattr(
            config, "cycle_render_binarize", False
        ),
        objective=getattr(config, "objective", "mvae"),
        mvtcae_alpha=getattr(config, "mvtcae_alpha", 0.9),
        member_prune=getattr(config, "member_prune", True),
    )
    n_mesh_devices = 1 if mesh is None else int(mesh.devices.size)
    # The in-program shuffle+gather fast path composes with the DP mesh
    # (round-3): arrays live batch-sharded, each device permutes its own
    # shard per epoch, a cross-shard roll every reshuffle_every epochs
    # rotates membership (train/step.py::make_gather_epoch_runner).
    # FSDP keeps the pre-stacked path (its out-sharding pins don't cover
    # the donated-arrays signature).
    in_program_gather = (
        config.data_backend == "device"
        and not config.fsdp
        and tp == 1
        and pp == 1
        and train_ds.size % max(n_mesh_devices, 1) == 0
    )
    if config.reshuffle_every > 1 and not in_program_gather:
        import warnings

        warnings.warn(
            "reshuffle_every>1 only applies to the in-program gather "
            "path (device backend); this run shuffles every epoch",
            stacklevel=2,
        )
    if in_program_gather:
        from mmvae_tpu.train import make_gather_epoch_runner

        shuffle_mode = getattr(config, "shuffle_mode", "roll")
        runner = make_gather_epoch_runner(
            model, steps_per_epoch, config.batch_size,
            reshuffle_every=config.reshuffle_every,
            n_shards=n_mesh_devices, shuffle_mode=shuffle_mode,
            mesh=mesh,
            shuffle_granularity=getattr(
                config, "shuffle_granularity", 1
            ),
            **runner_kwargs
        )
        if mesh is not None:
            # Host-shuffle ONCE so initial shard membership is random
            # (the in-program path then never needs a global random
            # gather), and place each modality batch-sharded.
            from mmvae_tpu.parallel import batch_sharding

            perm = np.random.default_rng(seed ^ 0x5EED).permutation(
                train_ds.size
            )
            train_arrays = {
                k: jax.device_put(
                    np.asarray(v)[perm], batch_sharding(mesh)
                )
                for k, v in train_ds.arrays.items()
            }
        else:
            train_arrays = dict(train_ds.arrays)
    else:
        runner = make_epoch_runner(
            train_model,
            out_state_shardings=out_state_shardings,
            # Off-mesh (grain / single-device pre-stacked) epochs take
            # the t-major fast fold; mesh epochs need the sharding-safe
            # b-major fold (train/step.py::multi_term_loss).
            term_fold="t" if mesh is None else "b",
            **runner_kwargs,
        )
    stacked_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # Leading axis = steps (unsharded), batch axis over every mesh
        # axis (data on 1-D meshes; (dcn, data) on multi-slice meshes)
        # EXCEPT the TP model axis and the PP pipe axis, which see
        # replicated batches (the model-axis work is layer-internal --
        # parallel/tp.py; the pipe-axis work is the schedule's --
        # parallel/pp.py).
        batch_axes = tuple(
            a for a in mesh.axis_names if a not in ("model", "pipe")
        )
        stacked_sharding = NamedSharding(mesh, P(None, batch_axes))

    writer = (
        MetricsWriter(workdir)
        if workdir is not None and primary
        else None
    )
    np_rng = np.random.default_rng(seed)
    # Pad + stack the eval split ONCE for the whole run (round-2 weak
    # #7: re-padding/gathering it per epoch is one full-split jnp.take
    # per epoch -- wasteful at 128x128-CUB scale).
    eval_mesh = mesh if jax.process_count() == 1 else None
    evaluate = _make_split_evaluator(
        model, test_ds, config.batch_size,
        objective=getattr(config, "objective", "mvae"),
        mvtcae_alpha=getattr(config, "mvtcae_alpha", 0.9),
        member_prune=getattr(config, "member_prune", True),
        # Mesh eval is single-process only: multi-host keeps the
        # process-local evaluator over fetch_replicated params (each
        # host already holds the full split + replicated weights).
        mesh=eval_mesh,
        segment_steps=eval_segs,
    )
    if eval_mesh is not None and not evaluate.mesh_active:
        # Never silent (round-4 VERDICT weak #4): with pad-up batch
        # sizing this only fires for a mesh with no batch axes.
        if verbose and primary:
            print(
                f"[{config.name}] eval: mesh not engaged "
                "(no batch axes); evaluating single-device"
            )
        if writer:
            writer.write({
                "kind": "event",
                "event": "eval_mesh_fallback",
                "mesh_axes": dict(
                    zip(eval_mesh.axis_names,
                        (int(s) for s in eval_mesh.devices.shape))
                ),
            })

    history: list[dict[str, float]] = []
    epoch = start_epoch
    # Fresh arrays are in raw load order: the first epoch of this
    # process forces a true shuffle (matters on resume with
    # reshuffle_every>1); a nan_rollback restore re-forces it.
    force_shuffle = True
    rollbacks = 0
    grain_stream = (
        _GrainStream(
            train_ds, config, model, sharding=stacked_sharding
        )
        if config.data_backend == "grain"
        else None
    )
    ckpt_writer = None
    if getattr(config, "ckpt_async", False) and workdir is not None:
        if jax.process_count() == 1:
            from mmvae_tpu.train.checkpoint import AsyncCheckpointWriter

            ckpt_writer = AsyncCheckpointWriter(workdir)
        else:
            # Never silent (same discipline as the mesh-eval fallback):
            # multi-host keeps the synchronous collective save path.
            if verbose and primary:
                print(
                    f"[{config.name}] ckpt_async requested but this is "
                    "a multi-host run; saves are synchronous "
                    "(collective)"
                )
            if writer:
                writer.write({
                    "kind": "event",
                    "event": "ckpt_async_fallback",
                    "reason": "multi-host run; synchronous collective "
                    "saves",
                })
    while epoch <= config.epochs:
        if in_program_gather:
            # Shuffle + gather run inside the program (state.rng seeds
            # the order): one dispatch, zero host bytes per epoch. The
            # arrays are donated and persist shuffled across epochs.
            state, train_arrays, ms = runner(
                state, train_arrays, force_shuffle
            )
        elif config.data_backend == "grain":
            # Seeding: see _grain_seed (epoch-indexed, rollback-
            # perturbed). The stream delivers the epoch in prefetched
            # segments (whole-epoch when grain_stream_steps=0) and
            # schedules the next epoch's first segment behind the
            # final dispatch; a key miss (first epoch, rollback retry)
            # computes inline -- see _GrainStream.
            state, ms = grain_stream.run_epoch(
                state,
                runner,
                _grain_seed(seed, epoch, rollbacks),
                next_seed=(
                    _grain_seed(seed, epoch + 1, rollbacks)
                    if epoch < config.epochs
                    else None
                ),
            )
        else:
            batches = stacked_epoch(
                train_ds, config.batch_size, np_rng,
                sharding=stacked_sharding,
            )
            state, ms = runner(state, batches)
        force_shuffle = False
        if fault_hook is not None:
            state = fault_hook(epoch, state)
        losses = np.asarray(ms["loss"])  # one host fetch per epoch
        if writer:
            li = config.log_interval
            per_term = np.asarray(ms["elbo_per_term"])
            kls = np.asarray(ms["kl_per_term"])
            recons = np.asarray(ms["recon_per_term"])
            betas = np.asarray(ms["beta"])
            grad_norms = np.asarray(ms["grad_norm"])
            align_kls = (
                np.asarray(ms["align_kl"]) if "align_kl" in ms else None
            )
            cycle_ces = (
                np.asarray(ms["cycle_ce"]) if "cycle_ce" in ms else None
            )
            cycle_contrasts = (
                np.asarray(ms["cycle_contrast"])
                if "cycle_contrast" in ms
                else None
            )
            base_step = int(state.step) - len(losses)
            for i in range(0, len(losses), li):
                rec = {
                    "kind": "train",
                    "epoch": epoch,
                    "step": base_step + i + 1,
                    "loss": losses[i],
                    "beta": betas[i],
                    "grad_norm": grad_norms[i],
                    "elbo_per_term": per_term[i],
                    "kl_per_term": kls[i],
                    "recon_per_term": recons[i],
                }
                if align_kls is not None:
                    rec["align_kl"] = align_kls[i]
                if cycle_ces is not None:
                    rec["cycle_ce"] = cycle_ces[i]
                if cycle_contrasts is not None:
                    rec["cycle_contrast"] = cycle_contrasts[i]
                writer.write(rec)
        meter = AverageMeter()
        meter.update(float(losses.mean()), len(losses) * config.batch_size)
        train_finite = bool(np.isfinite(losses).all())
        test_elbo = float("nan")
        if train_finite or config.nan_rollback == 0:
            eval_params = state.eval_params
            if jax.process_count() > 1:
                # The padded split evaluator is a process-LOCAL program
                # (identical on every process); mesh-trained params are
                # global arrays, so pull the replicated copies local
                # first (zero cross-host traffic -- replicated means
                # every host already holds them).
                from mmvae_tpu.parallel import fetch_replicated

                eval_params = fetch_replicated(eval_params)
            test_elbo = evaluate(eval_params)
        if config.nan_rollback > 0 and not (
            train_finite and np.isfinite(test_elbo)
        ):
            # Failure containment: the rollback decision is a pure
            # function of replicated metrics, so every process in a
            # multi-host run takes this branch in lockstep.
            if rollbacks >= config.nan_rollback:
                raise RuntimeError(
                    f"[{config.name}] epoch {epoch} went non-finite "
                    f"after {rollbacks} rollback(s) -- nan_rollback "
                    f"budget exhausted"
                )
            rollbacks += 1
            if ckpt_writer is not None:
                # The restore below reads the pointer file and the
                # checkpoint dirs; a concurrent worker flip/prune
                # would race it -- and draining first also means the
                # rollback restores the NEWEST durable state.
                ckpt_writer.drain()
            from mmvae_tpu.train.checkpoint import latest_epoch

            restored = latest_epoch(workdir)
            if restored is None:
                # Blast before the first save: restart from a fresh
                # (perturbed-seed) init -- there is nothing to restore.
                state = create_train_state(
                    model, init_batch,
                    jax.random.fold_in(rng, 0xBAD0 + rollbacks),
                    _learning_rate(config, steps_per_epoch=steps_per_epoch),
                    grad_clip=config.grad_clip,
                    ema_decay=config.ema_decay,
                    accum_steps=config.accum_steps,
                )
                if mesh is not None:
                    if config.fsdp:
                        from mmvae_tpu.parallel import fsdp_shard

                        state = fsdp_shard(state, mesh)
                    elif tp > 1:
                        from mmvae_tpu.parallel import tp_shard

                        state = tp_shard(state, mesh)
                    elif pp > 1:
                        from mmvae_tpu.parallel import pp_shard

                        state = pp_shard(state, mesh)
                    else:
                        state = replicate(state, mesh)
                restored = 0
            else:
                # The poisoned state is still a valid restore template
                # (structure + shardings; values are overwritten). The
                # rng fold makes the retry's data order fresh instead
                # of a deterministic replay of the blast.
                state, _extra = load_checkpoint(
                    workdir, state, which="last"
                )
                state = state.replace(
                    rng=jax.random.fold_in(state.rng, 0xBAD0 + rollbacks)
                )
            if writer:
                writer.write({
                    "kind": "event",
                    "event": "nan_rollback",
                    "failed_epoch": epoch,
                    "restored_epoch": int(restored),
                    "rollbacks": rollbacks,
                })
            if verbose and primary:
                print(
                    f"[{config.name}] epoch {epoch:3d} non-finite; "
                    f"rolled back to epoch {int(restored)} "
                    f"({rollbacks}/{config.nan_rollback})"
                )
            epoch = int(restored) + 1
            force_shuffle = True
            continue
        is_best = test_elbo < best
        best = min(best, test_elbo)
        record = {
            "epoch": epoch,
            "train_loss": meter.avg,
            "test_elbo": test_elbo,
        }
        history.append(record)
        if writer:
            rec = {"kind": "eval", **record}
            if grain_stream is not None:
                # Prefetch health of the segment stream (cumulative);
                # a rate far below (n_takes-1)/n_takes means the
                # double-buffering degraded to inline gathering.
                rec["stream_hit_rate"] = grain_stream.hit_rate
            if ckpt_writer is not None:
                # Overlapped-save health: skipped = save points
                # coalesced because the I/O path was still draining.
                rec["ckpt_saved"] = ckpt_writer.saved
                rec["ckpt_skipped"] = ckpt_writer.skipped
            writer.write(rec)
        if verbose and primary:
            print(
                f"[{config.name}] epoch {epoch:3d} "
                f"train {meter.avg:10.2f} test {test_elbo:10.2f}"
                + (" *best*" if is_best else "")
            )
        # ckpt_every > 1 amortizes the save's device->host state fetch
        # (the dominant epoch cost for big models on a relay-attached
        # chip); ckpt_async overlaps it instead (snapshot + async D2H
        # + disk-only worker, coalescing when the I/O path is the
        # bottleneck). The final epoch always saves SYNCHRONOUSLY, and
        # the best pointer names the best among SAVED epochs.
        if ckpt_writer is not None:
            ckpt_writer.poll()
        if workdir is not None and (
            epoch % max(getattr(config, "ckpt_every", 1), 1) == 0
            or epoch == config.epochs
        ):
            if ckpt_writer is not None and epoch != config.epochs:
                if ckpt_writer.stage(
                    state,
                    epoch,
                    is_best=test_elbo < best_saved,
                    extra={"best_test_elbo": best},
                    keep_epochs=config.keep_epoch_ckpts,
                ):
                    best_saved = min(best_saved, test_elbo)
            else:
                if ckpt_writer is not None:
                    # Drain overlapped saves first so the final sync
                    # save's pointer flip is the last word.
                    ckpt_writer.finalize()
                    ckpt_writer = None
                save_checkpoint(
                    workdir,
                    state,
                    epoch,
                    is_best=test_elbo < best_saved,
                    extra={"best_test_elbo": best},
                    keep_epochs=config.keep_epoch_ckpts,
                )
                best_saved = min(best_saved, test_elbo)
        epoch += 1
    if ckpt_writer is not None:
        # Runs only when the loop exited without reaching the final
        # epoch's sync save (resume from a completed run).
        ckpt_writer.finalize()
    if grain_stream is not None:
        # Politeness on the normal path (a pending future from a
        # final-epoch rollback is cancelled/abandoned). On exception
        # paths the executor's weakref-based worker shutdown + the
        # stdlib atexit join handle it.
        grain_stream.close()
    if writer:
        writer.close()
    return TrainResult(config, model, state, best, history)


def eval_elbo(
    config: str | ExperimentConfig,
    *,
    model=None,
    params=None,
    workdir: str | None = None,
    dataset=None,
    split: str = "test",
    batch_size: int | None = None,
    dtype=jnp.float32,
    mesh=None,
    segment_steps: int = 0,
) -> float:
    """Mean multi-term ELBO over a split -- the parity metric [B:2].

    beta pinned to 1, z = posterior mean (SURVEY.md 3c). Provide either
    ``params`` (+ ``model``) or a ``workdir`` with a checkpoint (its
    config snapshot is used when only a config name was given).
    ``mesh`` shards the split over the data mesh (same semantics and
    fallback as :func:`log_likelihood`). ``segment_steps > 0`` streams
    the split to device in bounded segments instead of pre-stacking it
    into HBM (the beyond-HBM lane; metric-exact at any segment size).
    """
    config = _resolve_with_workdir(config, workdir)
    if model is None:
        model = build_model(config, dtype=dtype)
    if params is None:
        if workdir is None:
            raise ValueError("need params or workdir")
        params = _load_params(config, model, workdir)
    if dataset is None:
        dataset = load_dataset(
            config.dataset, split, n=config.test_size,
            gen_kwargs=getattr(config, "data_kwargs", None),
            # Segmented eval keeps the split host-resident.
            device_put=(segment_steps <= 0),
        )
    return _make_split_evaluator(
        model, dataset, batch_size or config.batch_size,
        objective=getattr(config, "objective", "mvae"),
        mvtcae_alpha=getattr(config, "mvtcae_alpha", 0.9),
        member_prune=getattr(config, "member_prune", True),
        mesh=mesh,
        segment_steps=segment_steps,
    )(params)


def _mesh_batch_shards(mesh) -> int:
    """Product of the mesh's batch axes (every axis except model/pipe)."""
    n = 1
    for a in mesh.axis_names:
        if a not in ("model", "pipe"):
            n *= mesh.shape[a]
    return n


def _eval_mesh_batch(mesh, batch_size: int):
    """``(mesh, batch_size)`` adjusted so mesh eval always engages.

    Rounds ``batch_size`` UP to the mesh's batch-shard product (pad
    rows are presence-masked, so the metric is exact at any batch
    size) instead of silently falling back to single-device placement
    when the rows don't divide (round-4 VERDICT weak #4). A mesh with
    no batch axes at all (model/pipe only) genuinely cannot shard the
    batch -- that one case WARNS and drops the mesh.
    """
    if mesh is None:
        return None, batch_size
    n = _mesh_batch_shards(mesh)
    if n <= 1:
        import warnings

        warnings.warn(
            "eval mesh has no batch axes (model/pipe only); the split "
            "evaluates replicated on every device",
            stacklevel=3,
        )
        return None, batch_size
    return mesh, -(-batch_size // n) * n


def _eval_mesh_sharding(mesh, batch_size: int):
    """Batch sharding for mesh eval, or None when the mesh cannot take
    it (padded batch rows must split evenly over the batch axes --
    callers go through :func:`_eval_mesh_batch` first, which makes the
    rows divisible whenever the mesh has batch axes)."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_axes = tuple(
        a for a in mesh.axis_names if a not in ("model", "pipe")
    )
    n = 1
    for a in batch_axes:
        n *= mesh.shape[a]
    if n <= 1 or batch_size % n != 0:
        return None
    return NamedSharding(mesh, P(None, batch_axes))


def _make_split_evaluator(
    model, dataset, batch_size: int, objective: str = "mvae",
    mvtcae_alpha: float = 0.9, member_prune: bool = True, mesh=None,
    segment_steps: int = 0,
):
    """Padded whole-split ELBO evaluator with the split pre-stacked ONCE.

    Whole split as one scan-fused program: one dispatch, one fetch (the
    per-batch loop costs ~2ms dispatch + a host sync per batch). The
    last batch is padded + presence-masked so the remainder examples
    still count (the parity metric covers the WHOLE split). ``train``
    builds this once and calls it every epoch -- re-padding/gathering
    the split per epoch was a round-2 VERDICT weak item (#7).

    ``mesh`` (single-process runs): the split lives batch-sharded over
    the data axes and the program takes the sharding-safe "b" fold, so
    eval rides the same parallelism axis as training instead of
    idling it (VERDICT r3 missing #5). The padded batch rows are
    rounded up to the mesh's batch-shard product, so the mesh is never
    silently declined (``_eval_mesh_batch``; the returned closure's
    ``mesh_active`` attribute says what actually engaged). Equal to
    single-device eval modulo reduction order (tests/test_dp.py).
    Pad-mask logic is shard-invariant: pad rows zero their batch's
    mean wherever they land.

    ``segment_steps > 0``: the stacked split stays HOST-resident and
    ships to device ``segment_steps`` batches at a time -- the eval
    half of the beyond-HBM segment-streaming lane (_GrainStream;
    round-4 VERDICT weak #4). HBM residency is O(1 segment); each
    eval pays the split's host->device transfer again, which is the
    deal the lane exists to make. The padded tail segment is
    all-pad-masked, so segmentation is metric-exact at any segment
    size (one compiled program serves every segment).
    """
    batch_size = min(batch_size, dataset.size)
    mesh, batch_size = _eval_mesh_batch(mesh, batch_size)
    n_steps = -(-dataset.size // batch_size)
    seg = n_steps if segment_steps <= 0 else min(segment_steps, n_steps)
    n_segs = -(-n_steps // seg)
    # The segmented lane stacks HOST-side: the default jnp stacking
    # would commit the whole padded split to the device right here,
    # defeating the O(1 segment) HBM residency (round-5 review).
    batches, valid = stacked_epoch_padded(
        dataset, batch_size, host=n_segs > 1
    )
    ones = (np.ones if n_segs > 1 else jnp.ones)(
        (model.n_modalities,), valid.dtype
    )
    batches["presence"] = valid[..., None] * ones
    sharding = _eval_mesh_sharding(mesh, batch_size)
    runner = _eval_runner(
        model, objective, mvtcae_alpha, member_prune,
        term_fold="t" if sharding is None else "b",
        mesh=None if sharding is None else mesh,
    )

    if n_segs == 1:
        if sharding is not None:
            batches = {
                k: jax.device_put(v, sharding)
                for k, v in batches.items()
            }

        def evaluate(params) -> float:
            ms = runner(params, batches)
            # Pad rows contribute exactly 0 to each batch mean; /bs undone.
            return float(
                np.asarray(ms["loss"]).sum() * batch_size / dataset.size
            )

    else:
        # Host-resident, padded to whole segments (pad batches carry
        # zero presence -> zero loss).
        total_steps = n_segs * seg
        host = {}
        for k, v in batches.items():
            if total_steps > n_steps:
                pad = np.zeros(
                    (total_steps - n_steps,) + v.shape[1:], v.dtype
                )
                v = np.concatenate([v, pad])
            host[k] = v

        def evaluate(params) -> float:
            total = 0.0
            for s in range(n_segs):
                seg_b = {
                    k: v[s * seg : (s + 1) * seg]
                    for k, v in host.items()
                }
                seg_b = _stacked_to_device(seg_b, sharding)
                total += float(np.asarray(runner(params, seg_b)["loss"]).sum())
            return total * batch_size / dataset.size

    evaluate.mesh_active = sharding is not None
    return evaluate


def log_likelihood(
    config: str | ExperimentConfig,
    *,
    model=None,
    params=None,
    workdir: str | None = None,
    dataset=None,
    split: str = "test",
    k: int = 64,
    batch_size: int | None = None,
    seed: int = 0,
    dtype=jnp.float32,
    mesh=None,
    segment_steps: int = 0,
) -> float:
    """Mean IWAE estimate of the joint marginal log p(x) over a split.

    The MVAE paper's importance-sampled test log-likelihood (natural
    log, per example; see ``core/iwae.py``). Whole split runs as one
    scan-fused program; the padded last batch is presence-masked out of
    the mean, so every example counts exactly once.

    The proposal is always the joint PoE posterior — for models trained
    with a mixture objective (``config.objective`` mmvae/mopoe) this is
    still a valid IWAE lower bound (any proposal covering the support
    is), just not the tightest one; log p(x) estimates remain
    comparable across objectives.

    ``mesh`` shards the batch axis over the data mesh (k importance
    samples per example compute shard-locally; the only collective is
    the scalar total's psum) -- equal to single-device modulo reduction
    order. Padded batch rows are rounded up to the mesh's batch-shard
    product so the mesh always engages (``_eval_mesh_batch``).
    ``segment_steps > 0`` streams the split to device in bounded
    segments (beyond-HBM lane) -- numerically identical to the
    whole-split run: each batch keeps its global rng fold index, and
    pad segments are validity-masked to zero.
    """
    from mmvae_tpu.core import iwae_bound

    config = _resolve_with_workdir(config, workdir)
    if model is None:
        model = build_model(config, dtype=dtype)
    if params is None:
        if workdir is None:
            raise ValueError("need params or workdir")
        params = _load_params(config, model, workdir)
    if dataset is None:
        dataset = load_dataset(
            config.dataset, split, n=config.test_size,
            gen_kwargs=getattr(config, "data_kwargs", None),
            device_put=(segment_steps <= 0),
        )
    batch_size = min(batch_size or config.batch_size, dataset.size)
    mesh, batch_size = _eval_mesh_batch(mesh, batch_size)
    n_steps_pre = -(-dataset.size // batch_size)
    segmenting = 0 < segment_steps < n_steps_pre
    # Segmented lane: stack host-side (see _make_split_evaluator).
    batches, valid = stacked_epoch_padded(
        dataset, batch_size, host=segmenting
    )
    sharding = _eval_mesh_sharding(mesh, batch_size)

    def make_runner():
        @jax.jit
        def runner(params, batches, valid, idx, rng):
            def body(carry, xs):
                batch, v, i = xs
                ll = iwae_bound(
                    model, params, batch, jax.random.fold_in(rng, i), k=k
                )
                return carry + jnp.sum(ll * v), None

            total, _ = jax.lax.scan(
                body,
                jnp.zeros((), jnp.float32),
                (batches, valid, idx),
            )
            return total

        return runner

    runner = _memo_runner(
        _LL_RUNNERS,
        (model, int(k), None if sharding is None else mesh),
        make_runner,
    )
    rng = jax.random.key(seed)
    n_steps = int(valid.shape[0])
    seg = n_steps if segment_steps <= 0 else min(segment_steps, n_steps)
    if seg == n_steps:
        if sharding is not None:
            batches = {
                k2: jax.device_put(v, sharding)
                for k2, v in batches.items()
            }
            valid = jax.device_put(valid, sharding)
        total = float(np.asarray(runner(
            params, batches, valid, jnp.arange(n_steps), rng
        )))
    else:
        n_segs = -(-n_steps // seg)
        total_steps = n_segs * seg
        host_b = {}
        for k2, v in batches.items():
            v = np.asarray(v)
            if total_steps > n_steps:
                v = np.concatenate([v, np.zeros(
                    (total_steps - n_steps,) + v.shape[1:], v.dtype
                )])
            host_b[k2] = v
        host_v = np.concatenate([
            np.asarray(valid),
            np.zeros((total_steps - n_steps, batch_size), np.float32),
        ]) if total_steps > n_steps else np.asarray(valid)
        total = 0.0
        for s in range(n_segs):
            lo = s * seg
            seg_b = _stacked_to_device(
                {k2: v[lo : lo + seg] for k2, v in host_b.items()},
                sharding,
            )
            seg_v = host_v[lo : lo + seg]
            seg_v = (
                jax.device_put(seg_v, sharding)
                if sharding is not None
                else jnp.asarray(seg_v)
            )
            total += float(np.asarray(runner(
                params, seg_b, seg_v, jnp.arange(lo, lo + seg), rng
            )))
    return total / dataset.size


# IWAE runners, memoized like the eval runners below.
_LL_RUNNERS: dict[Any, Callable] = {}


# One eval runner per model: make_eval_runner returns a fresh jax.jit
# closure each call, so without this cache every train() epoch would
# retrace+recompile the eval program (~60s each on the remote-compile
# TPU platform). Flax linen modules are frozen dataclasses -- equal
# configurations share one runner. Bounded FIFO (round-2 weak #8: a
# long-lived notebook cycling many configs would otherwise leak one
# compiled program per config forever).
_EVAL_RUNNERS: dict[Any, Callable] = {}
_RUNNER_CACHE_MAX = 16


def _memo_runner(cache: dict, key, make: Callable) -> Callable:
    try:
        runner = cache.get(key)
    except TypeError:  # unhashable model: fall back to a fresh runner
        return make()
    if runner is None:
        runner = make()
        while len(cache) >= _RUNNER_CACHE_MAX:
            del cache[next(iter(cache))]  # FIFO: oldest insertion out
        cache[key] = runner
    return runner


def _eval_runner(
    model,
    objective: str = "mvae",
    mvtcae_alpha: float = 0.9,
    member_prune: bool = True,
    term_fold: str = "t",
    mesh=None,
):
    return _memo_runner(
        _EVAL_RUNNERS,
        (model, objective, mvtcae_alpha, member_prune, term_fold, mesh),
        lambda: make_eval_runner(
            model, objective, mvtcae_alpha, member_prune,
            term_fold=term_fold, mesh=mesh,
        ),
    )


def _learning_rate(config, steps_per_epoch: int | None = None):
    """Learning rate (float) or optax schedule for ``config``.

    A schedule changes the Adam state's pytree (ScaleByScheduleState),
    so every TrainState built for the same config -- training, resume
    templates, checkpoint loads -- must use this one builder. (Only the
    tree STRUCTURE must match across callers; the horizon values are
    baked into the schedule fn, so resume templates may pass no
    ``steps_per_epoch``.)

    The schedule is expressed in OPTIMIZER-UPDATE units: under
    ``accum_steps > 1`` optax.MultiSteps advances the inner schedule
    counter once per k micro-batches, so micro-step horizons would make
    warmup take k times longer and decay cover 1/k of the run (round-2
    ADVICE.md finding). ``steps_per_epoch`` should be the ACTUAL
    micro-steps per epoch (from the loaded dataset size -- which can be
    smaller than ``config.train_size`` on small real-data mounts).
    """
    if getattr(config, "lr_schedule", "constant") == "constant":
        return config.learning_rate
    if config.lr_schedule == "cosine":
        # Linear warmup -> cosine decay to 0 over the full run; the
        # opt-state step counter makes resume continue the schedule.
        import optax

        if steps_per_epoch is None:
            steps_per_epoch = max(
                1, config.train_size // config.batch_size
            )
        accum = max(1, getattr(config, "accum_steps", 1))
        updates_per_epoch = max(1, steps_per_epoch // accum)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=config.learning_rate,
            warmup_steps=max(
                1, config.warmup_epochs * updates_per_epoch
            ),
            decay_steps=max(1, config.epochs * updates_per_epoch),
        )
    raise ValueError(
        f"unknown lr_schedule {config.lr_schedule!r} "
        "(have: constant, cosine)"
    )


def _load_params(config, model, workdir, which: str = "best"):
    state = create_train_state(
        model, model.dummy_batch(2), jax.random.key(0),
        _learning_rate(config), grad_clip=config.grad_clip,
        ema_decay=getattr(config, "ema_decay", 0.0),
        accum_steps=getattr(config, "accum_steps", 1),
    )
    state, _ = load_checkpoint(workdir, state, which=which)
    # EMA weights (when tracked) are the serving/eval weights.
    return state.eval_params


def _postprocess(model, params, recons, z, rng, temperature):
    """Decode-dict -> user-facing arrays per likelihood kind."""
    kinds = model.decode_kinds()
    out = {}
    for key, value in recons.items():
        kind = kinds.get(key, "bernoulli")
        if kind == "bernoulli":
            out[key] = jax.nn.sigmoid(value)
        elif kind == "categorical":
            out[key] = jnp.argmax(value, axis=-1)
        else:
            out[key] = value
    for spec in model.specs():
        if spec.kind == "seq":
            rng, sub = jax.random.split(rng)
            out[spec.name] = model.apply(
                {"params": params},
                z,
                sub,
                temperature,
                method="generate_text",
            )
    return out


def sample(
    config: str | ExperimentConfig,
    n: int = 64,
    *,
    model=None,
    params=None,
    workdir: str | None = None,
    seed: int = 0,
    temperature: float = 1.0,
    dtype=jnp.float32,
) -> dict[str, Any]:
    """Unconditional samples: z ~ N(0, I) decoded into every modality.

    The reference's ``sample.py`` with no conditioning flags
    (SURVEY.md 3d) -- PoE of the prior expert alone.
    """
    return generate(
        config,
        condition={},
        n=n,
        model=model,
        params=params,
        workdir=workdir,
        seed=seed,
        temperature=temperature,
        sample_z=True,
        dtype=dtype,
    )


def generate(
    config: str | ExperimentConfig,
    condition: dict[str, Any],
    *,
    n: int | None = None,
    model=None,
    params=None,
    workdir: str | None = None,
    seed: int = 0,
    sample_z: bool = False,
    temperature: float = 1.0,
    dtype=jnp.float32,
) -> dict[str, Any]:
    """Cross-modal generation from any modality subset (SURVEY.md 3d).

    ``condition`` maps modality names to observed arrays (may be empty ->
    prior sampling). The observed experts are fused with the prior via
    PoE; z is the posterior mean (or a sample when ``sample_z``); ALL
    modalities are decoded. CelebA accepts either ``attrs`` (all 18) or
    individual ``attr_i`` keys, matching its per-attribute experts.
    """
    config = _resolve_with_workdir(config, workdir)
    if model is None:
        model = build_model(config, dtype=dtype)
    if params is None:
        if workdir is None:
            raise ValueError("need params or workdir")
        params = _load_params(config, model, workdir)

    names = [s.name for s in model.specs()]
    # CelebA-style stacked keys: "attrs" conditions all attr_i experts.
    cond = dict(condition)
    stacked_attrs = cond.pop("attrs", None)
    if n is None:
        some = stacked_attrs if stacked_attrs is not None else None
        for v in cond.values():
            some = v
            break
        n = 1 if some is None else int(np.asarray(some).shape[0])

    batch = {k: jnp.asarray(v) for k, v in model.dummy_batch(n).items()}
    presence = np.zeros((n, len(names)), np.float32)
    name_idx = {nm: i for i, nm in enumerate(names)}
    for key, value in cond.items():
        if key in name_idx and key.startswith("attr_") and "attrs" in batch:
            # Individual per-attribute conditioning (CelebA).
            a = int(key.split("_")[1])
            batch["attrs"] = batch["attrs"].at[:, a].set(
                jnp.asarray(value, jnp.float32)
            )
            presence[:, name_idx[key]] = 1.0
            continue
        if key not in batch:
            raise ValueError(f"unknown modality {key!r}; have {list(batch)}")
        batch[key] = jnp.asarray(value)
        if key in name_idx:
            presence[:, name_idx[key]] = 1.0
    if stacked_attrs is not None:
        batch["attrs"] = jnp.asarray(stacked_attrs, jnp.float32)
        for nm, i in name_idx.items():
            if nm.startswith("attr_"):
                presence[:, i] = 1.0

    rng = jax.random.key(seed)
    variables = {"params": params}
    mu_e, lv_e = model.apply(variables, batch, method="encode")
    rng, z_rng = jax.random.split(rng)
    # Objective-aware posterior draw (core/mixture.py): "mvae" is the
    # PoE of the observed experts + prior (bit-identical to the
    # historical path); "mmvae"/"mopoe" draw from (or average) the
    # matching mixture over the observed set.
    z = fuse_observed_z(
        z_rng, mu_e, lv_e, jnp.asarray(presence),
        objective=getattr(config, "objective", "mvae"),
        sample=sample_z,
    )
    recons = model.apply(variables, z, None, method="decode")
    return _postprocess(model, params, recons, z, rng, temperature)
