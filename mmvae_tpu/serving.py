"""AOT serving export: the cross-modal generation program as one artifact.

Production-serving counterpart of ``api.generate`` (SURVEY.md 3d): the
whole conditioned-generation pipeline — encode observed modalities →
masked PoE fusion → z (posterior mean or sample) → decode EVERY modality
→ per-kind postprocess (sigmoid / argmax / autoregressive text decode) —
is jitted ONCE with the trained params baked in as constants and
serialized via ``jax.export`` to a single self-contained StableHLO
artifact. A server deserializes it and calls it; no model code, no
checkpoint, no Python framework on the serving side beyond jax.

The artifact is lowered for BOTH ``cpu`` and ``tpu`` platforms, so the
same bytes serve on a TPU pod and in a CPU canary. Inputs are fixed
shape (AOT = static shapes, the XLA contract): a batch dict shaped like
``model.dummy_batch(batch_size)``, a ``(batch, n_modalities)`` float
presence mask selecting which modalities are observed, an int32 seed
and an f32 temperature (both traced — one program serves all seeds and
temperatures).

File format: a small JSON header (modalities, shapes, batch size,
config name) + the ``jax.export`` blob, so a server can introspect the
interface without deserializing the program.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from mmvae_tpu.core import fuse_observed_z

__all__ = ["make_generate_fn", "export_generate", "load_generate"]

_MAGIC = b"MMVAEXP1"


def make_generate_fn(
    model,
    params,
    *,
    sample_z: bool = False,
    per_row_seed: bool = False,
    objective: str = "mvae",
) -> Callable:
    """Jittable ``(batch, presence, seed, temperature) -> outputs`` with
    the params closed over.

    Mirrors ``api.generate``'s math: the objective-aware posterior draw
    over the observed experts (``core/mixture.py`` — masked PoE + prior
    for "mvae", the matching mixture for "mmvae"/"mopoe"), ``z = mu``
    (or the mixture mean / a sample when ``sample_z``), every decoder
    runs, outputs are postprocessed per likelihood kind (bernoulli →
    sigmoid probs, categorical → argmax ids, seq → sampled token ids at
    ``temperature``).

    ``per_row_seed=True`` takes ``seed`` as a ``(batch,)`` int32 array
    and vmaps a batch-1 program over the rows, so row i's output is a
    pure function of (row i's data, presence, seed, temperature) —
    independent of batch position and of every other row. That property
    is what makes server-side request coalescing EXACT: a request gets
    bit-identical results whether it runs alone or batched with
    strangers (tools/serve.py's dynamic batcher requires it).
    """
    kinds = model.decode_kinds()
    seq_names = [s.name for s in model.specs() if s.kind == "seq"]

    def fn(batch, presence, seed, temperature):
        variables = {"params": params}
        mu_e, lv_e = model.apply(variables, batch, method="encode")
        key = jax.random.PRNGKey(seed)
        key, z_key = jax.random.split(key)
        z = fuse_observed_z(
            z_key, mu_e, lv_e, presence,
            objective=objective, sample=sample_z,
        )
        recons = model.apply(variables, z, None, method="decode")
        out = {}
        for name, value in recons.items():
            kind = kinds.get(name, "bernoulli")
            if kind == "bernoulli":
                out[name] = jax.nn.sigmoid(value)
            elif kind == "categorical":
                out[name] = jnp.argmax(value, axis=-1)
            else:
                out[name] = value
        for name in seq_names:
            key, sub = jax.random.split(key)
            out[name] = model.apply(
                variables, z, sub, temperature, method="generate_text"
            )
        return out

    if not per_row_seed:
        return fn

    def per_row_fn(batch, presence, seeds, temperature):
        def row(batch_row, presence_row, seed):
            b1 = jax.tree.map(lambda v: v[None], batch_row)
            out = fn(b1, presence_row[None], seed, temperature)
            return jax.tree.map(lambda v: v[0], out)

        return jax.vmap(row, in_axes=(0, 0, 0))(batch, presence, seeds)

    return per_row_fn


def export_generate(
    config,
    out_path: str,
    *,
    batch_size: int | str = 8,
    workdir: str | None = None,
    params=None,
    model=None,
    sample_z: bool = False,
    platforms: tuple[str, ...] = ("cpu", "tpu"),
    dtype=jnp.float32,
    seed_mode: str = "per_row",
) -> str:
    """Export the generation program for ``config`` to ``out_path``.

    Params come from ``workdir``'s best checkpoint (or pass ``params``
    directly). ``dtype`` is the experts' compute dtype (bf16 halves the
    artifact's compute cost on TPU; params stay f32).

    ``batch_size`` may be the string ``"dynamic"``: the batch dimension
    is exported SYMBOLIC (``jax.export`` shape polymorphism), so one
    artifact serves any request size with no padding — the recurrent
    text decode and every static-shape constraint still hold because
    only the leading dim varies. Returns ``out_path``.

    ``seed_mode``: ``"per_row"`` (default) exports the seed input as a
    ``(batch,)`` array and makes every row's output independent of its
    batch position — the property tools/serve.py's request coalescing
    relies on; ``"scalar"`` keeps the legacy whole-batch seed (rows
    share one RNG stream, so padding/position changes the draws).
    """
    if seed_mode not in ("per_row", "scalar"):
        raise ValueError(f"seed_mode must be per_row|scalar: {seed_mode}")
    from jax import export as jexport

    from mmvae_tpu import api
    from mmvae_tpu.configs import build_model

    config = api._resolve_with_workdir(config, workdir)
    if model is None:
        model = build_model(config, dtype=dtype)
    if params is None:
        if workdir is None:
            raise ValueError("need params or workdir")
        params = api._load_params(config, model, workdir)

    per_row = seed_mode == "per_row"
    objective = getattr(config, "objective", "mvae")
    fn = make_generate_fn(
        model, params, sample_z=sample_z, per_row_seed=per_row,
        objective=objective,
    )
    n_mod = model.n_modalities
    dynamic = batch_size == "dynamic"
    concrete = 2 if dynamic else int(batch_size)
    batch = model.dummy_batch(concrete)
    batch_spec = {
        k: jax.ShapeDtypeStruct(np.asarray(v).shape, np.asarray(v).dtype)
        for k, v in batch.items()
    }
    presence_spec = jax.ShapeDtypeStruct((concrete, n_mod), np.float32)
    seed_spec = jax.ShapeDtypeStruct(
        (concrete,) if per_row else (), np.int32
    )
    args = (
        batch_spec,
        presence_spec,
        seed_spec,
        jax.ShapeDtypeStruct((), np.float32),
    )
    if dynamic:
        # Symbolic leading dim: "b" + static trailing dims per array.
        def spec_str(v):
            return ", ".join(["b"] + ["_"] * (len(v.shape) - 1))

        args = jexport.symbolic_args_specs(
            args,
            (
                {k: spec_str(v) for k, v in batch_spec.items()},
                "b, _",
                "b" if per_row else None,
                None,
            ),
        )
    exported = jexport.export(jax.jit(fn), platforms=platforms)(*args)
    blob = exported.serialize()
    header = json.dumps(
        {
            "config": config.name,
            "batch_size": "dynamic" if dynamic else int(batch_size),
            "sample_z": sample_z,
            # Posterior family baked into the program ("mvae" PoE or a
            # mixture objective, core/mixture.py) — informational; the
            # math is inside the artifact.
            "objective": objective,
            # "per_row": seed is a (batch,) array, rows are position-
            # independent (coalescing-safe); absent/"scalar": legacy
            # whole-batch seed.
            "seed_mode": seed_mode,
            "platforms": list(platforms),
            "modalities": [s.name for s in model.specs()],
            # batch key -> expert names it feeds (CelebA's stacked
            # "attrs" carries 18 attr_i experts); lets a host set the
            # presence mask with no model code.
            "batch_modalities": model.batch_modalities(),
            # For dynamic artifacts the leading dim is reported as None.
            "batch_shapes": {
                k: [
                    ([None] + list(v.shape[1:]))
                    if dynamic
                    else list(v.shape),
                    str(v.dtype),
                ]
                for k, v in batch_spec.items()
            },
        }
    ).encode()
    with open(out_path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(header)))
        f.write(header)
        f.write(blob)
    return out_path


def load_generate(path: str):
    """Load an exported artifact: ``(meta, call)``.

    ``call(batch, presence, seed, temperature)`` runs the deserialized
    program on the current backend (must be one of the artifact's
    platforms). ``meta`` is the JSON header dict.

    For ``seed_mode == "per_row"`` artifacts ``seed`` may be a scalar
    (expanded to ``seed + arange(batch)`` — each row distinct but
    deterministic) or an explicit ``(batch,)`` array of row seeds.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an mmvae export artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode())
        blob = f.read()
    exported = jexport.deserialize(blob)
    per_row = meta.get("seed_mode", "scalar") == "per_row"

    def call(batch: dict[str, Any], presence, seed=0, temperature=1.0):
        presence = jnp.asarray(presence, jnp.float32)
        seed = np.asarray(seed, np.int32)
        if per_row and seed.ndim == 0:
            seed = seed + np.arange(presence.shape[0], dtype=np.int32)
        return exported.call(
            batch,
            presence,
            jnp.asarray(seed, jnp.int32),
            jnp.asarray(temperature, jnp.float32),
        )

    return meta, call
