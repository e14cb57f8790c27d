"""Tensor parallelism (Megatron-style) over a 2-D ``(data, model)`` mesh.

The reference owes only DP (SURVEY.md §2.15 — it is single-device
PyTorch with no distributed surface at all); TP is the rebuild's
width-scaling extension, the second half of the standard TPU 2-D mesh
recipe: batch sharded over the ``data`` axis, expert WIDTH sharded over
the ``model`` axis. Everything is pure GSPMD — the alternating
column/row-parallel kernel layouts below make XLA emit exactly one
``psum`` over the model axis per MLP stack; there are no hand-written
collectives anywhere.

Layout rules (``tp_param_specs``):

* **Dense stacks** inside each expert module alternate column-parallel
  (kernel ``P(None, "model")``, bias ``P("model")``) and row-parallel
  (kernel ``P("model", None)``, bias ``P()``) in index order. A stack
  with an ODD number of shardable Dense layers replicates its last one,
  so expert outputs (posterior params / logits) leave the stack
  replicated instead of paying an all-gather into the fusion / NLL ops.
* **Attribute banks** (CelebA: modules whose every leaf carries the
  same leading bank axis, e.g. 18 attrs) shard the bank axis — expert
  parallelism: each model-group owns ``18/tp`` attribute experts
  end-to-end with zero collectives inside the bank (the vmapped einsum
  is elementwise in the bank axis).
* **Conv/deconv stacks** (round 4 — previously replicated): the same
  alternating recipe over CHANNELS, which is halo-free (halos only
  arise for spatial sharding): column-parallel shards the kernel's
  output-channel axis (``P(None, None, None, "model")``, bias
  ``P("model")``), row-parallel the input-channel axis. Convs and
  Denses alternate as SEPARATE chains, each starting and ending
  replicated — the boundary between them is a flatten / spatial
  reshape, where a channel-sharded operand would merge its sharded
  axis into an unsharded one (not GSPMD-representable without a
  gather, the same lesson as the b-major term fold); independent
  chains also make the layout independent of execution order. The
  thin first/last image layers (3-channel RGB) replicate naturally
  via the divisibility rule.

  SCHEDULE (HLO-inspected at tiny AND realistic widths, round 5):
  the conv chains run the same Megatron ACTIVATION-parallel schedule
  as the Dense stacks — col layers compute channel-sharded outputs
  with no collective, row layers contract sharded input channels into
  one psum; zero kernel-shaped all-gathers in the production epoch
  runner (asserted in tests/test_tp.py). Round 4 observed GSPMD
  realizing this layout as a weight all-gather + replicated conv; the
  cause was OUR ``train/step.py::_constrain_rows`` pinning decode
  rows over the model axis too (conflicting with channel sharding),
  fixed in round 5 — the same fix removed the bank-einsum backward
  remat warnings round 4 recorded. The in-model ``tp_mesh`` hooks
  (``models/experts.py::_tp_constrain``, built by
  ``build_model(tp_mesh=...)`` on the training variant) pin the
  activation layout explicitly so the schedule cannot silently
  regress with compiler or width changes.
* **Everything else replicates**: GRU cells, embeddings, scalars, and
  any kernel whose dim does not divide the model axis.

Correctness is layout-independent (GSPMD inserts whatever resharding a
legal-but-slow assignment needs); the parity tests in tests/test_tp.py
pin the TP step to the single-device step, and the layout tests pin
that the intended kernels actually shard and STAY sharded through the
update (``out_state_shardings``, same mechanism as FSDP).
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh_2d",
    "chain_assignments",
    "tp_param_specs",
    "tp_shard",
    "tp_batch_sharding",
    "tp_shard_batch",
]

_DENSE = re.compile(r"^Dense_(\d+)$")
_CONV = re.compile(r"^(?:Conv|ConvTranspose)_(\d+)$")


def make_mesh_2d(
    tp: int,
    devices=None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    """``(data, model)`` mesh: ``len(devices)/tp`` data groups × ``tp``.

    Device order follows ``jax.devices()`` with the model axis minor —
    on a real slice, adjacent device ids are ICI neighbours, so the
    per-layer psum of TP (latency-sensitive, every matmul) rides the
    shortest links while the once-per-step DP gradient psum takes the
    longer hops.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if tp < 1 or len(devices) % tp:
        raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
    grid = devices.reshape(len(devices) // tp, tp)
    return Mesh(grid, (data_axis, model_axis))


def _is_bank(module: dict, n_shards: int) -> bool:
    """Bank module: every leaf is an array sharing one leading axis that
    divides the model axis, and at least one leaf is a >=3-D weight
    tensor (CelebA's 18-attr expert banks: ``w1 (18, in, out)``). The
    ndim guard keeps flat-leaf NON-bank modules — a top-level Embed
    ``{'embedding': (vocab, d)}`` or a norm's ``{'scale': (d,)}`` —
    on the documented replicate rule instead of silently sharding
    their leading axis."""
    leaves = list(module.values())
    if not leaves or any(isinstance(v, dict) for v in leaves):
        return False
    dims = {getattr(v, "shape", ())[:1] for v in leaves}
    if len(dims) != 1:
        return False
    (lead,) = dims.pop() or (0,)
    return (
        lead > 1
        and lead % n_shards == 0
        and any(getattr(v, "ndim", 0) >= 3 for v in leaves)
    )


def chain_assignments(
    dims: list[tuple[int, int]], n_shards: int
) -> list[str]:
    """Col/row/col/... assignment along one layer chain.

    ``dims[i] = (col_dim, row_dim)``: the dims a col (output) or row
    (input) sharding of layer ``i`` would split. A layer whose needed
    dim does not divide replicates and the pattern continues on the
    next layer. The chain must END replicated (its output feeds
    fusion / NLL / a flatten boundary), so a trailing ``col`` demotes
    to ``rep``.

    This is THE layout decision, shared by ``tp_param_specs`` (kernel
    layouts, walking the params tree) and the in-model activation
    constraint hooks (``models/experts.py``, walking the execution
    order) -- one function so the two can never disagree on a chain
    whose params-tree order matches its execution order (true for
    every single-layer-type chain; a decoder mixing Conv and
    ConvTranspose in one chain -- the shuffle+space_to_depth combo --
    may differ at the boundary and pays one GSPMD reshard there).
    """
    out: list[str] = []
    want_col = True
    for col_d, row_d in dims:
        dim = col_d if want_col else row_d
        if dim % n_shards == 0:
            out.append("col" if want_col else "row")
            want_col = not want_col
        else:
            out.append("rep")
    if out and out[-1] == "col":
        out[-1] = "rep"
    return out


def _chain_walk(
    module: dict, names: list[str], n_shards: int, col_dim, row_dim
) -> list[tuple[str, str]]:
    """Assign col/row along one params-tree layer chain in index order
    (see :func:`chain_assignments` for the shared decision rule)."""
    dims = [
        (col_dim(module[name]["kernel"]), row_dim(module[name]["kernel"]))
        for name in names
    ]
    return list(zip(names, chain_assignments(dims, n_shards)))


def _dense_specs(module: dict, n_shards: int, axis: str) -> dict:
    """Alternating column/row specs for the Dense_* AND Conv/
    ConvTranspose_* layers of one module (two independent chains --
    see the module docstring on why they don't alternate across the
    flatten boundary)."""
    specs = {
        name: jax.tree.map(lambda _: P(), child)
        for name, child in module.items()
    }

    def chain(pattern, kernel_ndim):
        found = []
        for name, child in module.items():
            m = pattern.match(name)
            if (
                m
                and isinstance(child, dict)
                and getattr(child.get("kernel"), "ndim", 0)
                == kernel_ndim
            ):
                found.append((int(m.group(1)), name))
        return [name for _, name in sorted(found)]

    assignments: list[tuple[str, str]] = []
    # Dense chain: kernel (in, out) -- col shards out, row shards in.
    assignments += _chain_walk(
        module, chain(_DENSE, 2), n_shards,
        col_dim=lambda k: k.shape[1], row_dim=lambda k: k.shape[0],
    )
    # Conv/deconv chain: kernel (kh, kw, in, out) for both Conv and
    # ConvTranspose in flax -- col shards the output-channel axis,
    # row the input-channel axis; channel sharding is halo-free.
    assignments += _chain_walk(
        module, chain(_CONV, 4), n_shards,
        col_dim=lambda k: k.shape[3], row_dim=lambda k: k.shape[2],
    )
    for name, kind in assignments:
        if kind == "rep":
            continue
        col = kind == "col"
        kern_ndim = module[name]["kernel"].ndim
        if col:
            kspec = P(*([None] * (kern_ndim - 1) + [axis]))
        else:
            kspec = P(*([None] * (kern_ndim - 2) + [axis, None]))
        # Only keys the layer actually has (use_bias=False Dense):
        # the returned tree must match the params structure exactly.
        specs[name] = {
            k: (
                kspec
                if k == "kernel"
                else (P(axis) if col else P())
            )
            for k in module[name]
        }
    return specs


def tp_param_specs(
    params: dict, n_shards: int, model_axis: str = "model"
) -> dict:
    """PartitionSpec tree (same structure as ``params``) per the layout
    rules in the module docstring."""
    specs: dict = {}
    for mod_name, module in params.items():
        if not isinstance(module, dict):
            specs[mod_name] = P()
        elif _is_bank(module, n_shards):
            specs[mod_name] = {
                name: P(*([model_axis] + [None] * (leaf.ndim - 1)))
                for name, leaf in module.items()
            }
        else:
            specs[mod_name] = _dense_specs(module, n_shards, model_axis)
    return specs


def _flatten_with_names(tree) -> list[tuple[tuple[str, ...], Any]]:
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        names = []
        for k in path:
            if hasattr(k, "key"):
                names.append(str(k.key))
            elif hasattr(k, "name"):
                names.append(str(k.name))
            elif hasattr(k, "idx"):
                names.append(str(k.idx))
            else:
                names.append(str(k))
        out.append((tuple(names), leaf))
    return out


def tp_shard(
    tree: Any,
    mesh: Mesh,
    *,
    params: dict | None = None,
    model_axis: str = "model",
) -> Any:
    """Place a PyTree (params or a full ``TrainState``) with TP layouts.

    The spec for each leaf is looked up by PATH SUFFIX against the
    params tree (``state.params`` by default), so the Adam moments —
    whose subtrees mirror the params structure — shard identically to
    their params; scalars (step counter, rng key) and unmatched leaves
    replicate. Multi-host staging goes through ``mesh._put`` exactly
    like DP/FSDP placement.
    """
    if params is None:
        params = getattr(tree, "params", tree)
    n_shards = mesh.shape[model_axis]
    spec_index = _flatten_with_names(tp_param_specs(
        params, n_shards, model_axis=model_axis
    ))

    from mmvae_tpu.parallel.mesh import _put

    def place_leaf(path_names: tuple[str, ...], x):
        spec = P()
        for p_path, p_spec in spec_index:
            if path_names[-len(p_path):] == p_path:
                spec = p_spec
                break
        if getattr(x, "ndim", 0) < len(spec):
            spec = P()
        return _put(x, NamedSharding(mesh, spec))

    flat = _flatten_with_names(tree)
    placed = [place_leaf(names, leaf) for names, leaf in flat]
    treedef = jax.tree_util.tree_structure(tree)
    return jax.tree_util.tree_unflatten(treedef, placed)


def tp_batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Batch sharded over the data axis ONLY — replicated across model
    groups (every member of a model group sees the same examples; the
    layer-internal collectives do the model-axis work)."""
    return NamedSharding(mesh, P(data_axis))


def tp_shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    from mmvae_tpu.parallel.mesh import _put

    sh = tp_batch_sharding(mesh)
    return jax.tree.map(lambda x: _put(x, sh), batch)
