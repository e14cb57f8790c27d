"""Pipeline parallelism (GPipe-style) over a 2-D ``(data, pipe)`` mesh.

The reference is single-device PyTorch (SURVEY.md §2.15 — no distributed
surface at all); PP is the rebuild's depth-scaling extension, completing
the parallelism inventory next to DP (mesh.py), FSDP (fsdp.py) and TP
(tp.py). The TPU-idiomatic recipe (scaling-book): stack the repeated
blocks of a trunk into ONE parameter tensor with a leading stage axis,
shard that axis over the ``pipe`` mesh axis, and run a microbatch
schedule under ``shard_map`` where the only cross-stage communication is
a ``ppermute`` of the activations to the next neighbour — a
nearest-neighbour ICI hop, the cheapest collective the hardware has.

Schedule (``pipeline_apply``): with S stages and N microbatches the scan
runs ``T = N + S - 1`` ticks. At tick t, stage 0 feeds microbatch
``min(t, N-1)`` (the clamp keeps shapes static; trailing feeds are
bubble work whose outputs are never read), every stage applies its block
to whatever activation the previous tick handed it, and ``ppermute``
shifts outputs one stage down the line (non-ring: stage 0 receives
zeros, which are bubble inputs). Stage S-1's outputs at ticks
``S-1 .. T-1`` are the N real results; a masked ``psum`` over the pipe
axis hands them back replicated, so downstream ops (PoE fusion, NLL)
see the same layout they would under plain DP. Bubble fraction is the
textbook ``(S-1)/T`` — amortized by more microbatches.

Everything is differentiable (``scan``/``ppermute``/``psum`` all have
transposes), so the SAME combinator serves the forward and the backward
pipeline; XLA schedules the reverse ppermutes automatically.

Correctness is layout-independent and pinned by tests/test_pp.py:
``pipeline_apply`` matches the sequential ``lax.scan`` over stages
bit-for-bit up to reduction order, through ``jax.grad``, and through a
full train step on the 2-D mesh.
"""

from __future__ import annotations

import re
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh_pp",
    "pipeline_apply",
    "pp_param_specs",
    "pp_shard",
    "pp_shard_batch",
]

# Flax auto-names PipelineTrunk submodules; their stacked params carry
# the stage axis that shards over the pipe mesh axis.
_TRUNK = re.compile(r"^PipelineTrunk_\d+$")


def make_mesh_pp(
    pp: int,
    devices=None,
    data_axis: str = "data",
    pipe_axis: str = "pipe",
) -> Mesh:
    """``(data, pipe)`` mesh: ``len(devices)/pp`` data groups × ``pp``.

    Pipe axis minor: adjacent device ids are ICI neighbours on a real
    slice, so the per-tick activation ppermute (latency-critical, on the
    scan's serial path) rides single-hop links, while the once-per-step
    DP gradient psum takes the longer hops.
    """
    from mmvae_tpu.parallel.tp import make_mesh_2d

    return make_mesh_2d(
        pp, devices, data_axis=data_axis, model_axis=pipe_axis
    )


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    n_micro: int,
    data_axis: str = "data",
    pipe_axis: str = "pipe",
) -> jax.Array:
    """Run ``x`` through S pipelined stages; returns the same shape.

    ``stage_params``: PyTree whose every leaf has leading axis
    ``S = mesh.shape[pipe_axis]`` (one slice per stage); sharded or not
    — ``shard_map`` splits it over the pipe axis either way.
    ``stage_fn(params_slice, h) -> h`` applies ONE stage to a
    microbatch; it must preserve ``h``'s shape (uniform trunk).
    ``x``: ``(B, ...)`` activations; ``B`` must satisfy
    ``(B / mesh.shape[data_axis]) % n_micro == 0``.

    CONTRACT: ``stage_fn`` must be TOTAL on arbitrary inputs -- during
    fill/drain ticks it runs on zero-filled bubble activations (the
    outputs are discarded by the tick mask, but the FUNCTION still
    executes). A stage with normalization, division, or anything else
    that can emit NaN/Inf on zeros would poison real outputs through
    XLA's NaN*0 propagation. The residual-MLP trunk satisfies this;
    audit any new stage family against it.
    """
    try:  # jax >= 0.6 exports shard_map at the top level
        from jax import shard_map
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    n_stages = mesh.shape[pipe_axis]
    n_data = mesh.shape[data_axis]
    if x.shape[0] % (n_data * n_micro):
        raise ValueError(
            f"batch {x.shape[0]} not divisible into {n_micro} microbatches"
            f" per {n_data}-way data shard"
        )
    for leaf in jax.tree.leaves(stage_params):
        if leaf.shape[:1] != (n_stages,):
            # shard_map would otherwise SPLIT a longer stage axis and
            # the per-shard [0] pick would silently drop stages.
            raise ValueError(
                f"stage_params leading axis {leaf.shape[:1]} != pipe "
                f"axis size ({n_stages}): one stage per pipe device"
            )

    def local(params, x_loc):
        i = jax.lax.axis_index(pipe_axis)
        p_local = jax.tree.map(lambda p: p[0], params)  # this stage's slice
        mb = x_loc.shape[0] // n_micro
        micro = x_loc.reshape((n_micro, mb) + x_loc.shape[1:])
        n_ticks = n_micro + n_stages - 1
        shift = [(j, j + 1) for j in range(n_stages - 1)]

        def tick(carry, t):
            feed = jax.lax.dynamic_index_in_dim(
                micro, jnp.minimum(t, n_micro - 1), keepdims=False
            )
            inp = jnp.where(i == 0, feed, carry)
            out = stage_fn(p_local, inp)
            nxt = (
                jax.lax.ppermute(out, pipe_axis, shift)
                if shift
                else out
            )
            return nxt, out

        _, outs = jax.lax.scan(
            tick, jnp.zeros_like(micro[0]), jnp.arange(n_ticks)
        )
        # Stage S-1's last n_micro outputs are the results; the masked
        # psum broadcasts them to the whole pipe group (replicated
        # output layout, matching the DP dataflow downstream).
        ys = jnp.where(i == n_stages - 1, outs[n_stages - 1 :], 0)
        ys = jax.lax.psum(ys, pipe_axis)
        return ys.reshape(x_loc.shape)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(pipe_axis), stage_params),
                  P(data_axis)),
        out_specs=P(data_axis),
        check_vma=False,
    )(stage_params, x)


def pp_param_specs(params: dict, pipe_axis: str = "pipe") -> dict:
    """PartitionSpec tree: PipelineTrunk stacked params shard their
    leading (stage) axis over the pipe mesh axis; everything else
    replicates (the non-trunk heads are small; DP covers them)."""

    def walk(tree, in_trunk):
        if not isinstance(tree, dict):
            return P(pipe_axis) if in_trunk else P()
        return {
            name: walk(child, in_trunk or bool(_TRUNK.match(name)))
            for name, child in tree.items()
        }

    return walk(params, False)


def pp_shard(
    tree: Any,
    mesh: Mesh,
    *,
    params: dict | None = None,
    pipe_axis: str = "pipe",
) -> Any:
    """Place a PyTree (params or a full ``TrainState``) with PP layouts.

    Same suffix-path lookup as ``tp_shard``: the Adam moments mirror the
    params structure, so trunk moments shard with their trunk params;
    scalars and unmatched leaves replicate. Multi-host staging goes
    through ``mesh._put``.

    CONSTRAINT (first-match suffix lookup): a non-trunk leaf whose
    path SUFFIX collides with a trunk param path would inherit the
    trunk spec. Not reachable with the current model families (trunk
    params live only under ``PipelineTrunk_*`` module names, which the
    suffix includes), but any new state field that embeds a
    params-shaped subtree under a different root must keep those
    module names out of its paths or extend this lookup to match on
    the params-subtree boundary.
    """
    from mmvae_tpu.parallel.mesh import _put
    from mmvae_tpu.parallel.tp import _flatten_with_names

    if params is None:
        params = getattr(tree, "params", tree)
    spec_index = _flatten_with_names(
        pp_param_specs(params, pipe_axis=pipe_axis)
    )

    def place_leaf(path_names, x):
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
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(tree), placed
    )


def pp_shard_batch(
    batch: dict[str, Any], mesh: Mesh, data_axis: str = "data"
) -> dict[str, Any]:
    """Batch sharded over the data axis only — every stage of a pipe
    group sees the same examples (stage 0 feeds them; the schedule does
    the pipe-axis work)."""
    from mmvae_tpu.parallel.mesh import _put

    sh = NamedSharding(mesh, P(data_axis))
    return jax.tree.map(lambda x: _put(x, sh), batch)
