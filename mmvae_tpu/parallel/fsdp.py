"""Fully-sharded data parallelism (ZeRO-3 style) via GSPMD annotations.

The reference is single-device, so SURVEY.md 2.15 owes only DP — but a
production TPU framework also wants the memory-side scaling story: shard
the *state* (params + Adam moments) over the same mesh the batch is
sharded over, and let GSPMD turn the sharding annotations into the
all-gather (params into the fwd/bwd) + reduce-scatter (grads back to
shards) schedule over ICI. No hand-written collectives, same train-step
code — the TPU-native analogue of torch FSDP / ZeRO-3.

Layout rule (``fsdp_sharding``): shard each array's largest dimension
that divides the mesh axis; replicate anything small (< ``min_size``
elements) or indivisible. Scalars (step counter, rng key) always
replicate. The same rule applied to the Adam moments via ``jax.tree.map``
shards the optimizer state identically to its params.

Correctness is layout-independent (tests/test_fsdp.py asserts the FSDP
step matches the single-device step bit-for-bit up to reduction order);
the memory win is the point, so the train-step jit pins the *output*
state to the same shardings (``state_shardings``) — otherwise XLA may
legally materialize the updated params replicated.
"""

from __future__ import annotations

import math
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["fsdp_sharding", "fsdp_shard", "state_shardings"]


def fsdp_sharding(
    mesh: Mesh,
    shape: tuple[int, ...],
    axis_name: str = "data",
    min_size: int = 2**14,
) -> NamedSharding:
    """Sharding for one array: largest mesh-divisible dim, else replicate.

    ``min_size`` keeps tiny arrays (biases, norm scales) replicated —
    sharding them buys nothing and costs a gather.
    """
    n_shards = mesh.shape[axis_name]
    if math.prod(shape) < min_size:
        return NamedSharding(mesh, P())
    best = None
    for i, d in enumerate(shape):
        if d % n_shards == 0 and (best is None or d > shape[best]):
            best = i
    if best is None:
        return NamedSharding(mesh, P())
    spec = [None] * len(shape)
    spec[best] = axis_name
    return NamedSharding(mesh, P(*spec))


def fsdp_shard(
    tree: Any,
    mesh: Mesh,
    axis_name: str = "data",
    min_size: int = 2**14,
) -> Any:
    """Place a PyTree (params / TrainState) with FSDP shardings.

    Works on a full ``TrainState``: params and Adam moments shard by the
    layout rule; the step counter and rng key replicate (scalar-sized).
    """

    def place(x):
        sh = fsdp_sharding(
            mesh, tuple(x.shape), axis_name=axis_name, min_size=min_size
        )
        # _put = device_put that stays valid on a MULTI-HOST mesh
        # (stages host data; process-local committed arrays are not a
        # valid source for a global sharding) -- mesh.py.
        from mmvae_tpu.parallel.mesh import _put

        return _put(x, sh)

    return jax.tree.map(place, tree)


def state_shardings(tree: Any) -> Any:
    """Per-leaf shardings of an already-placed PyTree (for jit
    ``out_shardings``: pin the updated state to the incoming layout)."""
    return jax.tree.map(lambda x: x.sharding, tree)
