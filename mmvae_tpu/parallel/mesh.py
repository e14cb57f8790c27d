"""Device mesh + sharding helpers for data-parallel training.

Design ([B:5], SURVEY.md section 5): a 1-D ``Mesh`` with a ``"data"`` axis
over all chips of the slice. Batches get ``NamedSharding(P("data"))``,
params/optimizer state are replicated (``P()``), and ``jax.jit`` (GSPMD)
turns the gradient averaging into a ``psum`` over ICI -- no hand-written
collectives on the DP path. The mesh constructor accepts an explicit
device list so a multi-slice (DCN) topology can pass its own ordering.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
]


def make_mesh(
    devices=None, axis_name: str = "data", n_slices: int = 1
) -> Mesh:
    """Device mesh for data-parallel training.

    ``n_slices == 1``: 1-D ``(data,)`` mesh over all chips (ICI only).
    ``n_slices > 1``: 2-D ``(dcn, data)`` mesh -- the leading axis spans
    slices (gradient reduction crosses DCN once), the trailing axis spans
    chips within a slice (ICI). Device order must be slice-major, which
    ``jax.devices()`` already is for multi-slice topologies.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if n_slices == 1:
        return Mesh(devices, (axis_name,))
    if len(devices) % n_slices:
        raise ValueError(
            f"{len(devices)} devices not divisible by {n_slices} slices"
        )
    grid = devices.reshape(n_slices, len(devices) // n_slices)
    return Mesh(grid, ("dcn", axis_name))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over every mesh axis.

    On a 2-D (dcn, data) mesh the batch is sharded over both: GSPMD then
    reduces gradients hierarchically (ICI within a slice, DCN across)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x, sh: NamedSharding):
    """``jax.device_put`` that stays valid on a MULTI-HOST mesh.

    A global sharding (mesh spanning other hosts' devices) accepts host
    data -- every process holds the full (identical) value and commits
    only its addressable shards -- but NOT a process-local committed
    jax array, so stage through numpy when the process group is
    multi-host. Typed PRNG keys can't cross numpy directly: stage their
    raw key data and rewrap. Single-process keeps the zero-copy path.
    """
    if jax.process_count() <= 1:
        return jax.device_put(x, sh)
    import jax.numpy as jnp

    if isinstance(x, jax.Array) and jnp.issubdtype(
        x.dtype, jax.dtypes.prng_key
    ):
        data = jax.device_put(np.asarray(jax.random.key_data(x)), sh)
        return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
    return jax.device_put(np.asarray(x), sh)


def shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """Place a batch dict with its leading axis sharded over the mesh.

    Batch size must divide the mesh size (static shapes; the data layer
    guarantees this by construction).
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: _put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a PyTree (params / TrainState) over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: _put(x, sh), tree)
