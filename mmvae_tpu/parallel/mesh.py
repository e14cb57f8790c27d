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


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D mesh over ``devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """Place a batch dict with its leading axis sharded over the mesh.

    Batch size must divide the mesh size (static shapes; the data layer
    guarantees this by construction).
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a PyTree (params / TrainState) over the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
