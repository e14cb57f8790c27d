"""Parallelism over the TPU mesh (rebuild-only component, SURVEY.md 2.15).

The reference is single-process/single-device; the one parallel strategy
the rebuild owes is data parallelism: batch sharded over a 1-D
``jax.sharding.Mesh``, gradients averaged by ``psum`` over ICI -- emitted
automatically by XLA/GSPMD from sharding annotations ([B:5], SURVEY.md
section 5 comms row).
"""

from mmvae_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from mmvae_tpu.parallel.fsdp import (
    fsdp_sharding,
    fsdp_shard,
    state_shardings,
)
from mmvae_tpu.parallel.multihost import (
    initialize as multihost_initialize,
    is_primary,
    fetch_replicated,
)
from mmvae_tpu.parallel.tp import (
    make_mesh_2d,
    tp_param_specs,
    tp_shard,
    tp_batch_sharding,
    tp_shard_batch,
)
from mmvae_tpu.parallel.pp import (
    make_mesh_pp,
    pipeline_apply,
    pp_param_specs,
    pp_shard,
    pp_shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "fsdp_sharding",
    "fsdp_shard",
    "state_shardings",
    "multihost_initialize",
    "is_primary",
    "fetch_replicated",
    "make_mesh_2d",
    "tp_param_specs",
    "tp_shard",
    "tp_batch_sharding",
    "tp_shard_batch",
    "make_mesh_pp",
    "pipeline_apply",
    "pp_param_specs",
    "pp_shard",
    "pp_shard_batch",
]
