"""Orbax checkpoint/resume with best-model tracking.

Reference contract (SURVEY.md 2.12): save {epoch, state_dict, optimizer,
best_loss} each epoch, copy to a "best" checkpoint when the test ELBO
improves, and let sampling load the best model. Here the whole TrainState
PyTree (params + opt state + step + rng) is checkpointed with Orbax; the
"best" pointer is a second named checkpoint of the same tree.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from mmvae_tpu.train.state import TrainState

__all__ = ["save_checkpoint", "load_checkpoint", "latest_epoch"]


def _to_tree(state: TrainState, extra: dict[str, Any]) -> dict[str, Any]:
    # "extra" has a fixed schema so save/restore templates always match.
    full_extra = {"epoch": 0.0, "best_test_elbo": float("inf")}
    full_extra.update({k: float(v) for k, v in extra.items()})
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        # Typed PRNG keys are stored as raw key data for orbax.
        "rng_data": jax.random.key_data(state.rng),
        "extra": full_extra,
    }


def save_checkpoint(
    workdir: str,
    state: TrainState,
    epoch: int,
    is_best: bool = False,
    extra: dict[str, Any] | None = None,
) -> None:
    """Write ``<workdir>/ckpt/last`` (and ``best`` when ``is_best``)."""
    tree = _to_tree(state, {"epoch": epoch, **(extra or {})})
    ckpt_dir = os.path.join(os.path.abspath(workdir), "ckpt")
    # Orbax writes atomically (tmp dir + rename) and saves async; wait so
    # the "best model feeds sample.py" contract holds immediately.
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, "last"), tree, force=True)
        if is_best:
            ckptr.save(os.path.join(ckpt_dir, "best"), tree, force=True)
        ckptr.wait_until_finished()


def load_checkpoint(
    workdir: str, template_state: TrainState, which: str = "best"
) -> tuple[TrainState, dict[str, Any]]:
    """Restore a TrainState saved by :func:`save_checkpoint`.

    ``template_state`` (a freshly created state of the same model/optimizer)
    supplies the tree structure, shardings, and the optax transform.
    Falls back from "best" to "last" if best was never written.
    """
    ckpt_dir = os.path.join(os.path.abspath(workdir), "ckpt")
    path = os.path.join(ckpt_dir, which)
    if not os.path.exists(path) and which == "best":
        path = os.path.join(ckpt_dir, "last")
    template = _to_tree(template_state, {})
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path, template)
    state = template_state.replace(
        step=tree["step"],
        params=tree["params"],
        opt_state=tree["opt_state"],
        rng=jax.random.wrap_key_data(np.asarray(tree["rng_data"])),
    )
    return state, dict(tree["extra"] or {})


def latest_epoch(workdir: str) -> int | None:
    """Epoch recorded in the last checkpoint, or None if none exists."""
    ckpt_dir = os.path.join(os.path.abspath(workdir), "ckpt")
    path = os.path.join(ckpt_dir, "last")
    if not os.path.exists(path):
        return None
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    return int(tree["extra"]["epoch"])
