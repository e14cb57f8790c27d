"""Failure containment: nan_rollback restores the last finite
checkpoint when an epoch blasts to non-finite values and continues.

SURVEY.md §5 "failure detection / elastic recovery / fault injection":
the reference has none of this; the rebuild's mechanism is (a) a
fault-injection seam on the training loop (``api.train(fault_hook=)``),
(b) non-finite detection on the per-epoch metrics, (c) rollback to the
last finite per-epoch checkpoint with a perturbed data-order rng, and
(d) a hard budget (``config.nan_rollback``) so a persistent fault
raises instead of looping forever.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu import api
from mmvae_tpu.configs import get_config


def _tiny(**kw):
    return get_config("mnist").replace(
        n_latents=8,
        epochs=4,
        train_size=256,
        test_size=64,
        batch_size=64,
        annealing_epochs=2,
        **kw,
    )


def _poison(state):
    return state.replace(
        params=jax.tree.map(lambda p: p * jnp.nan, state.params)
    )


def _events(workdir):
    out = []
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("kind") == "event":
                out.append(rec)
    return out


def test_transient_nan_rolls_back_and_recovers(tmp_path):
    wd = str(tmp_path / "run")
    blasted = []

    def hook(epoch, state):
        if epoch == 2 and not blasted:
            blasted.append(epoch)
            return _poison(state)
        return state

    result = api.train(
        _tiny(nan_rollback=2), wd, use_mesh=False, verbose=False,
        fault_hook=hook,
    )
    # The run completed all 4 configured epochs despite the blast...
    assert [r["epoch"] for r in result.history] == [1, 2, 3, 4]
    assert all(np.isfinite(r["test_elbo"]) for r in result.history)
    assert np.isfinite(result.best_test_elbo)
    # ...the blast epoch never reached history/checkpoints (epoch 2 in
    # history is the RETRY), and the event was recorded.
    (ev,) = _events(wd)
    assert ev["event"] == "nan_rollback"
    assert ev["failed_epoch"] == 2
    assert ev["restored_epoch"] == 1
    assert ev["rollbacks"] == 1
    # The final checkpoint resumes cleanly (the NaN state was never
    # saved as "last").
    from mmvae_tpu.train.checkpoint import latest_epoch

    assert latest_epoch(wd) == 4


def test_rollback_budget_exhausted_raises(tmp_path):
    wd = str(tmp_path / "run")

    def hook(epoch, state):  # persistent fault: every epoch blasts
        return _poison(state)

    with pytest.raises(RuntimeError, match="nan_rollback budget"):
        api.train(
            _tiny(nan_rollback=1), wd, use_mesh=False, verbose=False,
            fault_hook=hook,
        )
    events = _events(wd)
    assert len(events) == 1  # one rollback spent, second failure raised


def test_first_epoch_blast_reinitializes(tmp_path):
    """A blast before the first checkpoint restarts from a fresh init
    (perturbed seed) instead of failing on a missing checkpoint."""
    wd = str(tmp_path / "run")
    blasted = []

    def hook(epoch, state):
        if not blasted:
            blasted.append(epoch)
            return _poison(state)
        return state

    result = api.train(
        _tiny(nan_rollback=1), wd, use_mesh=False, verbose=False,
        fault_hook=hook,
    )
    assert [r["epoch"] for r in result.history] == [1, 2, 3, 4]
    (ev,) = _events(wd)
    assert ev["restored_epoch"] == 0


def test_rollback_on_dp_mesh(tmp_path):
    """The rollback restore must land in the live MESH shardings (the
    poisoned replicated state is the restore template) and training
    must continue on the mesh afterwards."""
    wd = str(tmp_path / "run")
    blasted = []

    def hook(epoch, state):
        if epoch == 2 and not blasted:
            blasted.append(epoch)
            return _poison(state)
        return state

    result = api.train(
        _tiny(nan_rollback=1), wd, use_mesh=True, verbose=False,
        fault_hook=hook,
    )
    assert [r["epoch"] for r in result.history] == [1, 2, 3, 4]
    assert all(np.isfinite(r["test_elbo"]) for r in result.history)
    (ev,) = _events(wd)
    assert ev["failed_epoch"] == 2 and ev["restored_epoch"] == 1
    # Params stayed global (mesh-sharded/replicated) through the
    # restore -- not silently pulled to one device.
    leaves = jax.tree.leaves(result.state.params)
    assert all(len(leaf.sharding.device_set) == 8 for leaf in leaves)


def test_nan_rollback_requires_workdir():
    with pytest.raises(ValueError, match="workdir"):
        api.train(
            _tiny(nan_rollback=1), None, use_mesh=False, verbose=False
        )


def test_rollback_without_budget_keeps_old_semantics(tmp_path):
    """nan_rollback=0 (default): a NaN epoch is recorded, never becomes
    best, and the run keeps going -- round-2 blast-damage containment
    via best-tracking, unchanged."""
    wd = str(tmp_path / "run")
    blasted = []

    def hook(epoch, state):
        if epoch == 2 and not blasted:
            blasted.append(epoch)
            return _poison(state)
        return state

    result = api.train(
        _tiny(), wd, use_mesh=False, verbose=False, fault_hook=hook,
    )
    assert [r["epoch"] for r in result.history] == [1, 2, 3, 4]
    # Epoch 2's eval (poisoned params) is NaN; best stays finite
    # (epoch 1's) because NaN never wins the comparison.
    assert not np.isfinite(result.history[1]["test_elbo"])
    assert np.isfinite(result.best_test_elbo)
    assert _events(wd) == []
