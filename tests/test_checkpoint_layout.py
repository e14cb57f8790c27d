"""Checkpoint layout durability (train/checkpoint.py).

Orbax's ``force=True`` overwrite rmtree's the existing directory BEFORE
the replacement's atomic rename, so writing ``ckpt/last`` in place
would leave a whole save-duration window where a preemption destroys
the only checkpoint. The shipped scheme — unique epoch-tagged dirs +
an atomically-replaced pointer + delete-after-flip — must keep a
complete checkpoint reachable at every instant, including with a stale
in-flight tmp dir and with the pointer file itself lost, and must
still read checkpoints written by the legacy in-place layout.
"""

import json
import os

import jax
import numpy as np
import pytest

from mmvae_tpu.models import MnistMVAE
from mmvae_tpu.train import create_train_state
from mmvae_tpu.train.checkpoint import (
    _resolve_ckpt_path,
    latest_epoch,
    load_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def tiny_state():
    model = MnistMVAE(n_latents=8)
    return create_train_state(
        model, model.dummy_batch(2), jax.random.key(0), 1e-3
    )


def _params_equal(a, b):
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_epoch_tagged_dirs_and_pruning(tiny_state, tmp_path):
    wd = str(tmp_path)
    ckpt = os.path.join(wd, "ckpt")
    save_checkpoint(wd, tiny_state, 1, is_best=True)
    assert os.path.isdir(os.path.join(ckpt, "last_00001"))
    # A best epoch does NOT serialize twice: the best pointer aliases
    # the directory the last save just wrote (halves the device->host
    # checkpoint traffic on a converging run).
    assert not os.path.exists(os.path.join(ckpt, "best_00001"))
    save_checkpoint(wd, tiny_state, 2, is_best=False)
    # The superseded "last" dir SURVIVES while the best pointer still
    # references it; the new last gets its own dir.
    assert os.path.isdir(os.path.join(ckpt, "last_00001"))
    assert os.path.isdir(os.path.join(ckpt, "last_00002"))
    state, extra = load_checkpoint(wd, tiny_state, which="best")
    assert int(extra["epoch"]) == 1
    save_checkpoint(wd, tiny_state, 3, is_best=True)
    # Both pointers moved to epoch 3: epochs 1 and 2 are unreferenced
    # and pruned.
    assert not os.path.exists(os.path.join(ckpt, "last_00001"))
    assert not os.path.exists(os.path.join(ckpt, "last_00002"))
    assert os.path.isdir(os.path.join(ckpt, "last_00003"))
    assert latest_epoch(wd) == 3
    state, extra = load_checkpoint(wd, tiny_state, which="best")
    assert int(extra["epoch"]) == 3


def test_inflight_tmp_dir_is_ignored(tiny_state, tmp_path):
    """A crash mid-save leaves an Orbax tmp dir; resolution must keep
    answering with the completed checkpoint."""
    wd = str(tmp_path)
    ckpt = os.path.join(wd, "ckpt")
    save_checkpoint(wd, tiny_state, 2)
    os.makedirs(
        os.path.join(ckpt, "last_00003.orbax-checkpoint-tmp-42")
    )
    assert latest_epoch(wd) == 2
    assert _resolve_ckpt_path(ckpt, "last").endswith("last_00002")
    state, extra = load_checkpoint(wd, tiny_state, which="last")
    assert int(extra["epoch"]) == 2


def test_lost_pointer_falls_back_to_newest_tagged_dir(
    tiny_state, tmp_path
):
    """Pointer file destroyed (the one non-atomic-window artifact left
    is a MISSING pointer, never a truncated one): newest tagged dir
    answers."""
    wd = str(tmp_path)
    ckpt = os.path.join(wd, "ckpt")
    save_checkpoint(wd, tiny_state, 1)
    save_checkpoint(wd, tiny_state, 2)
    os.remove(os.path.join(ckpt, "last_meta.json"))
    assert latest_epoch(wd) == 2
    state, extra = load_checkpoint(wd, tiny_state, which="last")
    assert int(extra["epoch"]) == 2


def test_legacy_inplace_layout_still_loads(tiny_state, tmp_path):
    """Checkpoints written by the pre-round-3 in-place layout
    (``ckpt/last`` + bare-epoch sidecar) keep loading."""
    wd = str(tmp_path)
    ckpt = os.path.join(wd, "ckpt")
    save_checkpoint(wd, tiny_state, 4)
    os.rename(
        os.path.join(ckpt, "last_00004"), os.path.join(ckpt, "last")
    )
    with open(os.path.join(ckpt, "last_meta.json"), "w") as f:
        json.dump({"epoch": 4}, f)  # legacy sidecar: no dir pointers
    assert latest_epoch(wd) == 4
    loaded, extra = load_checkpoint(wd, tiny_state, which="last")
    assert int(extra["epoch"]) == 4
    _params_equal(loaded, tiny_state)
    # And with no sidecar at all (oldest layout): full-restore fallback.
    os.remove(os.path.join(ckpt, "last_meta.json"))
    assert latest_epoch(wd) == 4


def test_async_writer_roundtrip_matches_sync(tiny_state, tmp_path):
    """AsyncCheckpointWriter (stage -> worker fetch+serialize ->
    finalize) writes the same loadable layout as the synchronous save:
    pointer flipped only on completion, params bit-identical, best
    aliasing intact -- and save points arriving while the pipeline
    drains coalesce."""
    import threading
    from unittest import mock

    import mmvae_tpu.train.checkpoint as ckpt_mod
    from mmvae_tpu.train.checkpoint import AsyncCheckpointWriter

    wd = str(tmp_path / "async")
    writer = AsyncCheckpointWriter(wd)
    # Hold the worker at the serialize so the coalescing decision is
    # deterministic (the real drain time is the D2H fetch + disk).
    gate = threading.Event()
    real = ckpt_mod._serialize_and_flip

    def gated(*a, **kw):
        gate.wait(timeout=30)
        return real(*a, **kw)

    with mock.patch.object(ckpt_mod, "_serialize_and_flip", gated):
        assert writer.stage(tiny_state, 1, is_best=True,
                            extra={"best_test_elbo": -1.0})
        assert not writer.stage(tiny_state, 2)  # pipeline busy
        assert writer.skipped == 1
        writer.poll()  # non-blocking while in flight
        gate.set()
        writer.finalize()
    assert writer.saved == 1
    assert latest_epoch(wd) == 1
    loaded, extra = load_checkpoint(wd, tiny_state, which="best")
    assert int(extra["epoch"]) == 1
    assert extra["best_test_elbo"] == -1.0
    _params_equal(loaded, tiny_state)

    wd2 = str(tmp_path / "sync")
    save_checkpoint(wd2, tiny_state, 1, is_best=True,
                    extra={"best_test_elbo": -1.0})
    sync_loaded, sync_extra = load_checkpoint(wd2, tiny_state, "best")
    _params_equal(loaded, sync_loaded)
    assert extra == sync_extra


def test_async_writer_worker_failure_surfaces(tiny_state, tmp_path):
    """A failed overlapped save raises at the next poll() (or
    finalize), never silently."""
    from unittest import mock

    import mmvae_tpu.train.checkpoint as ckpt_mod
    from mmvae_tpu.train.checkpoint import AsyncCheckpointWriter

    writer = AsyncCheckpointWriter(str(tmp_path))
    with mock.patch.object(
        ckpt_mod, "_serialize_and_flip",
        side_effect=RuntimeError("disk full"),
    ):
        assert writer.stage(tiny_state, 1)
        import time

        for _ in range(100):  # wait for the worker to finish failing
            if not writer.busy:
                break
            time.sleep(0.05)
        with pytest.raises(RuntimeError, match="disk full"):
            writer.poll()


def test_async_snapshot_survives_donation(tmp_path):
    """The staged snapshot is an on-device COPY: mutating (or donating)
    the live state after stage() must not corrupt the saved values."""
    import jax.numpy as jnp

    from mmvae_tpu.models import MnistMVAE
    from mmvae_tpu.train import create_train_state
    from mmvae_tpu.train.checkpoint import AsyncCheckpointWriter

    model = MnistMVAE(n_latents=8)
    state = create_train_state(
        model, model.dummy_batch(2), jax.random.key(0), 1e-3
    )
    want = {
        k: np.asarray(v)
        for k, v in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    wd = str(tmp_path)
    writer = AsyncCheckpointWriter(wd)
    assert writer.stage(state, 1)
    # Donate the live buffers to another jitted program.
    burn = jax.jit(
        lambda t: jax.tree.map(lambda x: x * 0 - 7.0, t),
        donate_argnums=0,
    )
    _ = burn(state.params)
    writer.finalize()
    loaded, _ = load_checkpoint(wd, state, which="last")
    for (k, v) in jax.tree_util.tree_flatten_with_path(loaded.params)[0]:
        np.testing.assert_array_equal(np.asarray(v), want[k])


def test_train_ckpt_async_end_to_end(tmp_path):
    """config.ckpt_async end to end: overlapped saves land, the final
    epoch saves synchronously, eval/resume work, and the JSONL carries
    the saved/skipped counters."""
    import json as json_

    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    cfg = get_config("mnist").replace(
        n_latents=8, epochs=3, batch_size=32, train_size=64,
        test_size=32, annealing_epochs=1, ckpt_async=True,
    )
    wd = str(tmp_path)
    result = api.train(cfg, wd, use_mesh=False, verbose=False)
    assert np.isfinite(result.best_test_elbo)
    assert latest_epoch(wd) == 3  # final epoch synced
    elbo = api.eval_elbo(cfg, workdir=wd)
    assert np.isfinite(elbo)
    with open(os.path.join(wd, "metrics.jsonl")) as f:
        evals = [
            json_.loads(ln)
            for ln in f
            if json_.loads(ln).get("kind") == "eval"
        ]
    assert "ckpt_saved" in evals[-1] and "ckpt_skipped" in evals[-1]
    result2 = api.train(
        cfg.replace(epochs=4), wd, use_mesh=False, verbose=False,
        resume=True,
    )
    assert result2.history[0]["epoch"] == 4


def test_ckpt_every_amortizes_saves(tmp_path):
    """config.ckpt_every=2: only every 2nd epoch (plus the final one)
    saves; best tracks saved epochs; eval/sample load the result."""
    import numpy as np

    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    cfg = get_config("mnist").replace(
        n_latents=8, epochs=3, batch_size=32, train_size=64,
        test_size=32, annealing_epochs=1, ckpt_every=2,
    )
    wd = str(tmp_path)
    result = api.train(cfg, wd, use_mesh=False, verbose=False)
    assert np.isfinite(result.best_test_elbo)
    ckpt = os.path.join(wd, "ckpt")
    names = sorted(os.listdir(ckpt))
    # Epochs 2 (2 % 2 == 0) and 3 (final) saved; epoch 1 never did.
    assert not any(n.startswith("last_00001") for n in names)
    assert any(n.startswith("last_00003") for n in names), names
    # The best pointer names a SAVED epoch and resolves.
    elbo = api.eval_elbo(cfg, workdir=wd)
    assert np.isfinite(elbo)
    # Resume restarts from the last saved epoch.
    result2 = api.train(
        cfg.replace(epochs=4), wd, use_mesh=False, verbose=False,
        resume=True,
    )
    assert result2.history[0]["epoch"] == 4
