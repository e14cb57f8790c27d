"""Preemption recovery: SIGKILL mid-training, resume, exact trajectory.

SURVEY.md §5 "failure detection / elastic recovery": the framework's
recovery story is Orbax resume-after-preemption. This test makes that
a measurement instead of a claim — a REAL training process is
SIGKILLed mid-run (no atexit, no flush, the honest preemption shape),
restarted with ``resume=True``, and the completed run must match an
uninterrupted run of the same config EXACTLY, because:

  * the checkpoint carries params + opt state + step + rng atomically
    (Orbax tmp-dir + rename: a kill during save leaves the previous
    checkpoint intact), and
  * grain-backend epochs are seeded ``seed*100003 + epoch`` —
    epoch-indexed, not stream-consumed — so epoch k's batches are
    identical whether or not the process died before it.

(The device-backend in-program shuffle composes permutations on the
persisted arrays, so ITS resume is statistically equivalent rather
than bit-exact; the exactness claim here is grain-specific and
documented in api.py.)
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from mmvae_tpu import api
from _preempt_cfg import tiny_grain_config

pytestmark = pytest.mark.slow

EPOCHS = 4


def _spawn(worker, workdir, *extra):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    repo_root = os.path.dirname(os.path.dirname(worker))
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )
    return subprocess.Popen(
        [sys.executable, worker, workdir, str(EPOCHS), *extra],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        env=env,
        cwd=repo_root,
    )


def test_sigkill_resume_matches_uninterrupted(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "preempt_worker.py")
    workdir = str(tmp_path / "preempted")
    os.makedirs(workdir)

    # Start training; SIGKILL as soon as the epoch-2 checkpoint lands
    # (the sidecar is written after the Orbax save completes), i.e.
    # somewhere inside epoch 3's work.
    proc = _spawn(worker, workdir)
    sidecar = os.path.join(workdir, "ckpt", "last_meta.json")
    deadline = time.time() + 600
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill it (see below)
        try:
            with open(sidecar) as f:
                if json.load(f)["epoch"] >= 2:
                    proc.send_signal(signal.SIGKILL)
                    killed = True
                    break
        except (FileNotFoundError, ValueError, KeyError):
            pass
        time.sleep(0.05)
    out = proc.communicate(timeout=600)[0].decode(errors="replace")
    assert killed, f"worker finished before the kill window:\n{out[-2000:]}"
    assert not os.path.exists(os.path.join(workdir, "final.json"))

    # Resume in a fresh process; it must pick up after the last
    # checkpointed epoch and run to completion.
    proc2 = _spawn(worker, workdir, "--resume")
    out2 = proc2.communicate(timeout=900)[0].decode(errors="replace")
    assert proc2.returncode == 0, out2[-4000:]
    with open(os.path.join(workdir, "final.json")) as f:
        resumed = json.load(f)
    resumed_epochs = [h["epoch"] for h in resumed["history"]]
    assert resumed_epochs[0] > 1, resumed_epochs  # genuinely resumed
    assert resumed_epochs[-1] == EPOCHS

    # Uninterrupted reference run (same config/seed, single process).
    ref = api.train(
        tiny_grain_config(EPOCHS),
        str(tmp_path / "ref"),
        seed=0,
        use_mesh=False,
        verbose=False,
    )
    ref_by_epoch = {h["epoch"]: h for h in ref.history}
    for h in resumed["history"]:
        want = ref_by_epoch[h["epoch"]]
        np.testing.assert_allclose(
            h["train_loss"], want["train_loss"], rtol=1e-6
        )
        np.testing.assert_allclose(
            h["test_elbo"], want["test_elbo"], rtol=1e-6
        )
    np.testing.assert_allclose(
        resumed["best"], ref.best_test_elbo, rtol=1e-6
    )
