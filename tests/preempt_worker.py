"""Subprocess worker for the preemption-recovery test
(tests/test_failure_recovery.py).

Runs the production ``api.train`` on a tiny grain-backend MNIST config;
the parent SIGKILLs this process mid-run (a simulated preemption) and
then resumes from the Orbax checkpoint. Grain epochs are seeded
``seed*100003 + epoch`` (api.py::_grain_epoch) -- epoch-indexed, not
stream-consumed -- which is what makes kill+resume trajectory-EXACT.

Usage: python preempt_worker.py <workdir> <epochs> [--resume]
"""
import os
import sys

workdir = sys.argv[1]
epochs = int(sys.argv[2])
resume = "--resume" in sys.argv[3:]

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mmvae_tpu.utils.cpu_cache import enable_cpu_cache  # noqa: E402

enable_cpu_cache(os.path.dirname(__file__))

import json  # noqa: E402

from mmvae_tpu import api  # noqa: E402
from _preempt_cfg import tiny_grain_config  # noqa: E402

result = api.train(
    tiny_grain_config(epochs),
    workdir,
    seed=0,
    use_mesh=False,
    resume=resume,
    verbose=True,  # epoch lines let the parent watch progress
)
with open(os.path.join(workdir, "final.json"), "w") as f:
    json.dump(
        {"history": result.history, "best": result.best_test_elbo}, f
    )
print("worker done", flush=True)
