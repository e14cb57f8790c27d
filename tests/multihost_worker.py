"""Subprocess worker for the multi-host parity test (tests/test_multihost.py).

Each worker is one "host": its own process with 4 virtual CPU devices,
joined into an 8-device global mesh via jax.distributed (Gloo
collectives on the CPU backend). Runs the REAL ``api.train`` loop on a
tiny MNIST config over a shared workdir; the primary process dumps the
per-epoch history for the parent test to compare against a
single-process 8-device run of the identical config.

Usage: python multihost_worker.py <pid> <nproc> <port> <workdir> [dp|fsdp]
"""
import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
workdir = sys.argv[4]
mode = sys.argv[5] if len(sys.argv) > 5 else "dp"

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    "--xla_cpu_collective_call_terminate_timeout_seconds=1200"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mmvae_tpu.parallel.multihost import initialize, is_primary  # noqa: E402

initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)

# Share the parent suite's persistent CPU compile cache: the two worker
# programs are identical, so the second run of this test is compile-free.
from mmvae_tpu.utils.cpu_cache import enable_cpu_cache  # noqa: E402

enable_cpu_cache(os.path.dirname(__file__))

from mmvae_tpu import api  # noqa: E402
from mmvae_tpu.configs import get_config  # noqa: E402

cfg = get_config("mnist").replace(
    n_latents=8,
    epochs=2,
    batch_size=32,
    train_size=64,
    test_size=32,
    annealing_epochs=1,
    fsdp=(mode == "fsdp"),
)

result = api.train(cfg, workdir, seed=0, use_mesh=True, verbose=False)

if is_primary():
    with open(os.path.join(workdir, "history.json"), "w") as f:
        json.dump(
            {
                "n_processes": jax.process_count(),
                "n_devices": len(jax.devices()),
                "history": result.history,
                "best": result.best_test_elbo,
            },
            f,
        )
print(f"worker {pid}: done", flush=True)
