"""Subprocess worker for the multi-host parity test (tests/test_multihost.py).

Each worker is one "host": its own process with 4 virtual CPU devices,
joined into an 8-device global mesh via jax.distributed (Gloo
collectives on the CPU backend). Runs the REAL ``api.train`` loop on a
tiny config over a shared workdir; the primary process dumps the
per-epoch history for the parent test to compare against a
single-process 8-device run of the identical config.

Modes (round-4 VERDICT item #5: TP's model-axis psum and PP's ppermute
schedule must cross a REAL process boundary, not just the fake-device
mesh): ``dp`` (pure data parallel), ``fsdp`` (params+moments sharded),
``tp`` (2-way tensor parallel over a (data=4, model=2) mesh), ``pp``
(2-stage GPipe pipeline over a (data=4, pipe=2) mesh on the deep_mnist
trunk model).

Usage: python multihost_worker.py <pid> <nproc> <port> <workdir> [mode]
"""
import json
import os
import sys


def make_cfg(mode: str):
    """One config per mode, shared by the workers AND the parent test's
    single-process reference run -- the two must train the identical
    program for trajectory parity to mean anything."""
    from mmvae_tpu.configs import get_config

    tiny = dict(
        n_latents=8,
        epochs=2,
        batch_size=32,
        train_size=64,
        test_size=32,
        annealing_epochs=1,
    )
    if mode == "pp":
        return get_config("deep_mnist").replace(
            **tiny,
            pp=2,
            model_kwargs={
                "trunk_stages": 2,
                "trunk_depth": 1,
                "trunk_width": 32,
                "pp_n_micro": 2,
            },
        )
    cfg = get_config("mnist").replace(**tiny)
    if mode == "fsdp":
        cfg = cfg.replace(fsdp=True)
    elif mode == "tp":
        cfg = cfg.replace(tp=2)
    else:
        assert mode == "dp", mode
    return cfg


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    workdir = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "dp"

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4 "
        "--xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    from mmvae_tpu.parallel.multihost import initialize, is_primary

    initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    # Share the parent suite's persistent CPU compile cache: the worker
    # programs are identical run over run, so repeats are compile-free.
    from mmvae_tpu.utils.cpu_cache import enable_cpu_cache

    enable_cpu_cache(os.path.dirname(__file__))

    from mmvae_tpu import api

    result = api.train(
        make_cfg(mode), workdir, seed=0, use_mesh=True, verbose=False
    )

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


if __name__ == "__main__":
    main()
