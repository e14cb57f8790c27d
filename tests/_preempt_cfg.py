"""Shared tiny config for the preemption-recovery test + its worker."""

from mmvae_tpu.configs import get_config


def tiny_grain_config(epochs: int):
    # Grain backend: epochs are seeded ``seed*100003 + epoch``
    # (api.py::_grain_epoch), so a killed-and-resumed run replays the
    # exact batches the uninterrupted run would have seen.
    return get_config("mnist").replace(
        n_latents=8,
        epochs=epochs,
        batch_size=32,
        train_size=128,
        test_size=32,
        annealing_epochs=2,
        data_backend="grain",
    )
