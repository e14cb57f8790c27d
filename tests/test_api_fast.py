"""Fast-path API smoke: one tiny end-to-end train/eval/sample/generate.

The full API surface is covered by tests/test_api.py (marked slow --
~90s of CPU compiles); this keeps a single end-to-end flow in the
default ``-m "not slow"`` loop so an API regression can't hide behind
the marker split.
"""

import numpy as np

from mmvae_tpu import api
from mmvae_tpu.configs import get_config


def test_api_end_to_end_smoke(tmp_path):
    cfg = get_config("mnist").replace(
        n_latents=8, epochs=1, batch_size=32, train_size=64, test_size=32,
        annealing_epochs=1,
    )
    workdir = str(tmp_path)
    result = api.train(cfg, workdir, use_mesh=False, verbose=False)
    assert np.isfinite(result.best_test_elbo)
    elbo = api.eval_elbo(cfg, workdir=workdir)
    assert np.isfinite(elbo)
    out = api.sample(cfg, n=2, workdir=workdir)
    assert out["image"].shape == (2, 28, 28)
    gen = api.generate(cfg, {"label": np.asarray([3])}, workdir=workdir)
    assert gen["image"].shape == (1, 28, 28)


def test_data_dtype_bfloat16_trains(tmp_path):
    """config.data_dtype='bfloat16' (bf16-resident training data; the
    2.3x HBM-bandwidth knob, DESIGN.md section 10) trains end to end and
    lands within noise of the f32-data run."""
    import jax.numpy as jnp

    base = get_config("mnist").replace(
        n_latents=8, epochs=1, batch_size=32, train_size=64,
        test_size=32, annealing_epochs=1,
    )
    r32 = api.train(base, None, use_mesh=False, verbose=False,
                    dtype=jnp.bfloat16)
    rb16 = api.train(
        base.replace(data_dtype="bfloat16"), None, use_mesh=False,
        verbose=False, dtype=jnp.bfloat16,
    )
    assert np.isfinite(rb16.best_test_elbo)
    # Same data, bf16-rounded targets: trajectories agree within noise.
    np.testing.assert_allclose(
        rb16.best_test_elbo, r32.best_test_elbo, rtol=0.02
    )


def test_cosine_lr_schedule_trains_and_reloads(tmp_path):
    """lr_schedule='cosine': trains, the schedule actually decays, and
    the checkpoint reloads (the schedule changes the Adam pytree, so
    load must rebuild the same transform)."""
    from mmvae_tpu.api import _learning_rate

    cfg = get_config("mnist").replace(
        n_latents=8, epochs=2, batch_size=16, train_size=64,
        test_size=32, annealing_epochs=1,
        lr_schedule="cosine", warmup_epochs=1,
    )
    sched = _learning_rate(cfg)
    steps = cfg.train_size // cfg.batch_size
    assert float(sched(0)) < float(sched(steps))  # warming up
    assert float(sched(cfg.epochs * steps)) < float(sched(steps))  # decayed

    wd = str(tmp_path)
    result = api.train(cfg, wd, use_mesh=False, verbose=False)
    assert np.isfinite(result.best_test_elbo)
    # Reload through the checkpoint path (same opt pytree required).
    elbo = api.eval_elbo(cfg, workdir=wd)
    assert np.isfinite(elbo)
    out = api.sample(cfg, n=2, workdir=wd)
    assert out["image"].shape == (2, 28, 28)


def test_accum_steps_via_api(tmp_path):
    """config.accum_steps trains end to end and reloads (MultiSteps
    changes the opt-state pytree; templates must match)."""
    cfg = get_config("mnist").replace(
        n_latents=8, epochs=1, batch_size=16, train_size=64,
        test_size=32, annealing_epochs=1, accum_steps=2,
    )
    wd = str(tmp_path)
    result = api.train(cfg, wd, use_mesh=False, verbose=False)
    assert np.isfinite(result.best_test_elbo)
    assert np.isfinite(api.eval_elbo(cfg, workdir=wd))
