"""Latent-space diagnostics (tools/latent_report.py): pure-math unit
tests plus an end-to-end report on a tiny trained checkpoint."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
    ),
)

from latent_report import (  # noqa: E402
    active_units,
    modality_agreement,
    per_dim_kl,
)


def test_per_dim_kl_zero_at_prior():
    mu = np.zeros((32, 5), np.float32)
    lv = np.zeros((32, 5), np.float32)
    np.testing.assert_allclose(per_dim_kl(mu, lv), np.zeros(5), atol=1e-7)


def test_per_dim_kl_matches_closed_form():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(64, 3)).astype(np.float32)
    lv = rng.normal(scale=0.3, size=(64, 3)).astype(np.float32)
    want = (0.5 * (mu**2 + np.exp(lv) - 1 - lv)).mean(0)
    np.testing.assert_allclose(per_dim_kl(mu, lv), want, rtol=1e-6)


def test_active_units_detects_dead_dims():
    rng = np.random.default_rng(1)
    mu = np.zeros((256, 4), np.float32)
    mu[:, 0] = rng.normal(size=256)  # active
    mu[:, 2] = rng.normal(scale=0.5, size=256)  # active
    # dims 1, 3 constant -> dead
    n, var = active_units(mu)
    assert n == 2
    assert var[0] > 0.01 and var[2] > 0.01
    assert var[1] < 1e-6 and var[3] < 1e-6


def test_modality_agreement_collapse_signature():
    """A collapsed expert (posterior == prior regardless of input) has
    kl_to_prior ~ 0 while a healthy expert's is large -- the MultiMNIST
    text-expert telltale the tool exists to surface."""
    rng = np.random.default_rng(2)
    B, L = 128, 6
    mu_e = np.zeros((B, 2, L), np.float32)
    lv_e = np.zeros((B, 2, L), np.float32)
    # modality 0: healthy, informative expert (tight posterior).
    mu_e[:, 0] = rng.normal(size=(B, L)) * 3
    lv_e[:, 0] = -2.0
    # modality 1: collapsed -- emits a WIDE (low-precision) posterior
    # whose PoE-with-prior is ~ the prior, independent of x.
    mu_e[:, 1] = 0.0
    lv_e[:, 1] = 6.0
    # joint ~ modality 0's PoE with the prior.
    t0 = np.exp(-lv_e[:, 0])
    prec = 1.0 + t0
    mu_j = (mu_e[:, 0] * t0 / prec).astype(np.float32)
    lv_j = (-np.log(prec)).astype(np.float32)
    rep = modality_agreement(mu_e, lv_e, mu_j, lv_j)
    assert rep[0]["kl_to_prior"] > 1.0  # healthy: far from prior
    assert rep[1]["kl_to_prior"] < 0.05  # collapsed: at the prior
    assert rep[1]["kl_to_joint"] > rep[0]["kl_to_joint"]
    # Healthy modality agrees with the joint it dominates.
    assert rep[0]["kl_to_joint"] < 0.1


@pytest.mark.slow
def test_latent_report_end_to_end(tmp_path):
    from latent_report import main as report_main

    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    cfg = get_config("mnist").replace(
        n_latents=8, batch_size=16, train_size=256, test_size=64,
        epochs=3,
    )
    api.train(cfg, seed=0, workdir=str(tmp_path))
    rc = report_main("mnist", str(tmp_path), n=64)
    assert rc == 0
    rep = json.load(open(tmp_path / "latent_report.json"))
    assert rep["n_latents"] == 8
    assert rep["n_examples"] == 64
    assert 0 <= rep["active_units"] <= 8
    assert rep["total_kl"] > 0
    assert set(rep["modality_agreement"]) == {"image", "label"}
    for d in rep["traversal_dims"]:
        assert (tmp_path / f"traversal_d{d}.png").exists()
    assert (tmp_path / "interpolation.png").exists()
