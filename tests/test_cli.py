"""CLI flows end-to-end on CPU (flag overrides, artifact outputs)."""

import json
import os

import numpy as np
import pytest

from mmvae_tpu.cli import main


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, capfd_noop=None):
    wd = str(tmp_path_factory.mktemp("cli_run"))
    rc = main([
        "train", "--config", "mnist", "--workdir", wd,
        "--epochs", "1", "--train-size", "64", "--test-size", "32",
        "--n-latents", "8", "--batch-size", "16", "--no-mesh",
    ])
    assert rc == 0
    return wd


def test_eval(workdir, capsys):
    rc = main([
        "eval", "--config", "mnist", "--workdir", workdir,
        "--test-size", "32", "--n-latents", "8",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["elbo"])


def test_sample_png(workdir, capsys, tmp_path):
    png = str(tmp_path / "grid.png")
    rc = main([
        "sample", "--config", "mnist", "--workdir", workdir,
        "--n", "4", "--n-latents", "8", "--out", png,
    ])
    assert rc == 0
    assert os.path.exists(png)
    with open(png, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_generate_inline_condition(workdir, capsys, tmp_path):
    npz = str(tmp_path / "gen.npz")
    rc = main([
        "generate", "--config", "mnist", "--workdir", workdir,
        "--n-latents", "8", "--condition-on", "label=[1,2]",
        "--out", npz,
    ])
    assert rc == 0
    with np.load(npz) as f:
        assert f["image"].shape == (2, 28, 28)


def test_generate_npy_file_condition(workdir, tmp_path, capsys):
    from mmvae_tpu.data import load_dataset

    ds = load_dataset("mnist", "test", n=2, device_put=False)
    npy = str(tmp_path / "img.npy")
    np.save(npy, ds.arrays["image"])
    rc = main([
        "generate", "--config", "mnist", "--workdir", workdir,
        "--n-latents", "8", "--condition-on", f"image={npy}",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["shapes"]["label"] == [2]


@pytest.mark.slow
def test_multimnist_text_decoding(tmp_path, capsys):
    wd = str(tmp_path / "mm")
    rc = main([
        "train", "--config", "multimnist", "--workdir", wd,
        "--epochs", "1", "--train-size", "32", "--test-size", "16",
        "--n-latents", "8", "--batch-size", "16", "--no-mesh",
    ])
    assert rc == 0
    rc = main([
        "sample", "--config", "multimnist", "--workdir", wd,
        "--n", "4", "--n-latents", "8",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "text_decoded" in out
    assert len(out["text_decoded"]) == 4


def test_cross_recon_flag_overrides_config():
    import argparse

    from mmvae_tpu.cli import _overrides
    from mmvae_tpu.configs import get_config

    args = argparse.Namespace(cross_recon=True)
    cfg = _overrides(args, get_config("mnist"))
    assert cfg.cross_recon is True
    # Absent flag (None) leaves the config default untouched.
    args2 = argparse.Namespace(cross_recon=None)
    cfg2 = _overrides(args2, get_config("multimnist"))
    assert cfg2.cross_recon is True  # multimnist default stays on
