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


def test_config_file_overrides(tmp_path, capsys):
    """--config-file reaches every field including model_kwargs (lists
    become tuples so the flax module stays hashable); explicit flags
    still win over the file."""
    import json as json_mod

    cfg_file = tmp_path / "exp.json"
    cfg_file.write_text(json_mod.dumps({
        "n_latents": 8,
        "epochs": 5,
        "batch_size": 16,
        "train_size": 32,
        "test_size": 16,
        "annealing_epochs": 1,
        "model_kwargs": {"lambda_label": 5.0},
    }))
    wd = str(tmp_path / "run")
    rc = main([
        "train", "--config", "mnist", "--workdir", wd,
        "--config-file", str(cfg_file),
        "--epochs", "1",  # flag beats file
        "--no-mesh",
    ])
    assert rc == 0
    saved = json_mod.loads(
        (tmp_path / "run" / "config.json").read_text()
    )
    assert saved["n_latents"] == 8
    assert saved["epochs"] == 1  # flag won
    assert saved["model_kwargs"] == {"lambda_label": 5.0}


def test_run_config_roundtrip_keeps_tuples(tmp_path):
    """Workdir config snapshots restore model_kwargs lists as tuples
    (hashable module -> memoized eval runner)."""
    import json as json_mod

    from mmvae_tpu import api
    from mmvae_tpu.configs import get_config

    cfg = get_config("multimnist").replace(
        model_kwargs={"conv_features": (8, 16), "lambda_text": 5.0}
    )
    wd = str(tmp_path)
    api._save_run_config(wd, cfg)
    back = api.load_run_config(wd)
    assert back.model_kwargs["conv_features"] == (8, 16)
    assert isinstance(back.model_kwargs["conv_features"], tuple)


def test_perf_flags_reach_config(tmp_path):
    """--data-dtype / --reshuffle-every / --ema-decay land in the run's
    config snapshot (and therefore drive the train path)."""
    import json as json_mod

    wd = str(tmp_path / "run")
    rc = main([
        "train", "--config", "mnist", "--workdir", wd,
        "--epochs", "1", "--train-size", "64", "--test-size", "32",
        "--n-latents", "8", "--batch-size", "16", "--no-mesh",
        "--data-dtype", "bfloat16", "--reshuffle-every", "4",
        "--ema-decay", "0.9", "--cross-recon", "--cross-recon-stopgrad",
    ])
    assert rc == 0
    saved = json_mod.loads((tmp_path / "run" / "config.json").read_text())
    assert saved["data_dtype"] == "bfloat16"
    assert saved["reshuffle_every"] == 4
    assert saved["ema_decay"] == 0.9
    assert saved["cross_recon"] is True
    assert saved["cross_recon_stopgrad"] is True


def test_cycle_render_binarize_flag_forms(tmp_path):
    """--cycle-render-binarize parses all three forms: absent (config
    default), bare flag (True), and 'both' (dual-form cycle CE)."""
    from mmvae_tpu.cli import _build_parser

    parser = _build_parser()
    a0 = parser.parse_args(["train", "--config", "multimnist"])
    assert a0.cycle_render_binarize is None
    a1 = parser.parse_args(
        ["train", "--config", "multimnist", "--cycle-render-binarize"]
    )
    assert a1.cycle_render_binarize is True
    a2 = parser.parse_args(
        ["train", "--config", "multimnist",
         "--cycle-render-binarize", "both"]
    )
    assert a2.cycle_render_binarize == "both"


def test_mixture_objective_clears_mvae_default_knobs(tmp_path):
    """`--objective mmvae` on a config whose DEFAULTS carry mvae-only
    term knobs (celeba: n_random_subsets=4) must clear them instead of
    tripping the step guard; explicitly-passed conflicts still error."""
    wd = str(tmp_path / "mix")
    tiny = str(tmp_path / "tiny_celeba.json")
    with open(tiny, "w") as f:
        json.dump(
            {
                "model_kwargs": {
                    "image_hw": [8, 8],
                    "conv_features": [4, 8],
                },
                "data_kwargs": {"hw": 8},
            },
            f,
        )
    rc = main([
        "train", "--config", "celeba", "--workdir", wd,
        "--config-file", tiny,
        "--objective", "mmvae", "--epochs", "1", "--train-size", "8",
        "--test-size", "8", "--batch-size", "4", "--n-latents", "8",
        "--no-mesh",
    ])
    assert rc == 0
    snap = json.load(open(os.path.join(wd, "config.json")))
    assert snap["objective"] == "mmvae"
    assert snap["n_random_subsets"] == 0

    with pytest.raises(ValueError, match="mvae term-structure"):
        main([
            "train", "--config", "celeba",
            "--workdir", str(tmp_path / "bad"),
            "--objective", "mmvae", "--n-random-subsets", "2",
            "--epochs", "1", "--train-size", "8", "--test-size", "8",
            "--batch-size", "4", "--n-latents", "8", "--no-mesh",
        ])


def test_pp_flag_parses_and_overrides():
    """--pp reaches config.pp; deep_mnist is a selectable config."""
    from mmvae_tpu.cli import _build_parser, _overrides
    from mmvae_tpu.configs import get_config

    parser = _build_parser()
    args = parser.parse_args(
        ["train", "--config", "deep_mnist", "--pp", "2"]
    )
    assert args.pp == 2
    cfg = _overrides(args, get_config("deep_mnist"))
    assert cfg.pp == 2
    assert cfg.name == "deep_mnist"
