"""Utils: PNG grid writer, throughput harness."""

import os
import struct
import zlib

import numpy as np

from mmvae_tpu.utils import save_image_grid
from mmvae_tpu.utils.images import write_png


def _read_png_size(path):
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def test_write_png_grayscale(tmp_path):
    img = np.linspace(0, 1, 28 * 28, dtype=np.float32).reshape(28, 28)
    p = str(tmp_path / "x.png")
    write_png(p, img)
    assert _read_png_size(p) == (28, 28)


def test_write_png_rgb(tmp_path):
    img = np.random.default_rng(0).uniform(size=(16, 20, 3))
    p = str(tmp_path / "x.png")
    write_png(p, img.astype(np.float32))
    assert _read_png_size(p) == (20, 16)


def test_save_image_grid(tmp_path):
    imgs = np.random.default_rng(0).uniform(size=(10, 28, 28))
    p = str(tmp_path / "grid.png")
    save_image_grid(imgs.astype(np.float32), p, n_cols=4)
    w, h = _read_png_size(p)
    assert w == 4 * 30 + 2 and h == 3 * 30 + 2
    # decodable by zlib (IDAT integrity)
    with open(p, "rb") as f:
        data = f.read()
    idat_start = data.index(b"IDAT") + 4
    ln = struct.unpack(">I", data[idat_start - 8 : idat_start - 4])[0]
    raw = zlib.decompress(data[idat_start : idat_start + ln])
    assert len(raw) == h * (1 + w)


def test_measure_samples_per_sec():
    from mmvae_tpu.utils import measure_samples_per_sec
    import jax.numpy as jnp

    def step(state, batch):
        return state + 1, {"loss": jnp.asarray(1.0)}

    def batches():
        return iter([jnp.zeros(4)] * 10)

    sps = measure_samples_per_sec(step, 0, batches, 4, warmup=2, n_chips=1)
    assert sps > 0
