"""ctypes bindings for the native (C++/OpenMP) data generators.

``native/datagen.cpp`` reimplements the two loop-heavy synthetic
generators (CelebA rasterizer ~500/s in numpy, MultiMNIST compositor)
with OpenMP over examples. Deterministic per (seed, n) with its own RNG
-- same distribution and visual semantics as the numpy reference path,
not bit-identical to it.

Selection: ``MMVAE_DATAGEN=native`` makes ``load_dataset`` use these for
celeba/multimnist; the numpy path stays the default so results are
reproducible on machines without the built library. ``ensure_built()``
compiles the .so on demand (g++ present in this image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = [
    "available",
    "ensure_built",
    "make_celeba_native",
    "make_multimnist_native",
]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libmmvae_datagen.so")
_lock = threading.Lock()
_lib = None


def ensure_built(force: bool = False) -> str:
    """Build libmmvae_datagen.so if missing; returns its path."""
    with _lock:
        if force or not os.path.exists(_SO_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"]
                + (["-B"] if force else []),
                check=True,
                capture_output=True,
            )
    return _SO_PATH


def _load():
    global _lib
    if _lib is None:
        ensure_built()
        lib = ctypes.CDLL(_SO_PATH)
        lib.mmvae_make_celeba.argtypes = [
            ctypes.c_uint64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.mmvae_make_multimnist.argtypes = [
            ctypes.c_uint64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    """True if the native library exists or can be built."""
    if os.path.exists(_SO_PATH):
        return True
    try:
        ensure_built()
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def make_celeba_native(n: int, seed: int = 0, hw: int = 64):
    lib = _load()
    images = np.empty((n, hw, hw, 3), np.float32)
    attrs = np.empty((n, 18), np.float32)
    lib.mmvae_make_celeba(
        ctypes.c_uint64(seed + 1),  # +1: seed 0 would zero the RNG stream
        ctypes.c_int64(n),
        ctypes.c_int(hw),
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        attrs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return {"image": images, "attrs": attrs}


def make_multimnist_native(
    n: int, seed: int = 0, hw: int = 50, max_digits: int = 4
):
    if not 1 <= max_digits <= 8:
        # The C++ side composites into a fixed 8-slot position buffer
        # (and bails out on out-of-range values, leaving the output
        # uninitialized) -- reject here with a real error instead.
        raise ValueError(f"max_digits must be in [1, 8], got {max_digits}")
    lib = _load()
    images = np.empty((n, hw, hw), np.float32)
    tokens = np.empty((n, max_digits + 1), np.int32)
    lib.mmvae_make_multimnist(
        ctypes.c_uint64(seed + 1),
        ctypes.c_int64(n),
        ctypes.c_int(hw),
        ctypes.c_int(max_digits),
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return {"image": images, "text": tokens}
