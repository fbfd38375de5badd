"""ctypes binding for the native C++ preprocessing library.

The reference has zero native code (SURVEY.md §2: everything is stock
PyTorch); this is the framework's native data-loader component — a fused
bicubic-resize + normalize + CHW pass in C++ (native/preproc.cpp), built on
first use with g++ and bound through ctypes (no pybind11 in this image).
Falls back transparently to the PIL/numpy host pipeline when no compiler is
available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

from paligemma_tpu.processing import IMAGENET_STANDARD_MEAN, IMAGENET_STANDARD_STD

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "preproc.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libpreproc.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    # Compile to a process-unique temp path and rename atomically: concurrent
    # builders must never dlopen a half-written .so.
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.preproc_batch.restype = ctypes.c_int
        lib.preproc_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def preprocess_images_native(
    images: np.ndarray,
    out_size: int,
    mean=IMAGENET_STANDARD_MEAN,
    std=IMAGENET_STANDARD_STD,
) -> np.ndarray:
    """Fused native preprocessing: (N, H, W, 3) uint8 -> (N, 3, S, S) float32.

    Same semantics as the host pipeline (bicubic resize -> /255 ->
    (x-mean)/std -> CHW); raises RuntimeError if the native library can't be
    built/loaded (callers should then use ``processing.process_images``).
    """
    lib = load()
    if lib is None:
        raise RuntimeError("native preproc library unavailable (no g++?)")
    imgs = np.ascontiguousarray(images, dtype=np.uint8)
    if imgs.ndim == 3:
        imgs = imgs[None]
    n, h, w, c = imgs.shape
    mean_arr = np.asarray(mean, np.float32)
    std_arr = np.asarray(std, np.float32)
    if c != len(mean_arr) or c != len(std_arr):
        # The C kernel indexes mean/std per channel; a mismatch would read
        # past the buffers (RGBA input with 3-element stats, etc.).
        raise ValueError(
            f"images have {c} channels but mean/std have "
            f"{len(mean_arr)}/{len(std_arr)} entries; convert to RGB first"
        )
    out = np.empty((n, c, out_size, out_size), np.float32)
    rc = lib.preproc_batch(
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_size, out_size,
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"preproc_batch failed with code {rc}")
    return out
