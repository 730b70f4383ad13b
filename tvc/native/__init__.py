"""Native (C++) host-side ops, loaded via ctypes.

Build: ``python -m tvc.native.build`` (g++ -O3 -march=native -fopenmp ->
_image_ops.so next to this file). Auto-builds on first import when a
compiler is available; everything degrades to the pure-python/PIL path
when it isn't (``available()`` reports which).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def _so_path() -> Path:
    return Path(__file__).with_name("_image_ops.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _so_path()
    if not so.exists():
        try:
            from tvc.native.build import build

            build()
        except Exception:
            return None
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.resize_normalize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.resize_normalize_varied.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.l2_normalize_rows.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ]
        lib.tvc_native_version.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_normalize_batch(
    images: np.ndarray,
    size: int,
    mean: np.ndarray = CLIP_MEAN,
    std: np.ndarray = CLIP_STD,
) -> np.ndarray:
    """uint8 [B, H, W, 3] -> CLIP-normalized float32 [B, size, size, 3].

    Native fast path; raises RuntimeError if the library is unavailable
    (callers use ``available()`` to pick the PIL fallback).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable; build with python -m tvc.native.build")
    images = np.ascontiguousarray(images, dtype=np.uint8)
    if images.ndim != 4 or images.shape[-1] != 3:
        raise ValueError(f"expected [B, H, W, 3] uint8, got {images.shape}")
    B, H, W, _ = images.shape
    out = np.empty((B, size, size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.resize_normalize_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        B, H, W, _fptr(out), size, _fptr(mean), _fptr(std),
    )
    return out


def resize_normalize_varied(
    images: Sequence[np.ndarray],
    size: int,
    mean: np.ndarray = CLIP_MEAN,
    std: np.ndarray = CLIP_STD,
) -> np.ndarray:
    """List of uint8 [h_i, w_i, 3] -> float32 [B, size, size, 3]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    arrs = [np.ascontiguousarray(im, np.uint8) for im in images]
    for a in arrs:
        if a.ndim != 3 or a.shape[-1] != 3:
            raise ValueError(f"expected [h, w, 3] uint8, got {a.shape}")
    blob = np.concatenate([a.reshape(-1) for a in arrs])
    offsets = np.zeros(len(arrs), np.int64)
    pos = 0
    dims = np.zeros(2 * len(arrs), np.int32)
    for i, a in enumerate(arrs):
        offsets[i] = pos
        dims[2 * i], dims[2 * i + 1] = a.shape[0], a.shape[1]
        pos += a.size
    out = np.empty((len(arrs), size, size, 3), np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib.resize_normalize_varied(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(arrs), _fptr(out), size, _fptr(mean), _fptr(std),
    )
    return out


def l2_normalize_rows(data: np.ndarray) -> np.ndarray:
    """In-place row L2 normalization of a float32 [N, D] matrix."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    data = np.ascontiguousarray(data, np.float32)
    lib.l2_normalize_rows(_fptr(data), data.shape[0], data.shape[1])
    return data
