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


# -- native BPE tokenizer ------------------------------------------------------

_BPE_LIB: Optional[ctypes.CDLL] = None
_BPE_TRIED = False


def _load_bpe() -> Optional[ctypes.CDLL]:
    global _BPE_LIB, _BPE_TRIED
    if _BPE_LIB is not None or _BPE_TRIED:
        return _BPE_LIB
    _BPE_TRIED = True
    so = Path(__file__).with_name("_bpe_tokenizer.so")
    if not so.exists():
        try:
            from tvc.native.build import build

            build(only="_bpe_tokenizer.so")
        except Exception:
            return None
    if not so.exists():
        return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.bpe_init.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ]
        lib.bpe_init.restype = ctypes.c_int
        lib.bpe_encode_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.bpe_encode_batch.restype = ctypes.c_int
        lib.bpe_ready.restype = ctypes.c_int
        _BPE_LIB = lib
    except OSError:
        _BPE_LIB = None
    return _BPE_LIB


def bpe_available() -> bool:
    return _load_bpe() is not None


def _blob(strings) -> Tuple[bytes, np.ndarray]:
    """Concatenated UTF-8 bytes + int64 offsets[n+1]."""
    enc = [s.encode("utf-8") for s in strings]
    offsets = np.zeros(len(enc) + 1, np.int64)
    np.cumsum([len(b) for b in enc], out=offsets[1:])
    return b"".join(enc), offsets


def bpe_init(encoder: dict, ranks: dict) -> bool:
    """Load the python BPETokenizer's encoder/rank tables into the native
    library (token ids come out bit-identical to the python path)."""
    lib = _load_bpe()
    if lib is None:
        return False
    vocab_tokens = list(encoder.keys())
    vblob, voff = _blob(vocab_tokens)
    vids = np.asarray([encoder[t] for t in vocab_tokens], np.int32)
    merge_keys = [None] * len(ranks)
    for (first, second), rank in ranks.items():
        merge_keys[rank] = f"{first}\x01{second}"
    assert all(k is not None for k in merge_keys), "ranks must be 0..n-1"
    mblob, moff = _blob(merge_keys)
    rc = lib.bpe_init(
        vblob, voff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(vocab_tokens),
        mblob, moff.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(merge_keys),
    )
    return rc == 0


def bpe_encode_batch(
    texts: Sequence[str],
    context_length: int,
    sot_id: int,
    eot_id: int,
    pad_id: int = 0,
) -> np.ndarray:
    """Tokenize LOWERCASED ASCII texts -> int32 [B, context_length].

    Caller guarantees every string is ASCII and lowercased (the wrapper in
    tvc/models/tokenizer.py routes non-ASCII strings to the python path).
    """
    lib = _load_bpe()
    if lib is None or not lib.bpe_ready():
        raise RuntimeError("native BPE unavailable or uninitialized")
    blob, offsets = _blob(texts)
    out = np.full((len(texts), context_length), pad_id, np.int32)
    rc = lib.bpe_encode_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(texts), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        context_length, sot_id, eot_id,
    )
    if rc != 0:
        raise RuntimeError("bpe_encode_batch failed")
    return out
