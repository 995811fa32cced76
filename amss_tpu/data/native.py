"""ctypes binding for the native batch-assembly kernel (native/amss_data.cc).

Compiles on first use (g++, cached in native/); falls back to the numpy path
transparently if no toolchain is available.  See amss_data.cc for why only the
copy/scale runs natively.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src_dir = os.path.join(_repo_root(), "native")
    so = os.path.join(src_dir, "libamss_data.so")
    src = os.path.join(src_dir, "amss_data.cc")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.amss_batch_fill.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.amss_batch_fill.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def batch_fill(
    out: np.ndarray,  # [n_chunks, T] float32, C-contiguous
    shards: list[np.ndarray],  # per-speaker float32 waveforms (mmap ok)
    speaker_idx: np.ndarray,  # [n_chunks] int32 indices into shards
    starts: np.ndarray,  # [n_chunks] int64 sample offsets
    gains: np.ndarray,  # [n_chunks] float32
) -> bool:
    """Native gather+scale; returns False if the library is unavailable."""
    lib = _load()
    if lib is None:
        return False
    n, t = out.shape
    ptrs = (ctypes.POINTER(ctypes.c_float) * len(shards))()
    lens = np.empty(len(shards), np.int64)
    for i, s in enumerate(shards):
        assert s.dtype == np.float32
        ptrs[i] = s.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        lens[i] = len(s)
    lib.amss_batch_fill(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n),
        ctypes.c_int64(t),
        ptrs,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.ascontiguousarray(speaker_idx, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)
        ),
        np.ascontiguousarray(starts, np.int64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int64)
        ),
        np.ascontiguousarray(gains, np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)
        ),
    )
    return True
