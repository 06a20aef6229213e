"""ctypes bindings for the native (C++) data path.

The extension (native/msim_native.cc) accelerates the host-side hot loops:
parallel TFRecord + SequenceExample parsing and event-window segment
gathers.  It is compiled on first use with g++ (cached under the repo's
native/ directory); every consumer falls back to the pure-Python
implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "msim_native.cc")
_SO = os.path.join(os.path.dirname(_SRC), "libmsim_native.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    # compile to a process-unique temp and rename into place: g++ writes
    # its output incrementally, and another process may dlopen _SO while
    # we build (os.replace is atomic; open handles keep the old inode)
    tmp = f"{_SO}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=300)
        os.replace(tmp, _SO)
        return _SO
    except (OSError, subprocess.SubprocessError):
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None


def load_native() -> Optional[ctypes.CDLL]:
    """The native library, building it on first use; None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SRC):
            return None
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.msim_crc32c.restype = ctypes.c_uint32
        lib.msim_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.msim_load_event_batch.restype = ctypes.c_int64
        lib.msim_load_event_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.msim_gather_segments.restype = None
        lib.msim_gather_segments.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
        return _LIB


def native_crc32c(data: bytes) -> Optional[int]:
    lib = load_native()
    if lib is None:
        return None
    return int(lib.msim_crc32c(data, len(data)))


def native_load_event_batch(paths: Sequence[str], key: str, max_time: int,
                            feat_dim: int, n_threads: int = 0):
    """-> (features [N, max_time, feat_dim], seq_len [N], labels [N],
    ok_count) or None when the native path is unavailable."""
    lib = load_native()
    if lib is None:
        return None
    n = len(paths)
    out = np.zeros((n, max_time, feat_dim), np.float32)
    seq_len = np.zeros((n,), np.int32)
    labels = np.zeros((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(
        *[p.encode() for p in paths])
    ok = lib.msim_load_event_batch(
        c_paths, n, key.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_time, feat_dim,
        seq_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads)
    return out, seq_len, labels, int(ok)


def native_gather_segments(feats: np.ndarray, starts: np.ndarray,
                           offsets: np.ndarray) -> Optional[np.ndarray]:
    """feats [T, D] f32, starts [E] i64, offsets [E, S] i64 ->
    [E, S, D] f32, or None when unavailable."""
    lib = load_native()
    if lib is None:
        return None
    feats = np.ascontiguousarray(feats, np.float32)
    starts = np.ascontiguousarray(starts, np.int64)
    offsets = np.ascontiguousarray(offsets, np.int64)
    e, s = offsets.shape
    # the C side memcpys unchecked; validate every frame index here so a
    # corrupt label file surfaces as IndexError, not an OOB read
    idx = starts.reshape(-1, 1) + offsets
    if idx.size and (idx.min() < 0 or idx.max() >= feats.shape[0]):
        raise IndexError(
            f"gather_segments frame index out of range: "
            f"[{idx.min()}, {idx.max()}] vs {feats.shape[0]} rows")
    out = np.zeros((e, s, feats.shape[1]), np.float32)
    lib.msim_gather_segments(
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        feats.shape[1],
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        e, s, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
