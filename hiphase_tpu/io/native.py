"""ctypes bindings for the native host library (native/hiphase_native.cc).

Loads ``libhiphase_native.so`` when built (``make -C native``); all callers
fall back to the pure-Python implementations when absent, so the framework
works without a compile step and the native path is a transparent speedup.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_SO_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libhiphase_native.so"),
    os.path.join(os.path.dirname(__file__), "libhiphase_native.so"),
]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("HIPHASE_TPU_NO_NATIVE"):
        return None
    for path in _SO_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.hn_bgzf_compress_many.restype = ctypes.c_int64
            lib.hn_bgzf_compress_many.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int]
            lib.hn_bgzf_decompress_many.restype = ctypes.c_int32
            lib.hn_bgzf_decompress_many.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
            lib.hn_bgzf_scan.restype = ctypes.c_int64
            lib.hn_bgzf_scan.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64]
            lib.hn_edit_distance_batch.restype = None
            lib.hn_edit_distance_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_int]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def bgzf_compress_blocks(payloads: list[bytes], level: int = 6,
                         threads: int = 4) -> bytes | None:
    """Compress payloads (each ≤64KiB) into concatenated BGZF blocks.
    Returns None when the native library is unavailable."""
    lib = _load()
    if lib is None or not payloads:
        return None
    offsets = np.zeros(len(payloads) + 1, dtype=np.int64)
    for i, p in enumerate(payloads):
        offsets[i + 1] = offsets[i] + len(p)
    blob = b"".join(payloads)
    src = np.frombuffer(blob, dtype=np.uint8)
    cap = int(offsets[-1]) + len(payloads) * (1024 + 26) + 65536
    out = np.empty(cap, dtype=np.uint8)
    out_offsets = np.zeros(len(payloads) + 1, dtype=np.int64)
    total = lib.hn_bgzf_compress_many(
        src.ctypes.data, offsets.ctypes.data, len(payloads), level,
        out.ctypes.data, cap, out_offsets.ctypes.data, threads)
    if total < 0:
        return None
    return out[:total].tobytes()


def bgzf_decompress_all(data: bytes, threads: int = 4) -> bytes | None:
    """Scan + decompress an entire BGZF byte stream in parallel.
    Returns None when unavailable or on malformed input."""
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    max_blocks = max(len(data) // 26 + 2, 16)
    offsets = np.zeros(max_blocks + 1, dtype=np.int64)
    isizes = np.zeros(max_blocks, dtype=np.int64)
    n = lib.hn_bgzf_scan(src.ctypes.data, len(data), offsets.ctypes.data,
                         isizes.ctypes.data, max_blocks)
    if n < 0:
        return None
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(isizes[:n], out=out_offsets[1:])
    out = np.empty(int(out_offsets[n]), dtype=np.uint8)
    rc = lib.hn_bgzf_decompress_many(
        src.ctypes.data, offsets[:n + 1].ctypes.data, int(n),
        out.ctypes.data, out_offsets.ctypes.data, threads)
    if rc != 0:
        return None
    return out.tobytes()


def edit_distance_batch_native(queries: np.ndarray, query_lens: np.ndarray,
                               targets: np.ndarray, target_lens: np.ndarray,
                               threads: int = 1) -> np.ndarray | None:
    """Batched Levenshtein on the native library; None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    queries = np.ascontiguousarray(queries, dtype=np.uint8)
    targets = np.ascontiguousarray(targets, dtype=np.uint8)
    qlens = np.ascontiguousarray(query_lens, dtype=np.int32)
    tlens = np.ascontiguousarray(target_lens, dtype=np.int32)
    n = queries.shape[0]
    out = np.zeros(n, dtype=np.int32)
    lib.hn_edit_distance_batch(
        queries.ctypes.data, qlens.ctypes.data, queries.shape[1],
        targets.ctypes.data, tlens.ctypes.data, targets.shape[1],
        n, out.ctypes.data, threads)
    return out
