"""ctypes bindings for the native (C++) golden scanners.

Mirrors the Python oracles' semantics at ~10^8 bytes/s for corpus-scale
conformance diffing.  The library auto-builds on first use (g++ is part of
the baked toolchain; no pybind11 in this image, so plain C ABI + ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = [
    "native_available",
    "nfa_scan_native",
    "dfa_scan_native",
    "anchored_spans_native",
    "nfa_match_positions_native",
]

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libgolden_scan.so"))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "golden_scan.cpp"))
    stale = not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    )
    if stale:
        subprocess.run(
            ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(so)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.nfa_scan.restype = ctypes.c_int
    lib.nfa_scan.argtypes = [
        i32p, i32p, u8p, ctypes.c_int64, ctypes.c_int64,
        u8p, ctypes.c_int64, i64p, i32p, ctypes.c_int64,
    ]
    lib.dfa_scan.restype = ctypes.c_int32
    lib.dfa_scan.argtypes = [
        i32p, i32p, u8p, ctypes.c_int64,
        u8p, ctypes.c_int64, ctypes.c_int32, i64p, u8p,
    ]
    lib.lazy_walk.restype = ctypes.c_int64
    lib.lazy_walk.argtypes = [
        i32p, ctypes.c_int64, u8p, u8p, u8p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), i64p,
    ]
    lib.kgram_level1.restype = None
    lib.kgram_level1.argtypes = [
        u8p, ctypes.c_int64, u8p, i32p, ctypes.c_int64, i32p,
    ]
    lib.kgram_pair.restype = None
    lib.kgram_pair.argtypes = [
        i32p, ctypes.c_int64, i32p, ctypes.c_int64, i32p,
    ]
    lib.lazy_walk_multi.restype = ctypes.c_int64
    lib.lazy_walk_multi.argtypes = [
        i32p, ctypes.c_int64, u8p, u8p, u8p,
        i64p, i64p, i32p, ctypes.c_int64, i64p, ctypes.c_int32,
        ctypes.c_int64,
    ]
    lib.anchored_spans.restype = ctypes.c_int64
    lib.anchored_spans.argtypes = [
        i32p, u8p, u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        u8p, ctypes.c_int64, i64p, ctypes.c_int64, i64p, ctypes.c_int64,
    ]
    lib.nfa_match_positions.restype = ctypes.c_int64
    lib.nfa_match_positions.argtypes = [
        i32p, i32p, u8p, ctypes.c_int64, ctypes.c_int64,
        u8p, ctypes.c_int64, i32p, ctypes.c_int64, i64p, ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def nfa_scan_native(
    delta: np.ndarray,      # (C, S+1, K) int32
    class_of: np.ndarray,   # (256,) int32
    accept: np.ndarray,     # (S+1,) bool/uint8
    stream: np.ndarray,     # (len,) uint8
    active: np.ndarray | None = None,
    counts: np.ndarray | None = None,
    active_cap: int = 1024,
):
    """Returns (counts (S+1,) int64, final_active (cap,) int32).

    Raises on active-set overflow (mirrors the TPU engine's flag)."""
    lib = _load()
    c, s1, k = delta.shape
    s = s1 - 1
    delta = np.ascontiguousarray(delta, dtype=np.int32)
    class_of = np.ascontiguousarray(class_of, dtype=np.int32)
    accept8 = np.ascontiguousarray(accept, dtype=np.uint8)
    stream = np.ascontiguousarray(stream, dtype=np.uint8)
    if counts is None:
        counts = np.zeros(s + 1, dtype=np.int64)
    if active is None:
        active = np.full(active_cap, s, dtype=np.int32)
        active[0] = 0
    active = np.ascontiguousarray(active, dtype=np.int32)
    rc = lib.nfa_scan(
        _ptr(delta, ctypes.c_int32), _ptr(class_of, ctypes.c_int32),
        _ptr(accept8, ctypes.c_uint8), s, k,
        _ptr(stream, ctypes.c_uint8), len(stream),
        _ptr(counts, ctypes.c_int64), _ptr(active, ctypes.c_int32), len(active),
    )
    if rc:
        raise RuntimeError("native nfa_scan: active-set capacity exceeded")
    return counts, active


def dfa_scan_native(
    table: np.ndarray,      # (C, S) int32
    class_of: np.ndarray,   # (256,) int32
    accept: np.ndarray,     # (S,) bool/uint8
    stream: np.ndarray,     # (len,) uint8
    start: int = 0,
    want_mask: bool = True,
):
    """Returns (counts (S,) int64, match_mask (len,) bool | None, final)."""
    lib = _load()
    c, s = table.shape
    table = np.ascontiguousarray(table, dtype=np.int32)
    class_of = np.ascontiguousarray(class_of, dtype=np.int32)
    accept8 = np.ascontiguousarray(accept, dtype=np.uint8)
    stream = np.ascontiguousarray(stream, dtype=np.uint8)
    counts = np.zeros(s, dtype=np.int64)
    mask = np.zeros(len(stream), dtype=np.uint8) if want_mask else None
    final = lib.dfa_scan(
        _ptr(table, ctypes.c_int32), _ptr(class_of, ctypes.c_int32),
        _ptr(accept8, ctypes.c_uint8), s,
        _ptr(stream, ctypes.c_uint8), len(stream), start,
        _ptr(counts, ctypes.c_int64),
        _ptr(mask, ctypes.c_uint8) if want_mask else None,
    )
    return counts, (mask.astype(bool) if want_mask else None), int(final)


def anchored_spans_native(
    table: np.ndarray,       # (256, S) int32, raw-byte indexed anchored DFA
    accept: np.ndarray,      # (S,) bool/uint8
    accept_eof: np.ndarray,  # (S,) bool/uint8
    start_state: int,
    dead: int,
    stream: np.ndarray,      # (len,) uint8
    starts: np.ndarray,      # sorted candidate start offsets
) -> np.ndarray:
    """Longest anchored match per start with non-overlap suppression;
    returns an (n, 2) int64 span array (the finditer forward stage)."""
    lib = _load()
    _, s = table.shape
    table = np.ascontiguousarray(table, dtype=np.int32)
    accept8 = np.ascontiguousarray(accept, dtype=np.uint8)
    eof8 = np.ascontiguousarray(accept_eof, dtype=np.uint8)
    stream = np.ascontiguousarray(stream, dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    cap = max(16, len(starts))
    while True:
        out = np.empty((cap, 2), dtype=np.int64)
        n = lib.anchored_spans(
            _ptr(table, ctypes.c_int32), _ptr(accept8, ctypes.c_uint8),
            _ptr(eof8, ctypes.c_uint8), int(start_state), int(dead), s,
            _ptr(stream, ctypes.c_uint8), len(stream),
            _ptr(starts, ctypes.c_int64), len(starts),
            _ptr(out, ctypes.c_int64), cap,
        )
        if n >= 0:
            return out[:n]
        cap *= 2  # unreachable in practice (spans <= starts), kept for safety


def nfa_match_positions_native(
    delta: np.ndarray,      # (C, S+1, K) int32
    class_of: np.ndarray,   # (256,) int32
    accept: np.ndarray,     # (S+1,) bool/uint8
    stream: np.ndarray,     # (len,) uint8
    active: np.ndarray | None = None,
    active_cap: int = 1024,
) -> np.ndarray:
    """Byte offsets where an accepting state is active (oracle timing:
    one char late, final-position accept dropped).  Returns int64 offsets."""
    lib = _load()
    c, s1, k = delta.shape
    s = s1 - 1
    delta = np.ascontiguousarray(delta, dtype=np.int32)
    class_of = np.ascontiguousarray(class_of, dtype=np.int32)
    accept8 = np.ascontiguousarray(accept, dtype=np.uint8)
    stream = np.ascontiguousarray(stream, dtype=np.uint8)
    if active is None:
        active = np.full(active_cap, s, dtype=np.int32)
        active[0] = 0
    active = np.ascontiguousarray(active, dtype=np.int32)
    cap = max(1024, len(stream) // 4)
    while True:
        out = np.empty(cap, dtype=np.int64)
        n = lib.nfa_match_positions(
            _ptr(delta, ctypes.c_int32), _ptr(class_of, ctypes.c_int32),
            _ptr(accept8, ctypes.c_uint8), s, k,
            _ptr(stream, ctypes.c_uint8), len(stream),
            _ptr(active, ctypes.c_int32), len(active),
            _ptr(out, ctypes.c_int64), cap,
        )
        if n == -2:
            raise RuntimeError("native nfa_match_positions: active-set "
                               "capacity exceeded")
        if n >= 0:
            return out[:n]
        cap = min(cap * 4, len(stream) + 1)
