"""ctypes bindings for the native data-path components.

Builds libfastparse.so from fastparse.cpp on first use (cached next to the
source); falls back gracefully when no compiler is available — callers
check `available()` and use the pure-Python parser otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastparse.cpp")
_SO = os.path.join(_DIR, "libfastparse.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=600)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.clsr_vocab_new.restype = ctypes.c_void_p
        lib.clsr_vocab_new.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32), ctypes.c_int64]
        lib.clsr_vocab_free.argtypes = [ctypes.c_void_p]
        lib.clsr_parse_file.restype = ctypes.c_void_p
        lib.clsr_parse_file.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_double]
        lib.clsr_result_n.restype = ctypes.c_int64
        lib.clsr_result_n.argtypes = [ctypes.c_void_p]
        lib.clsr_result_total.restype = ctypes.c_int64
        lib.clsr_result_total.argtypes = [ctypes.c_void_p]
        f32 = np.ctypeslib.ndpointer(np.float32)
        i32 = np.ctypeslib.ndpointer(np.int32)
        i64 = np.ctypeslib.ndpointer(np.int64)
        f64 = np.ctypeslib.ndpointer(np.float64)
        lib.clsr_result_fill.argtypes = [
            ctypes.c_void_p, f32, i32, i32, i32, f64, i64, i32, i32,
            f32, f32, f32]
        lib.clsr_result_free.argtypes = [ctypes.c_void_p]
        i8 = np.ctypeslib.ndpointer(np.int8)
        lib.clsr_expand_lines.restype = ctypes.c_int64
        lib.clsr_expand_lines.argtypes = [
            i64, i64, i64, i64, i8, i64, ctypes.c_int64, f64,
            ctypes.c_int64, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativeVocab:
    """A C++-side string->id map built once from a Python Vocab."""

    def __init__(self, mapping: dict):
        lib = _load()
        if lib is None:
            raise RuntimeError("native parser unavailable")
        keys = list(mapping.keys())
        blob = "\n".join(keys).encode("utf-8")
        ids = np.asarray([mapping[k] for k in keys], dtype=np.int32)
        self._lib = lib
        self._ptr = lib.clsr_vocab_new(blob, len(blob), ids, len(keys))

    def __del__(self):
        if getattr(self, "_ptr", None):
            self._lib.clsr_vocab_free(self._ptr)
            self._ptr = None


def parse_file_native(path: str, user_vocab: NativeVocab,
                      item_vocab: NativeVocab, cate_vocab: NativeVocab,
                      time_range: float):
    """Parse and return the raw packed arrays (same layout as
    parser.ParsedDataset fields)."""
    lib = _load()
    res = lib.clsr_parse_file(path.encode(), user_vocab._ptr,
                              item_vocab._ptr, cate_vocab._ptr, time_range)
    if not res:
        raise IOError(f"native parse failed for {path}")
    try:
        n = lib.clsr_result_n(res)
        total = lib.clsr_result_total(res)
        labels = np.empty(n, np.float32)
        users = np.empty(n, np.int32)
        items = np.empty(n, np.int32)
        cates = np.empty(n, np.int32)
        times = np.empty(n, np.float64)
        offsets = np.empty(n + 1, np.int64)
        hist_items = np.empty(total, np.int32)
        hist_cates = np.empty(total, np.int32)
        td = np.empty(total, np.float32)
        tff = np.empty(total, np.float32)
        ttn = np.empty(total, np.float32)
        lib.clsr_result_fill(res, labels, users, items, cates, times,
                             offsets, hist_items, hist_cates, td, tff, ttn)
    finally:
        lib.clsr_result_free(res)
    return (labels, users, items, cates, times, offsets, hist_items,
            hist_cates, td, tff, ttn)


def expand_lines_native(users, items, cates, times, split_idx, offsets,
                        subsample3, min_sequence: int, seed: int,
                        train_path: str, valid_path: str,
                        test_path: str) -> int:
    """Expanding-history TSV generation in C++ (numeric-id datasets).

    All arrays contiguous: users/items/cates/times int64 [n], split_idx
    int8 [n] (0 train / 1 valid / 2 test), offsets int64 [n_groups+1],
    subsample3 float64 [3].  Returns lines written; raises on I/O error.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = lib.clsr_expand_lines(
        np.ascontiguousarray(users, np.int64),
        np.ascontiguousarray(items, np.int64),
        np.ascontiguousarray(cates, np.int64),
        np.ascontiguousarray(times, np.int64),
        np.ascontiguousarray(split_idx, np.int8),
        np.ascontiguousarray(offsets, np.int64),
        len(offsets) - 1,
        np.ascontiguousarray(subsample3, np.float64),
        min_sequence, seed,
        train_path.encode(), valid_path.encode(), test_path.encode())
    if n < 0:
        raise IOError("native expand_lines failed (I/O error)")
    return int(n)
