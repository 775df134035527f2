"""ctypes bindings for the native IO runtime (native/eigenlstm_io.cpp).

Auto-builds the shared library on first use if a compiler is available;
every entry point has a pure-Python fallback so the package works without
the native layer (it is an accelerator, not a dependency).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libeigenlstm_io.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "eigenlstm_io.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    c_i64, c_i32, c_u8, c_f64, c_f32 = (
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_uint8,
        ctypes.c_double,
        ctypes.c_float,
    )
    P = ctypes.POINTER
    lib.elio_file_size.restype = c_i64
    lib.elio_file_size.argtypes = [ctypes.c_char_p]
    lib.elio_read_file.restype = c_i64
    lib.elio_read_file.argtypes = [ctypes.c_char_p, P(c_u8), c_i64]
    lib.elio_build_windows.restype = ctypes.c_int
    lib.elio_build_windows.argtypes = [
        P(c_u8), c_i64, P(c_i32), c_i32, c_i32, P(c_i32), P(c_i32),
    ]
    lib.elio_advance_positions.restype = None
    lib.elio_advance_positions.argtypes = [
        P(c_i32), c_i32, c_i32, c_i64, c_i32, P(c_u8),
    ]
    lib.elio_one_hot.restype = None
    lib.elio_one_hot.argtypes = [P(c_i32), c_i32, c_i32, c_i32, P(c_f32)]
    lib.elio_parse_floats.restype = c_i64
    lib.elio_parse_floats.argtypes = [ctypes.c_char_p, P(c_f64), c_i64]
    lib.elio_write_matrix.restype = ctypes.c_int
    lib.elio_write_matrix.argtypes = [ctypes.c_char_p, P(c_f64), c_i64, c_i64]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def read_file(path: str) -> np.ndarray:
    """Native rawread; falls back to Python file IO."""
    lib = get_lib()
    if lib is None:
        with open(path, "rb") as f:
            return np.frombuffer(f.read(), np.uint8)
    size = lib.elio_file_size(path.encode())
    if size < 0:
        raise FileNotFoundError(path)
    if size == 0:
        raise ValueError(f"empty corpus: {path}")
    buf = np.empty(size, np.uint8)
    got = lib.elio_read_file(path.encode(), _ptr(buf, ctypes.c_uint8), size)
    if got != size:
        raise IOError(f"short read on {path}: {got}/{size}")
    return buf


def build_windows(
    corpus: np.ndarray, positions: np.ndarray, seq: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (S, B) window build; native when available."""
    batch = len(positions)
    lib = get_lib()
    if lib is None:
        offs = np.arange(seq + 1)
        idx = positions[None, :] + offs[:, None]
        win = corpus[idx].astype(np.int32)
        return np.ascontiguousarray(win[:-1]), np.ascontiguousarray(win[1:])
    corpus = np.ascontiguousarray(corpus, np.uint8)
    positions = np.ascontiguousarray(positions, np.int32)
    x = np.empty((seq, batch), np.int32)
    t = np.empty((seq, batch), np.int32)
    rc = lib.elio_build_windows(
        _ptr(corpus, ctypes.c_uint8),
        len(corpus),
        _ptr(positions, ctypes.c_int32),
        batch,
        seq,
        _ptr(x, ctypes.c_int32),
        _ptr(t, ctypes.c_int32),
    )
    if rc != 0:
        raise ValueError("position out of range for window build")
    return x, t


def advance_positions(
    positions: np.ndarray, stride: int, corpus_len: int, seq: int
) -> Tuple[np.ndarray, np.ndarray]:
    """In-place-style cursor advance; returns (new_positions, wrapped)."""
    lib = get_lib()
    pos = np.ascontiguousarray(positions, np.int32).copy()
    if lib is None:
        limit = max(corpus_len - seq - 1, 1)
        nxt = pos.astype(np.int64) + stride
        wrapped = nxt > limit
        nxt = np.where(wrapped, nxt % limit, nxt)
        return nxt.astype(np.int32), wrapped
    wrapped = np.empty(len(pos), np.uint8)
    lib.elio_advance_positions(
        _ptr(pos, ctypes.c_int32),
        len(pos),
        stride,
        corpus_len,
        seq,
        _ptr(wrapped, ctypes.c_uint8),
    )
    return pos, wrapped.astype(bool)


def parse_floats(path: str, expected: int) -> np.ndarray:
    """Fast parse of a reference text matrix file; falls back to loadtxt."""
    lib = get_lib()
    if lib is None:
        return np.loadtxt(path, dtype=np.float64).reshape(-1)
    out = np.empty(expected, np.float64)
    n = lib.elio_parse_floats(path.encode(), _ptr(out, ctypes.c_double), expected)
    if n == -1:
        raise FileNotFoundError(path)
    if n < 0:
        raise ValueError(f"{path}: more than {expected} values")
    return out[:n]


def write_matrix(path: str, mat: np.ndarray) -> None:
    lib = get_lib()
    mat2 = np.ascontiguousarray(np.atleast_2d(mat), np.float64)
    if lib is None:
        np.savetxt(path, mat2, fmt="%.10g")
        return
    rc = lib.elio_write_matrix(
        path.encode(), _ptr(mat2, ctypes.c_double), mat2.shape[0], mat2.shape[1]
    )
    if rc != 0:
        raise IOError(f"failed to write {path}")
