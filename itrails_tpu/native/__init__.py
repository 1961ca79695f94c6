"""Native (C++) host-side components, loaded via ctypes.

``maf_tokenizer``: streaming MAF block tokenizer (see maf_tokenizer.cpp).
The shared library is built on demand with g++ (cached next to the source);
all callers fall back to the pure-Python implementation in data/maf.py when
no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "maf_tokenizer.cpp")
_LIB = os.path.join(_HERE, "_maf_tokenizer.so")

_lib = None


def _ensure_built():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB)
    lib.maf_open.restype = ctypes.c_void_p
    lib.maf_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p]
    lib.maf_next_block.restype = ctypes.c_int64
    lib.maf_next_block.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.maf_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _ensure_built()
        return True
    except Exception:
        return False


def maf_tokens_native(path, species, ref=None, max_block=1 << 24):
    """Streaming tokenization of a MAF file (native).  Yields per-block
    int32 token arrays; with ``ref`` also yields (tokens, coords) pairs."""
    lib = _ensure_built()
    handle = lib.maf_open(
        str(path).encode(), ",".join(species).encode(),
        (ref or "").encode(),
    )
    if not handle:
        raise FileNotFoundError(path)
    tokens = np.empty(max_block, dtype=np.int32)
    coords = np.empty(max_block, dtype=np.int64) if ref else None
    t_ptr = tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    c_ptr = (
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        if ref
        else ctypes.POINTER(ctypes.c_int64)()
    )
    try:
        while True:
            n = lib.maf_next_block(handle, t_ptr, max_block, c_ptr)
            if n == 0:
                return
            if n == -2:
                raise MemoryError("MAF block exceeds max_block columns")
            if n < 0:
                raise RuntimeError("MAF parse error")
            if ref:
                yield tokens[:n].copy(), coords[:n].copy()
            else:
                yield tokens[:n].copy()
    finally:
        lib.maf_close(handle)


# ---- Viterbi backtrack walker (backtrack.cpp) ------------------------------

_BT_SRC = os.path.join(_HERE, "backtrack.cpp")
_BT_LIB = os.path.join(_HERE, "_backtrack.so")

_bt_lib = None


def _ensure_backtrack_built():
    global _bt_lib
    if _bt_lib is not None:
        return _bt_lib
    if (not os.path.exists(_BT_LIB)
            or os.path.getmtime(_BT_LIB) < os.path.getmtime(_BT_SRC)):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _BT_SRC,
               "-o", _BT_LIB]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(_BT_LIB)
    lib.viterbi_backtrack.restype = None
    lib.viterbi_backtrack.argtypes = [
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _bt_lib = lib
    return lib


def backtrack_available() -> bool:
    try:
        _ensure_backtrack_built()
        return True
    except Exception:
        return False


def viterbi_backtrack_native(ptrs, state) -> np.ndarray:
    """Walk a C-contiguous (n, M) int32 backpointer table from ``state``
    (the state at position n); returns the (n,) int32 state path."""
    lib = _ensure_backtrack_built()
    ptrs = np.ascontiguousarray(ptrs, dtype=np.int32)
    n, m = ptrs.shape
    path = np.empty(n, dtype=np.int32)
    lib.viterbi_backtrack(
        ptrs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(n),
        ctypes.c_int64(m),
        ctypes.c_int32(int(state)),
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return path
