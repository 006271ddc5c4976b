"""ctypes bindings for the native host codecs (libunikit_native.so).

The library is built lazily on first import (g++, no external deps);
every entry point has a pure-numpy fallback in io/varint.py, so the
package works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libunikit_native.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib():
    """The loaded library, or None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib if _lib is not False else None
    if not os.path.exists(_SO) and not _build():
        _lib = False
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib = False
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.gb64_encode.restype = ctypes.c_size_t
    lib.gb64_encode.argtypes = [u64p, ctypes.c_size_t, u8p, ctypes.c_size_t]
    lib.gb64_decode.restype = ctypes.c_size_t
    lib.gb64_decode.argtypes = [u8p, ctypes.c_size_t, ctypes.c_size_t, u64p]
    lib.gb64_encode_deltas.restype = ctypes.c_size_t
    lib.gb64_encode_deltas.argtypes = [
        u64p, ctypes.c_size_t, ctypes.c_uint64, u8p, ctypes.c_size_t,
    ]
    lib.gb64_decode_deltas.restype = ctypes.c_size_t
    lib.gb64_decode_deltas.argtypes = [
        u8p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_uint64, u64p,
    ]
    lib.map_bases.restype = None
    lib.map_bases.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.map_bases_skip_ws.restype = ctypes.c_size_t
    lib.map_bases_skip_ws.argtypes = [u8p, ctypes.c_size_t, u8p]
    _lib = lib
    return lib


def _u64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


_FAIL = (1 << 64) - 1 if ctypes.sizeof(ctypes.c_size_t) == 8 else (1 << 32) - 1


def encode_deltas_gb64(vals: np.ndarray, prev: int) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return b""
    cap = 2 * ((n + 3) // 4) + 8 * n
    out = np.empty(cap, np.uint8)
    written = lib.gb64_encode_deltas(_u64p(vals), n, prev, _u8p(out), cap)
    if written == _FAIL:
        return None
    return out[:written].tobytes()


def decode_deltas_gb64(buf: bytes, n: int, prev: int):
    """(values, consumed) or None on fallback."""
    lib = get_lib()
    if lib is None:
        return None
    if n == 0:
        return np.zeros(0, np.uint64), 0
    inp = np.frombuffer(buf, np.uint8)
    out = np.empty(n, np.uint64)
    consumed = lib.gb64_decode_deltas(_u8p(inp), len(inp), n, prev, _u64p(out))
    if consumed == _FAIL:
        raise ValueError("truncated varint-GB block")
    return out, int(consumed)


def map_bases_skip_ws(seq: bytes) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    inp = np.frombuffer(seq, np.uint8)
    out = np.empty(len(inp), np.uint8)
    n = lib.map_bases_skip_ws(_u8p(inp), len(inp), _u8p(out))
    return out[:n]
