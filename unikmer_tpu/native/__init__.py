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
    lib.fastx_load.restype = ctypes.POINTER(FastxPackStruct)
    lib.fastx_load.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32]
    lib.fastx_pack_free.restype = None
    lib.fastx_pack_free.argtypes = [ctypes.POINTER(FastxPackStruct)]
    _lib = lib
    return lib


class FastxPackStruct(ctypes.Structure):
    _fields_ = [
        ("bases", ctypes.POINTER(ctypes.c_uint8)),
        ("n_bases", ctypes.c_int64),
        ("starts", ctypes.POINTER(ctypes.c_int64)),
        ("lengths", ctypes.POINTER(ctypes.c_int64)),
        ("n_records", ctypes.c_int64),
        ("ids", ctypes.POINTER(ctypes.c_uint8)),
        ("id_offs", ctypes.POINTER(ctypes.c_int64)),
        ("fastq", ctypes.c_int32),
        ("err", ctypes.c_char * 256),
    ]


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


def load_fastx_packed(path: str, k: int, circular: bool = False):
    """Fused native ingest: file -> inflate -> parse -> packed base codes.

    Returns (bases u8, starts i64, lengths i64, ids list[bytes]) in the
    exact io/fastx.pack_records layout, or None when the native library
    is unavailable (caller falls back to the Python reader).  Raises
    ValueError on malformed input (matching the Python reader's errors).
    """
    lib = get_lib()
    if lib is None:
        return None
    p = lib.fastx_load(path.encode(), k, 1 if circular else 0)
    try:
        s = p.contents
        if s.err and s.err != b"":
            raise ValueError(f"{path}: {s.err.decode()}")
        n = int(s.n_records)
        if n == 0:
            return (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                    np.zeros(0, np.int64), [])
        bases = np.ctypeslib.as_array(s.bases, (int(s.n_bases),)).copy()
        starts = np.ctypeslib.as_array(s.starts, (n,)).copy()
        lengths = np.ctypeslib.as_array(s.lengths, (n,)).copy()
        offs = np.ctypeslib.as_array(s.id_offs, (n + 1,))
        blob = (
            np.ctypeslib.as_array(s.ids, (int(offs[-1]),)).tobytes()
            if int(offs[-1]) else b""
        )
        ids = [blob[offs[i]:offs[i + 1]] for i in range(n)]
        return bases, starts, lengths, ids
    finally:
        lib.fastx_pack_free(p)
