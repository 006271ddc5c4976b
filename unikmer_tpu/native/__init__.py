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
    """The loaded library, or None when unavailable (or disabled via
    UNIKMER_TPU_NO_NATIVE=1 — every caller has a numpy fallback)."""
    global _lib
    if os.environ.get("UNIKMER_TPU_NO_NATIVE") == "1":
        return None
    if _lib is not None:
        return _lib if _lib is not False else None
    stale = True
    if os.path.exists(_SO):
        so_m = os.path.getmtime(_SO)
        stale = any(
            os.path.getmtime(os.path.join(_DIR, f)) > so_m
            for f in ("unikit_native.cpp", "Makefile")
        )
    if stale and not _build() and not os.path.exists(_SO):
        _lib = False
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _lib = False
        return None
    try:
        _bind(lib)
    except AttributeError:
        # stale prebuilt .so loaded after a failed rebuild: it lacks a
        # newer symbol — honor the graceful-None contract so every
        # caller falls back to numpy instead of crashing (round-5
        # review)
        _lib = False
        return None
    _lib = lib
    return lib


def _bind(lib) -> None:
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
    lib.pack_bases_2bit_native.restype = None
    lib.pack_bases_2bit_native.argtypes = [
        u8p, ctypes.c_size_t, u8p, u8p, ctypes.c_int,
    ]
    lib.fastx_load.restype = ctypes.POINTER(FastxPackStruct)
    lib.fastx_load.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
    ]
    lib.fastx_pack_free.restype = None
    lib.fastx_pack_free.argtypes = [ctypes.POINTER(FastxPackStruct)]
    i64 = ctypes.c_int64
    lib.render_kmer_lines.restype = i64
    lib.render_kmer_lines.argtypes = [u64p, i64, ctypes.c_int32, u8p]
    lib.render_kmer_u64_lines.restype = i64
    lib.render_kmer_u64_lines.argtypes = [u64p, u64p, i64, ctypes.c_int32, u8p]
    lib.render_u64_lines.restype = i64
    lib.render_u64_lines.argtypes = [u64p, i64, u8p]
    lib.render_u64_pair_lines.restype = i64
    lib.render_u64_pair_lines.argtypes = [u64p, u64p, i64, u8p]
    lib.decode_codes_ascii.restype = None
    lib.decode_codes_ascii.argtypes = [u64p, i64, ctypes.c_int32, u8p]
    lib.pgz_indexed_isize.restype = i64
    lib.pgz_indexed_isize.argtypes = [u8p, i64]
    lib.unik_scan_blocks.restype = i64
    lib.unik_scan_blocks.argtypes = [u8p, i64]
    lib.unik_encode_sorted_blocks.restype = i64
    lib.unik_encode_sorted_blocks.argtypes = [
        u64p, ctypes.POINTER(ctypes.c_uint32), i64, i64, ctypes.c_int32,
        u8p, i64, ctypes.c_int32,
    ]
    i64p = ctypes.POINTER(i64)
    for name in ("set2_union_u64", "set2_inter_u64", "set2_diff_u64"):
        fn = getattr(lib, name)
        fn.restype = i64
        fn.argtypes = [u64p, i64, u64p, i64, u64p, ctypes.c_int32]
    lib.member_mask_sorted_u64.restype = None
    lib.member_mask_sorted_u64.argtypes = [
        u64p, i64, u64p, i64, u8p, i64p, ctypes.c_int32,
    ]
    lib.msd_partition_u64.restype = ctypes.c_int32
    lib.msd_partition_u64.argtypes = [
        u64p, i64, ctypes.c_int32, i64p, ctypes.c_int32,
    ]
    lib.radix_sort_u64.restype = ctypes.c_int32
    lib.radix_sort_u64.argtypes = [u64p, i64, ctypes.c_int32]
    lib.radix_sort_u64_u32.restype = ctypes.c_int32
    lib.radix_sort_u64_u32.argtypes = [
        u64p, ctypes.POINTER(ctypes.c_uint32), i64, ctypes.c_int32,
    ]
    lib.radix_sort_u64_u64.restype = ctypes.c_int32
    lib.radix_sort_u64_u64.argtypes = [u64p, u64p, i64, ctypes.c_int32]
    lib.unik_decode_sorted_blocks.restype = i64
    lib.unik_decode_sorted_blocks.argtypes = [
        u8p, i64, ctypes.c_int32, u64p,
        ctypes.POINTER(ctypes.c_uint32), i64, ctypes.c_int32,
    ]
    lib.pgz_inflate_parallel.restype = i64
    lib.pgz_inflate_parallel.argtypes = [u8p, i64, u8p, i64, ctypes.c_int32]
    lib.pgz_compress_member.restype = i64
    lib.pgz_compress_member.argtypes = [u8p, i64, ctypes.c_int32, u8p, i64]
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.parse_code_lines.restype = i64
    lib.parse_code_lines.argtypes = [
        u8p, i64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        u64p, u32p, i64,
    ]
    lib.encode_windows_u64.restype = i64
    lib.encode_windows_u64.argtypes = [
        u8p, i64, ctypes.c_int32, ctypes.c_int32, u64p, ctypes.c_int32,
    ]
    lib.nthash_windows_u64.restype = i64
    lib.nthash_windows_u64.argtypes = [
        u8p, i64, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint32, u64p,
        ctypes.c_int32,
    ]
    lib.scaled_max_hash_u64.restype = ctypes.c_uint64
    lib.scaled_max_hash_u64.argtypes = [ctypes.c_uint32]
    lib.minimizer_emit_u64.restype = i64
    lib.minimizer_emit_u64.argtypes = [
        u8p, i64, ctypes.c_int32, ctypes.c_int32, u64p,
    ]
    lib.syncmer_emit_u64.restype = i64
    lib.syncmer_emit_u64.argtypes = [
        u8p, i64, ctypes.c_int32, ctypes.c_int32, u64p,
    ]
    lib.syncmer_compat_emit_u64.restype = i64
    lib.syncmer_compat_emit_u64.argtypes = [
        u8p, i64, ctypes.c_int32, ctypes.c_int32, u64p,
    ]


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


def pack_bases_2bit(bases: np.ndarray, threads: int = 4):
    """(packed2 u8 ceil(n/4), validmask u8 ceil(n/8)) — the 2-bit
    device-ingress pack, bit-identical to the numpy formulation in
    models/count but multithreaded at memory bandwidth (the numpy
    version cost ~1 s per streamed 4x2^25 batch, round-5 phase
    profile).  None -> no native lib (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    b = np.ascontiguousarray(bases, np.uint8)
    n = len(b)
    packed2 = np.empty(-(-n // 4) if n else 0, np.uint8)
    validmask = np.empty(-(-n // 8) if n else 0, np.uint8)
    if n:
        lib.pack_bases_2bit_native(_u8p(b), n, _u8p(packed2),
                                   _u8p(validmask), threads)
    return packed2, validmask


def encode_windows(bases: np.ndarray, k: int,
                   canonical: bool) -> np.ndarray | None:
    """All valid k-mer window codes of a packed base buffer (0..3 valid,
    >=4 resets the window), in genome order — the host-count hot loop
    (native encode_windows_u64).  None -> no native lib (callers fall
    back to the device pipeline)."""
    lib = get_lib()
    if lib is None or not (1 <= k <= 32):
        return None
    bases = np.ascontiguousarray(bases, np.uint8)
    n = len(bases)
    if n == 0:
        return np.zeros(0, np.uint64)
    out = np.empty(n, np.uint64)
    m = lib.encode_windows_u64(
        _u8p(bases), n, k, 1 if canonical else 0, _u64p(out), _threads()
    )
    return out[:m]


def nthash_windows(bases: np.ndarray, k: int, canonical: bool,
                   scale: int = 1) -> np.ndarray | None:
    """ntHash v1 of all valid windows (genome order, invalid bases reset
    the window); scale>1 keeps hashes <= 2^64/scale (FracMinHash).
    None -> no native lib."""
    lib = get_lib()
    if lib is None or not (1 <= k <= 64):
        return None
    bases = np.ascontiguousarray(bases, np.uint8)
    n = len(bases)
    if n == 0:
        return np.zeros(0, np.uint64)
    out = np.empty(n, np.uint64)
    m = lib.nthash_windows_u64(
        _u8p(bases), n, k, 1 if canonical else 0,
        scale if scale > 1 else 1, _u64p(out), _threads()
    )
    if m * 2 < n:
        return out[:m].copy()  # scaled filter kept few: release the 8n buffer
    return out[:m]


def sketch_emit(bases: np.ndarray, k: int, w_or_s: int,
                kind: str) -> np.ndarray | None:
    """Linear minimizer/syncmer emission stream (host twins of
    ops/sketch.minimizer_windows / syncmer_windows; canonical ntHash).
    kind "syncmer_compat" selects the forensic reconstruction of the
    reference's actual closed-syncmer rule (docs/DIVERGENCES.md §2).
    None -> no native lib."""
    lib = get_lib()
    if lib is None or not (1 <= k <= 64):
        return None
    bases = np.ascontiguousarray(bases, np.uint8)
    n = len(bases)
    if n < k:
        return np.zeros(0, np.uint64)
    out = np.empty(n, np.uint64)
    fn = {
        "minimizer": lib.minimizer_emit_u64,
        "syncmer": lib.syncmer_emit_u64,
        "syncmer_compat": lib.syncmer_compat_emit_u64,
    }[kind]
    m = fn(_u8p(bases), n, k, w_or_s, _u64p(out))
    if m * 2 < n:
        return out[:m].copy()
    return out[:m]


def render_lines(codes: np.ndarray, k: int | None,
                 vals: np.ndarray | None = None) -> bytes | None:
    """Text lines for view/dump: '<kmer>\\n', '<kmer>\\t<val>\\n' (k set),
    or '<val>\\n' / '<a>\\t<b>\\n' (k None).  None -> numpy fallback."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(codes)
    if n == 0:
        return b""
    codes = np.ascontiguousarray(codes, np.uint64)
    if vals is not None:
        vals = np.ascontiguousarray(vals, np.uint64)
    if k is not None:
        if vals is None:
            out = np.empty(n * (k + 1), np.uint8)
            ln = lib.render_kmer_lines(_u64p(codes), n, k, _u8p(out))
        else:
            out = np.empty(n * (k + 22), np.uint8)
            ln = lib.render_kmer_u64_lines(_u64p(codes), _u64p(vals), n, k,
                                           _u8p(out))
    else:
        if vals is None:
            out = np.empty(n * 21, np.uint8)
            ln = lib.render_u64_lines(_u64p(codes), n, _u8p(out))
        else:
            out = np.empty(n * 42, np.uint8)
            ln = lib.render_u64_pair_lines(_u64p(codes), _u64p(vals), n,
                                           _u8p(out))
    return out[:ln].tobytes()


def decode_codes_ascii(codes: np.ndarray, k: int) -> np.ndarray | None:
    """(n, k) ASCII matrix of k-mer strings; None -> numpy fallback."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint64)
    out = np.empty((len(codes), k), np.uint8)
    lib.decode_codes_ascii(_u64p(codes), len(codes), k, _u8p(out))
    return out


def parse_code_lines(text: bytes, kmer_mode: bool, k: int, has_taxid: bool):
    """Bulk-parse '<token>[\\t<int>]' lines (dump hot loop).

    Returns (codes u64, taxids u32 or None), or None when the native
    library is unavailable, or an int byte-offset of the first malformed
    line (caller falls back to the per-line parser for exact errors).
    """
    lib = get_lib()
    if lib is None:
        return None
    inp = np.frombuffer(text, np.uint8)
    cap = text.count(b"\n") + 2
    codes = np.empty(cap, np.uint64)
    taxids = np.empty(cap if has_taxid else 1, np.uint32)
    n = lib.parse_code_lines(
        _u8p(inp), len(inp), 0 if kmer_mode else 1, k,
        1 if has_taxid else 0, _u64p(codes),
        taxids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap,
    )
    if n < 0:
        return int(-n - 1)  # byte offset of the offending line
    return codes[:n].copy(), (taxids[:n].copy() if has_taxid else None)


_THREADS_OVERRIDE = 0


def set_threads(n: int) -> None:
    """Cap native kernel threads (the CLI's -j flag — the reference's
    GOMAXPROCS analog, root.go:93-98)."""
    global _THREADS_OVERRIDE
    _THREADS_OVERRIDE = max(int(n), 0)


def _threads() -> int:
    if _THREADS_OVERRIDE > 0:
        return _THREADS_OVERRIDE
    return min(os.cpu_count() or 1, 8)


def set2_sorted(op: str, a: np.ndarray, b: np.ndarray,
                trim: bool = True) -> np.ndarray | None:
    """union/inter/diff of two sorted u64 arrays (duplicates collapsed),
    range-partitioned across threads; None without the native library.

    ``trim=False`` returns a view into the oversized output buffer —
    for short-lived intermediates (union trees) where the trim copy was
    measured at 2/3 of the whole merge cost."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.uint64)
    b = np.ascontiguousarray(b, np.uint64)
    out = np.empty(len(a) + len(b), np.uint64)
    fn = getattr(lib, f"set2_{op}_u64")
    n = fn(_u64p(a), len(a), _u64p(b), len(b), _u64p(out), _threads())
    return out[:n].copy() if trim else out[:n]


def sort_u64(arr: np.ndarray) -> np.ndarray | None:
    """New sorted array of uint64 via the parallel LSD radix kernel;
    None without the native library.  NOTE: for keys-only sorts prefer
    host_sort — numpy's default simd quicksort measures ~2x faster than
    this 4-thread radix; the radix wins only when co-sorting a value
    column (5x over argsort+gather)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.array(arr, dtype=np.uint64, copy=True, order="C")
    if lib.radix_sort_u64(_u64p(out), len(out), _threads()) != 0:
        return None  # scratch alloc failed: caller falls back to numpy
    return out


def sort_u64_kv(keys: np.ndarray, vals: np.ndarray):
    """(sorted_keys, co-sorted_vals) by stable parallel radix on keys
    (replaces argsort+gather; vals may be uint32 or uint64 — other
    dtypes round-trip through uint64).  None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    if len(keys) != len(vals):
        raise ValueError("keys and vals must have equal length")
    ks = np.array(keys, dtype=np.uint64, copy=True, order="C")
    if vals.dtype == np.uint32:
        vs = np.array(vals, dtype=np.uint32, copy=True, order="C")
        rc = lib.radix_sort_u64_u32(
            _u64p(ks), vs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(ks), _threads())
        return (ks, vs) if rc == 0 else None
    orig = vals.dtype
    vs = np.array(vals, dtype=np.uint64, copy=True, order="C")
    if lib.radix_sort_u64_u64(_u64p(ks), _u64p(vs), len(ks),
                              _threads()) != 0:
        return None
    return ks, (vs if orig == np.uint64 else vs.astype(orig))


# Below this element count the ctypes round-trip + copies don't pay for
# themselves and numpy's sort is effectively instant anyway.
_HOST_SORT_MIN = 1 << 15
# Above this, one parallel MSD-partition pass + per-bucket simd sorts
# (GIL released) beat single-thread np.sort.
_HOST_SORT_PARTITION_MIN = 1 << 23


def _partitioned_sort(codes: np.ndarray) -> np.ndarray | None:
    """Sorted copy via one native MSD pass on the top significant byte
    (256 value-range buckets) + numpy simd quicksort per bucket slice,
    4 slices concurrently (ndarray.sort releases the GIL).  None when
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    mx = int(codes.max()) if len(codes) else 0
    if mx == 0:
        return np.zeros_like(codes)
    shift = max((mx.bit_length() - 1) // 8, 0) * 8
    out = np.array(codes, dtype=np.uint64, copy=True, order="C")
    offsets = np.zeros(257, np.int64)
    rc = lib.msd_partition_u64(
        _u64p(out), len(out),
        shift, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _threads(),
    )
    if rc != 0:
        return None
    from concurrent.futures import ThreadPoolExecutor

    slices = [
        out[offsets[d]:offsets[d + 1]]
        for d in range(256)
        if offsets[d + 1] - offsets[d] > 1
    ]
    with ThreadPoolExecutor(max_workers=min(_threads(), 4)) as ex:
        list(ex.map(lambda s: s.sort(), slices))
    return out


def host_sort(codes: np.ndarray) -> np.ndarray:
    """Sorted copy of a uint64 array.  Keys-only sorting needs no
    stability, and numpy's default kind dispatches to the vectorized
    x86-simd-sort (~70 M u64/s here — 2x the 4-thread native radix and
    10x kind="stable").  Above _HOST_SORT_PARTITION_MIN a native MSD
    partition fans the simd sort out over threads (~2-3x again); the
    full native radix only pays when a value column must ride along
    (host_sort_kv)."""
    if codes.dtype == np.uint64 and len(codes) >= _HOST_SORT_PARTITION_MIN:
        out = _partitioned_sort(codes)
        if out is not None:
            return out
    return np.sort(codes)


def host_sort_kv(keys: np.ndarray, vals: np.ndarray):
    """(sorted_keys, co-sorted_vals), stable in keys — native radix when
    available, argsort+gather otherwise.  Never returns None."""
    if keys.dtype == np.uint64 and len(keys) >= _HOST_SORT_MIN:
        res = sort_u64_kv(keys, vals)
        if res is not None:
            return res
    order = np.argsort(keys, kind="stable")
    return keys[order], vals[order]


def host_argsort(keys: np.ndarray):
    """(sorted_keys, perm) with keys[perm] == sorted_keys, stable — for
    callers gathering several companion columns.  perm dtype varies
    (uint64 native / int64 numpy); both index numpy arrays fine."""
    if keys.dtype == np.uint64 and len(keys) >= _HOST_SORT_MIN:
        res = sort_u64_kv(keys, np.arange(len(keys), dtype=np.uint64))
        if res is not None:
            return res
    order = np.argsort(keys, kind="stable")
    return keys[order], order


def member_mask_sorted(ref: np.ndarray, queries: np.ndarray,
                       want_idx: bool = True):
    """(mask bool, idx i64) of each sorted query in sorted ref; parallel
    two-pointer join.  None without the native library."""
    lib = get_lib()
    if lib is None:
        return None
    ref = np.ascontiguousarray(ref, np.uint64)
    queries = np.ascontiguousarray(queries, np.uint64)
    mask = np.empty(len(queries), np.uint8)
    idx = np.zeros(len(queries), np.int64) if want_idx else None
    lib.member_mask_sorted_u64(
        _u64p(ref), len(ref), _u64p(queries), len(queries), _u8p(mask),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        if idx is not None else None,
        _threads(),
    )
    return mask.view(bool), idx


def pgz_compress_member(data, level: int) -> bytes | None:
    """One UK-indexed gzip member via libdeflate (~2-3x zlib deflate);
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    inp = np.frombuffer(data, np.uint8)
    out = np.empty(28 + len(data) + (len(data) >> 3) + 256, np.uint8)
    w = lib.pgz_compress_member(_u8p(inp), len(data), level, _u8p(out),
                                len(out))
    if w < 0:
        return None
    return out[:w].tobytes()


def pgz_inflate_all(raw, threads: int = 0) -> bytes | None:
    """Inflate a UK-indexed multi-member gzip buffer with concurrent
    per-member zlib streams (our ParallelGzipWriter tags every member
    with its compressed length; see io/pgzip.py).

    Returns the inflated bytes, or None when the native library is
    unavailable or the buffer is not fully indexed (caller streams it
    through the ordinary sequential gzip reader instead).
    """
    lib = get_lib()
    if lib is None or len(raw) == 0:
        return None
    inp = np.frombuffer(raw, np.uint8)
    total = lib.pgz_indexed_isize(_u8p(inp), len(raw))
    if total < 0:
        return None
    if threads <= 0:
        threads = min(os.cpu_count() or 1, 8)
    out = np.empty(int(total), np.uint8)
    got = lib.pgz_inflate_parallel(
        _u8p(inp), len(raw), _u8p(out), int(total), threads
    )
    if got != total:
        return None
    return out.tobytes()


def encode_sorted_blocks(codes: np.ndarray, taxids: np.ndarray | None,
                         taxid_w: int, block_elems: int,
                         threads: int = 0) -> bytes | None:
    """Concurrent encode of sorted codes (+ optional taxid column) into
    the full framed block region (io/unik.py, minor version >= 1).
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    codes = np.ascontiguousarray(codes, np.uint64)
    n = len(codes)
    if n == 0:
        return b""
    if taxid_w:
        taxids = np.ascontiguousarray(taxids, np.uint32)
    else:
        taxids = np.zeros(1, np.uint32)
    nblocks = (n + block_elems - 1) // block_elems
    worst = 2 * ((block_elems + 3) // 4) + (8 + taxid_w) * block_elems
    out = np.empty(nblocks * (8 + worst), np.uint8)
    if threads <= 0:
        threads = min(os.cpu_count() or 1, 8)
    w = lib.unik_encode_sorted_blocks(
        _u64p(codes),
        taxids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n, block_elems, taxid_w, _u8p(out), len(out), threads,
    )
    if w < 0:
        return None
    return out[:w].tobytes()


def decode_sorted_blocks(buf: bytes, taxid_w: int, threads: int = 0):
    """Concurrent decode of a full sorted .unik block region (minor
    version >= 1; see io/unik.py layout).

    Returns (codes u64, taxids u32 | None), or None when the native
    library is unavailable.  Raises ValueError on corrupt framing.
    """
    lib = get_lib()
    if lib is None:
        return None
    inp = np.frombuffer(buf, np.uint8)
    total = lib.unik_scan_blocks(_u8p(inp), len(buf))
    if total < 0:
        raise ValueError("truncated .unik block")
    if total == 0:
        return np.zeros(0, np.uint64), (
            np.zeros(0, np.uint32) if taxid_w else None
        )
    if threads <= 0:
        threads = min(os.cpu_count() or 1, 8)
    codes = np.empty(int(total), np.uint64)
    taxids = np.empty(int(total) if taxid_w else 1, np.uint32)
    got = lib.unik_decode_sorted_blocks(
        _u8p(inp), len(buf), taxid_w, _u64p(codes),
        taxids.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        int(total), threads,
    )
    if got != total:
        raise ValueError("truncated .unik block")
    return codes, (taxids if taxid_w else None)


def load_fastx_packed(path: str, k: int, circular: bool = False,
                      max_text: int = 0):
    """Fused native ingest: file -> inflate -> parse -> packed base codes.

    Returns (bases u8, starts i64, lengths i64, ids list[bytes]) in the
    exact io/fastx.pack_records layout, or None when the native library
    is unavailable OR the decompressed text exceeds ``max_text`` bytes
    (>0; caller falls back to the streaming Python reader).  Raises
    ValueError on malformed input (matching the Python reader's errors).
    """
    lib = get_lib()
    if lib is None:
        return None
    p = lib.fastx_load(path.encode(), k, 1 if circular else 0, max_text)
    try:
        s = p.contents
        if s.err == b"TOO_LARGE":
            return None
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
