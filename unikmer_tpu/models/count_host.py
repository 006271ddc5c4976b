"""Host-native count engine — no jax import.

The reference's headline benchmark is a single-genome `count`
(README.md:156-158, 0.897 s): end-to-end latency there is dominated by
interpreter + framework startup and device dispatch, not compute.  For
small inputs the CLI routes here instead of the device pipeline: the
C++ rolling window encoder (native/unikit_native.cpp
encode_windows_u64, ~380 M codes/s on 4 vCPUs) feeds the SIMD host
sort, so `count` never pays the jax import (~3 s) or the TPU dispatch
latency.  Window semantics are IDENTICAL to the device pipeline
(models/count.window_codes; reference sketches NewKmerIterator,
count.go:314-367) and differentially tested against it
(tests/test_count_host.py).

The device pipeline (models/count.py) stays the primary engine for
large batches, hashed/scaled/sketched modes, and anything taxid-aware.
"""

from __future__ import annotations

import numpy as np

from .. import native


def supported(k: int, hashed: bool, scale: int, minimizer_w: int,
              syncmer_s: int) -> bool:
    """Host engine scope: 2-bit encode (k <= 32) or ntHash (k <= 64,
    incl. scaled MinHash); sketches (minimizer/syncmer) stay on the
    device pipeline."""
    if minimizer_w > 0 or syncmer_s > 0 or native.get_lib() is None:
        return False
    if hashed:
        return 1 <= k <= 64
    return 1 <= k <= 32 and scale <= 1


def _windows(packed, k, canonical, hashed, scale):
    if hashed:
        return native.nthash_windows(packed.bases, k, canonical, scale)
    return native.encode_windows(packed.bases, k, canonical)


def linear_host(packed, k: int, canonical: bool, hashed: bool = False,
                scale: int = 1) -> np.ndarray | None:
    """count -l: all valid window codes/hashes in genome order,
    duplicates kept.  None when the native library is unavailable."""
    return _windows(packed, k, canonical, hashed, scale)


def count_host(packed, k: int, canonical: bool, mode: str = "distinct",
               hashed: bool = False, scale: int = 1) -> np.ndarray | None:
    """count: sorted distinct/unique/repeated canonical codes (the
    device pipeline also emits sorted order — docs/DIVERGENCES.md §3).
    None when the native library is unavailable."""
    codes = _windows(packed, k, canonical, hashed, scale)
    if codes is None:
        return None
    if len(codes) == 0:
        return codes
    codes = native.host_sort(codes)
    first = np.ones(len(codes), bool)
    first[1:] = codes[1:] != codes[:-1]
    if mode == "distinct":
        return codes[first]
    starts = np.flatnonzero(first)
    counts = np.diff(np.append(starts, len(codes)))
    if mode == "unique":
        return codes[starts[counts == 1]]
    if mode == "repeated":
        return codes[starts[counts >= 2]]
    raise ValueError(f"unknown mode: {mode}")


def _valid_window_positions(bases: np.ndarray, k: int) -> np.ndarray:
    """Start positions of all-valid windows — the positions the native
    window kernels emit for, in the same order."""
    n = len(bases)
    if n < k:
        return np.zeros(0, np.int64)
    bad = (np.asarray(bases) >= 4).astype(np.int64)
    c = np.concatenate([np.zeros(1, np.int64), np.cumsum(bad)])
    return np.flatnonzero(c[k:] - c[:-k] == 0)


def linear_windows_host(bases: np.ndarray, k: int, canonical: bool,
                        hashed: bool = False):
    """(codes, start_positions) of every valid window, genome order —
    the jax-free twin of models.count.linear_codes_all.  None when the
    native library is unavailable."""
    if hashed:
        codes = native.nthash_windows(bases, k, canonical)
    else:
        if not 1 <= k <= 32:
            return None
        codes = native.encode_windows(bases, k, canonical)
    if codes is None:
        return None
    pos = _valid_window_positions(bases, k)
    assert len(pos) == len(codes), (len(pos), len(codes))
    return codes, pos
