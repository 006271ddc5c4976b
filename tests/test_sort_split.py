"""Split 2-key (hi, lo) device sort: exactness vs the plain u64 path.

The TPU default routes collapse_sorted's sort through a variadic
(hi, lo) num_keys=2 sort (ops/sort._sort_u64_split) because XLA's TPU
sort is HBM-bandwidth-bound and narrower operands are directly faster
(docs/BENCH_NOTES.md round-2).  These tests pin bit-exactness of both
widths on CPU; the on-chip exactness run is scripts/exp_sort_split_chip.py.
"""

import collections

import numpy as np
import pytest

from unikmer_tpu.ops.codec import CODE_SENTINEL
from unikmer_tpu.ops.sort import _sort_u64_split, _split_width, collapse_sorted


def test_raw_split32_full_u64(rng):
    a = rng.integers(0, 1 << 64, size=4096, dtype=np.uint64)
    a[:7] = np.uint64(CODE_SENTINEL)
    np.testing.assert_array_equal(np.asarray(_sort_u64_split(a, 32)), np.sort(a))


def test_raw_split16_46bit_domain(rng):
    # codes < 2^47 plus the all-ones sentinel: the u16 hi key's domain
    a = rng.integers(0, 1 << 46, size=4096, dtype=np.uint64)
    mask = rng.random(4096) < 0.2
    a[mask] = np.uint64(CODE_SENTINEL)
    np.testing.assert_array_equal(np.asarray(_sort_u64_split(a, 16)), np.sort(a))


@pytest.mark.parametrize("mode", ["distinct", "unique", "repeated"])
@pytest.mark.parametrize("split,code_bits", [(32, 64), (16, 46)])
def test_collapse_split_matches_plain(rng, mode, split, code_bits):
    for _ in range(4):
        n = int(rng.integers(1, 3000))
        hi = (1 << code_bits) - 1
        codes = rng.integers(0, hi, size=n, dtype=np.uint64)
        if code_bits == 64:  # exercise real sentinel collisions
            codes[rng.random(n) < 0.01] = np.uint64(CODE_SENTINEL)
        valid = rng.random(n) < 0.8
        ref_out, ref_n = collapse_sorted(codes, valid, mode=mode,
                                         code_bits=code_bits, split=0)
        out, cnt = collapse_sorted(codes, valid, mode=mode,
                                   code_bits=code_bits, split=split)
        assert int(cnt) == int(ref_n)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
        # and against the host oracle
        counter = collections.Counter(codes[valid].tolist())
        if mode == "distinct":
            want = sorted(counter)
        elif mode == "unique":
            want = sorted(c for c, m in counter.items() if m == 1)
        else:
            want = sorted(c for c, m in counter.items() if m > 1)
        assert np.asarray(out)[: int(cnt)].tolist() == want


def test_split_width_routing(monkeypatch):
    # forced widths; 16 demotes to 32 outside its domain
    assert _split_width(46, 16) == 16
    assert _split_width(64, 16) == 32
    assert _split_width(48, 16) == 32
    assert _split_width(64, 32) == 32
    assert _split_width(46, 0) == 0
    # env routing: off / forced / auto (auto is TPU-only, so off on CPU)
    monkeypatch.setenv("UNIKMER_TPU_SORT_SPLIT", "0")
    assert _split_width(46, None) == 0
    monkeypatch.setenv("UNIKMER_TPU_SORT_SPLIT", "16")
    assert _split_width(46, None) == 16
    assert _split_width(64, None) == 32
    monkeypatch.setenv("UNIKMER_TPU_SORT_SPLIT", "32")
    assert _split_width(46, None) == 32
    monkeypatch.delenv("UNIKMER_TPU_SORT_SPLIT")
    import jax

    expected = 16 if jax.default_backend() == "tpu" else 0
    assert _split_width(46, None) == expected
