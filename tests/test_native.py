"""Native (C++) codec equivalence vs the numpy reference implementation."""

import numpy as np
import pytest

from unikmer_tpu import native
from unikmer_tpu.io.varint import decode_gb64, delta_decode, delta_encode, encode_gb64


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


@pytest.mark.parametrize("n", [0, 1, 3, 4, 5, 1000, 4096])
def test_encode_deltas_matches_numpy(lib, rng, n):
    vals = np.sort(rng.integers(0, 1 << 62, size=n, dtype=np.uint64))
    prev = 0
    got = native.encode_deltas_gb64(vals, prev)
    want = encode_gb64(delta_encode(vals, prev))
    assert got == want


@pytest.mark.parametrize("n", [1, 5, 1000])
def test_decode_deltas_roundtrip(lib, rng, n):
    vals = np.sort(rng.integers(0, 1 << 62, size=n, dtype=np.uint64))
    prev = int(rng.integers(0, 100))
    vals += np.uint64(prev)
    buf = native.encode_deltas_gb64(vals, prev)
    out, consumed = native.decode_deltas_gb64(buf, n, prev)
    assert consumed == len(buf)
    np.testing.assert_array_equal(out, vals)
    # and numpy can decode native's bytes
    deltas, used = decode_gb64(buf, n)
    np.testing.assert_array_equal(delta_decode(deltas, prev), vals)


def test_decode_truncation_raises(lib, rng):
    vals = np.sort(rng.integers(0, 1 << 62, size=100, dtype=np.uint64))
    buf = native.encode_deltas_gb64(vals, 0)
    with pytest.raises(ValueError):
        native.decode_deltas_gb64(buf[: len(buf) // 2], 100, 0)


def test_map_bases_skip_ws(lib):
    out = native.map_bases_skip_ws(b"ACGT\nacgu\r\n NnT")
    np.testing.assert_array_equal(
        out, np.array([0, 1, 2, 3, 0, 1, 2, 3, 255, 255, 3], np.uint8)
    )
