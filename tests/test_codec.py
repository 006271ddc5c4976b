"""2-bit codec unit tests against brute-force reference semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from unikmer_tpu.ops import codec
from tests.conftest import random_dna

COMP = dict(zip("ACGT", "TGCA"))


def brute_encode(kmer: str) -> int:
    m = {"A": 0, "C": 1, "G": 2, "T": 3, "U": 3}
    code = 0
    for ch in kmer.upper():
        code = (code << 2) | m[ch]
    return code


def brute_revcomp(kmer: str) -> str:
    return "".join(COMP[c] for c in reversed(kmer.upper()))


def test_encode_known_values():
    # A=0 C=1 G=2 T=3, first base most significant
    assert codec.encode_kmer("A") == 0
    assert codec.encode_kmer("T") == 3
    assert codec.encode_kmer("AC") == 1
    assert codec.encode_kmer("CA") == 4
    assert codec.encode_kmer("acgt") == 0b00011011
    assert codec.encode_kmer("ACGU") == codec.encode_kmer("ACGT")


def test_encode_decode_roundtrip(rng):
    for k in [1, 2, 3, 7, 15, 16, 23, 31, 32]:
        for _ in range(20):
            kmer = random_dna(rng, k).decode()
            code = codec.encode_kmer(kmer)
            assert code == brute_encode(kmer)
            assert codec.decode_kmer(code, k) == kmer


def test_last_base_in_low_bits():
    # reference walks codes from the last base via code&3 (filter.go:185-198)
    code = codec.encode_kmer("ACGT")
    assert code & 3 == 3  # T
    assert (code >> 2) & 3 == 2  # G


def test_sorting_is_lexicographic(rng):
    k = 11
    kmers = sorted(random_dna(rng, k).decode() for _ in range(200))
    codes = [codec.encode_kmer(s) for s in kmers]
    assert codes == sorted(codes)


def test_max_code():
    assert codec.max_code(1) == 3
    assert codec.max_code(32) == (1 << 64) - 1
    with pytest.raises(ValueError):
        codec.decode_kmer(16, 2).encode()
        codec.decode_kmer(100, 3)  # 100 > 4^3-1


def test_revcomp_canonical(rng):
    for k in [1, 5, 16, 23, 31, 32]:
        kmers = [random_dna(rng, k).decode() for _ in range(50)]
        codes = np.array([codec.encode_kmer(s) for s in kmers], dtype=np.uint64)
        rc = np.asarray(codec.revcomp_code(jnp.asarray(codes), k))
        expect = np.array(
            [codec.encode_kmer(brute_revcomp(s)) for s in kmers], dtype=np.uint64
        )
        np.testing.assert_array_equal(rc, expect)
        canon = np.asarray(codec.canonical_code(jnp.asarray(codes), k))
        np.testing.assert_array_equal(canon, np.minimum(codes, expect))
        np.testing.assert_array_equal(codec.canonical_np(codes, k), canon)


def test_kmer_codes_windows(rng):
    k = 7
    seq = random_dna(rng, 100).decode()
    bases = codec.seq_to_bases(np.frombuffer(seq.encode(), np.uint8))
    codes = np.asarray(codec.kmer_codes(bases, k))
    for i in range(len(seq) - k + 1):
        assert codes[i] == brute_encode(seq[i : i + k]), i


def test_window_valid_masks_invalid_bases(rng):
    k = 5
    seq = "ACGTACGTNACGTACGT"  # N at index 8
    bases = codec.seq_to_bases(np.frombuffer(seq.encode(), np.uint8))
    valid = np.asarray(codec.window_valid(bases, k))
    n = len(seq)
    for i in range(n):
        if i > n - k:
            assert not valid[i]
        else:
            covers_n = i <= 8 < i + k
            assert valid[i] == (not covers_n), i


def test_bits_string():
    assert codec.bits_string(codec.encode_kmer("ACGT"), 4) == "00 01 10 11"


def test_window_valid_short_input_shape():
    # regression: len(bases) < k returned a (k-1)-element mask instead
    # of len(bases), breaking downstream jnp.where alignment
    import numpy as np

    from unikmer_tpu.ops.codec import window_valid

    for n, k in [(0, 8), (5, 8), (7, 8), (8, 8), (9, 8), (0, 1), (3, 1)]:
        m = np.asarray(window_valid(np.zeros(n, np.uint8), k))
        assert m.shape == (n,), (n, k, m.shape)
        assert m[: max(n - k + 1, 0)].all() and not m[max(n - k + 1, 0):].any()


def test_short_input_window_ops_no_crash():
    # regression: the doubling _shift_up helpers produced wrong-length
    # arrays when the shift exceeded the input length (inputs shorter
    # than k crashed nthash_windows/sketches with broadcast errors)
    import numpy as np

    from unikmer_tpu.ops.nthash import nthash_windows_np
    from unikmer_tpu.ops.sketch import minimizer_windows, syncmer_windows

    for n in (0, 1, 5, 24):
        bases = np.arange(n, dtype=np.uint8) % 4
        for k in (8, 32, 40):
            h = np.asarray(nthash_windows_np(bases, min(k, 64), True))
            assert h.shape == (n,)
            c, e = minimizer_windows(bases, k, 5)
            assert np.asarray(c).shape == (n,) and np.asarray(e).shape == (n,)
            c, e = syncmer_windows(bases, k, min(k, 16))
            assert np.asarray(c).shape == (n,)
