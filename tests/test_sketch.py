"""Sketch kernels: property tests + reference fixture counts.

MG1655 k=31 fixtures (reference analysis/distance/README.md:5-10):
minimizer w=15 -> 549,963 and scaled s=15 -> 586,734 distinct — both
must match EXACTLY (they pin ntHash v1 bit-exactness and the window
machinery).  Closed syncmer intentionally follows Edgar's definition
(see docs/DIVERGENCES.md §2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from unikmer_tpu.io.fastx import Record, pack_files, pack_records
from unikmer_tpu.models.count import CountConfig, count_packed
from unikmer_tpu.ops import codec, sketch
from unikmer_tpu.ops.nthash import nthash_kmer, nthash_windows, scaled_max_hash
from tests.conftest import GENOMES, random_dna


def test_nthash_windows_match_single(rng):
    seq = random_dna(rng, 200)
    bases = codec.BASE_LUT[np.frombuffer(seq, np.uint8)]
    for k in (5, 21, 31, 51, 64):
        for canonical in (False, True):
            h = np.asarray(nthash_windows(jnp.asarray(bases), k, canonical))
            for i in range(0, len(seq) - k + 1, 17):
                want = nthash_kmer(seq[i : i + k], canonical)
                assert int(h[i]) == want, (k, canonical, i)


def test_nthash_canonical_strand_symmetry(rng):
    COMP = dict(zip("ACGT", "TGCA"))
    for k in (7, 33):
        s = random_dna(rng, k).decode()
        rc = "".join(COMP[c] for c in reversed(s))
        assert nthash_kmer(s, True) == nthash_kmer(rc, True)


def test_scaled_max_hash_go_float_semantics():
    # Go: uint64(float64(^uint64(0)) / float64(scale))
    assert scaled_max_hash(1) == (1 << 64) - 1
    assert scaled_max_hash(15) == int(np.float64(18446744073709551615.0) / 15.0)


def brute_minimizer_set(seq, k, w):
    bases = codec.BASE_LUT[np.frombuffer(seq, np.uint8)]
    h = np.asarray(nthash_windows(jnp.asarray(bases), k, True))
    n = len(seq) - k + 1
    vals = set()
    for i in range(n - w + 1):
        vals.add(int(h[i : i + w].min()))
    return vals


def test_minimizer_matches_bruteforce(rng):
    k, w = 9, 4
    seq = random_dna(rng, 500)
    codes = count_packed(
        pack_records([Record(b"s", b"s", seq)], k),
        CountConfig(k=k, minimizer_w=w),
    )
    assert set(int(c) for c in codes) == brute_minimizer_set(seq, k, w)


def test_minimizer_linear_density(rng):
    # position-change emission: expected density ~2/(w+1)
    k, w = 21, 10
    seq = random_dna(rng, 20000)
    bases = jnp.asarray(codec.BASE_LUT[np.frombuffer(seq, np.uint8)])
    codes, emit = sketch.minimizer_windows(bases, k, w)
    d = float(np.asarray(emit).sum()) / (len(seq) - k - w + 2)
    assert 0.1 < d < 0.3


def test_syncmer_edgar_property(rng):
    k, s = 15, 6
    seq = random_dna(rng, 2000)
    bases = jnp.asarray(codec.BASE_LUT[np.frombuffer(seq, np.uint8)])
    khash, emit = sketch.syncmer_windows(bases, k, s)
    shash = np.asarray(nthash_windows(bases, s, True))
    emit = np.asarray(emit)
    w = k - s + 1
    for i in np.flatnonzero(emit)[:100]:
        window = shash[i : i + w]
        am = int(np.argmin(window))
        assert am in (0, w - 1), i
    # and non-emitted valid kmers fail the boundary test
    kvalid = np.asarray(codec.window_valid(bases, k))
    for i in np.flatnonzero(kvalid[: len(emit)] & ~emit)[:100]:
        window = shash[i : i + w]
        am = int(np.argmin(window))
        assert am not in (0, w - 1), i


@pytest.mark.full
def test_fixture_minimizer_mg1655():
    packed = pack_files([GENOMES["mg1655"]], 31)
    codes = count_packed(packed, CountConfig(k=31, minimizer_w=15))
    assert len(codes) == 549_963


@pytest.mark.full
def test_fixture_scaled_mg1655():
    packed = pack_files([GENOMES["mg1655"]], 31)
    codes = count_packed(
        packed, CountConfig(k=31, canonical=True, hashed=True, scale=15)
    )
    assert len(codes) == 586_734


@pytest.mark.full
def test_syncmer_mg1655_edgar_count():
    # documented divergence: reference reports 446,227 (DIVERGENCES.md §2)
    packed = pack_files([GENOMES["mg1655"]], 31)
    codes = count_packed(packed, CountConfig(k=31, syncmer_s=16))
    assert len(codes) == 579_624


def test_syncmer_compat_degenerate_s_equals_k(rng):
    # s == k: every valid k-mer is a closed syncmer under any rule
    from unikmer_tpu import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    seq = random_dna(rng, 3000)
    bases = codec.BASE_LUT[np.frombuffer(seq, np.uint8)]
    compat = native.sketch_emit(bases, 21, 21, "syncmer_compat")
    allw = native.nthash_windows(bases, 21, True)
    assert np.array_equal(compat, allw)


def test_syncmer_compat_smoke(rng):
    # deterministic, emits a strict subset of window hashes, and the
    # forced-emission rule bounds consecutive selected positions by k-s
    from unikmer_tpu import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    k, s = 31, 16
    seq = random_dna(rng, 20000)
    bases = codec.BASE_LUT[np.frombuffer(seq, np.uint8)]
    compat = native.sketch_emit(bases, k, s, "syncmer_compat")
    again = native.sketch_emit(bases, k, s, "syncmer_compat")
    assert np.array_equal(compat, again)
    allw = native.nthash_windows(bases, k, True)
    assert 0 < len(compat) < len(allw)
    assert set(compat.tolist()) <= set(allw.tolist())
    # density: the forced emission every k-s=15 positions floors the
    # rate at ~1/15; window argmins roughly double it
    assert len(compat) / len(allw) > 1.0 / 15.0


@pytest.mark.full
def test_syncmer_mg1655_compat_count():
    # forensic reconstruction of the reference's closed-syncmer rule
    # (docs/DIVERGENCES.md §2): 447,951 distinct vs the published
    # 446,227 (analysis/distance/README.md:5-10) — +0.39% residual from
    # an unresolvable micro-detail (shenwei356/bio v0.13.3 source is
    # neither vendored nor fetchable)
    from unikmer_tpu.models.count_host import count_host

    packed = pack_files([GENOMES["mg1655"]], 31)
    codes = count_host(packed, 31, True, "distinct", True,
                       syncmer_s=16, syncmer_impl="compat")
    assert codes is not None
    assert len(codes) == 447_951


@pytest.mark.full
def test_fixture_linear_minimizer_amuc():
    # reference info table: count -k 23 -W 5 -H -K -l on A. muciniphila
    # yields Number=860,900 (README.md:198) — pins the position-change
    # emission rule of the minimizer stream
    from unikmer_tpu.models.count import count_linear

    packed = pack_files([GENOMES["amuc"]], 23)
    codes = count_linear(packed, CountConfig(k=23, minimizer_w=5))
    assert len(codes) == 860_900
