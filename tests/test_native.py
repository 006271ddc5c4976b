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


# ---------------------------------------------------------------------------
# Fused native FASTA/FASTQ loader (fastx_load)
# ---------------------------------------------------------------------------

import gzip

from unikmer_tpu.io import fastx


def _assert_load_parity(path, k, circular):
    want = fastx.pack_records(list(fastx.read_fastx(path)), k, circular)
    got = native.load_fastx_packed(path, k, circular)
    assert got is not None
    bases, starts, lengths, ids = got
    np.testing.assert_array_equal(bases, want.bases)
    np.testing.assert_array_equal(starts, want.starts)
    np.testing.assert_array_equal(lengths, want.lengths)
    kept = [r.id for r in fastx.read_fastx(path) if len(r.seq) >= k]
    assert ids == kept


def test_fastx_load_genome_parity(lib):
    path = "/root/reference/testdata/old/A.muciniphila-ATCC_BAA-835.fasta.gz"
    for k, circ in ((23, False), (31, True)):
        _assert_load_parity(path, k, circ)


def test_fastx_load_fastq_quirks(lib, tmp_path, rng):
    recs = []
    for i in range(500):
        L = int(rng.integers(3, 90))
        seq = "".join("ACGTN"[j] for j in rng.integers(0, 5, L))
        recs.append(f"@read{i} desc here\r\n{seq}\r\n+\r\n{'I' * L}\r\n")
    raw = "".join(recs).encode()
    plain = tmp_path / "t.fq"
    plain.write_bytes(raw)
    gz = tmp_path / "t.fq.gz"
    with gzip.open(gz, "wb") as f:
        f.write(raw)
    multi = tmp_path / "m.fq.gz"  # multi-member (our pgzip layout)
    with open(multi, "wb") as f:
        f.write(gzip.compress("".join(recs[:250]).encode()))
        f.write(gzip.compress("".join(recs[250:]).encode()))
    for p in (plain, gz, multi):
        _assert_load_parity(str(p), 7, False)


def test_fastx_load_fasta_edges(lib, tmp_path):
    fa = b">a desc\nACGTacgt\nNNGT\n\n>b\nAC\n>empty\n>c\nACGTACGTACGT\n"
    p = tmp_path / "e.fa"
    p.write_bytes(fa)
    for k in (3, 9):
        _assert_load_parity(str(p), k, False)
        _assert_load_parity(str(p), k, True)


def test_fastx_load_malformed(lib, tmp_path):
    p = tmp_path / "bad.txt"
    p.write_bytes(b"this is not fasta\n")
    with pytest.raises(ValueError):
        native.load_fastx_packed(str(p), 5, False)


def test_pack_files_native_path_matches(tmp_path):
    # pack_files must agree whether it takes the native or Python path
    fa = b">x\n" + b"ACGTTGCA" * 50 + b"\n>y\nACGTACGTACGTA\n"
    p = tmp_path / "x.fa"
    p.write_bytes(fa)
    want = fastx.pack_records(list(fastx.read_fastx(str(p))), 11, False)
    got = fastx.pack_files([str(p)], 11, False)
    np.testing.assert_array_equal(got.bases, want.bases)
    np.testing.assert_array_equal(got.starts, want.starts)


def test_count_stream_packed_equivalence(tmp_path, rng):
    from unikmer_tpu.models.count import (
        CountConfig, count_stream, count_stream_packed, split_packed,
    )

    recs = []
    for i in range(300):
        L = int(rng.integers(20, 200))
        seq = "".join("ACGT"[j] for j in rng.integers(0, 4, L))
        recs.append(f">r{i}\n{seq}\n")
    p = tmp_path / "s.fa"
    p.write_bytes("".join(recs).encode())
    records = list(fastx.read_fastx(str(p)))
    for mode in ("distinct", "unique", "repeated"):
        cfg = CountConfig(k=15, canonical=True, mode=mode)
        want = count_stream(iter(records), cfg, chunk_bases=4096)
        packed = fastx.pack_files([str(p)], 15, False)
        got = count_stream_packed([packed], cfg, chunk_bases=4096)
        np.testing.assert_array_equal(got, want)
    # split_packed re-chunks at record boundaries
    packed = fastx.pack_files([str(p)], 15, False)
    pieces = list(split_packed(packed, 2048))
    assert sum(pc.n_records for pc in pieces) == packed.n_records
    assert all(pc.n_records >= 1 for pc in pieces)


def test_count_stream_oversized_record(tmp_path, rng):
    """A single record far larger than the chunk is overlap-segmented
    (k-1 overlap = window-exact partition): distinct/unique/repeated all
    match the unchunked brute force, linear and circular."""
    from unikmer_tpu.models.count import (
        CountConfig, count_packed, count_stream, count_stream_packed,
        split_packed,
    )

    k = 13
    big = "".join("ACGT"[j] for j in rng.integers(0, 4, 40_000))
    small = "".join("ACGT"[j] for j in rng.integers(0, 4, 100))
    p = tmp_path / "big.fa"
    p.write_bytes(f">a\n{big}\n>b\n{small}\n".encode())
    records = list(fastx.read_fastx(str(p)))
    for circular in (False, True):
        for mode in ("distinct", "unique", "repeated"):
            cfg = CountConfig(k=k, canonical=True, mode=mode,
                              circular=circular)
            want = count_packed(
                fastx.pack_records(records, k, circular), cfg)
            got = count_stream(iter(records), cfg, chunk_bases=4096)
            np.testing.assert_array_equal(got, want)
            packed = fastx.pack_records(records, k, circular)
            got2 = count_stream_packed([packed], cfg, chunk_bases=4096)
            np.testing.assert_array_equal(got2, want)
    # every piece is bounded even though one record exceeds the chunk
    packed = fastx.pack_records(records, k, False)
    pieces = list(split_packed(packed, 4096, k))
    assert all(len(pc.bases) <= 4096 + k for pc in pieces)
    assert len(pieces) > 2


def test_linear_codes_all_chunked(tmp_path, rng):
    """Chunked linear codes == single-shot, order and positions exact."""
    from unikmer_tpu.models.count import CountConfig, linear_codes_all

    k = 11
    # embed invalid bases so validity masking crosses chunk boundaries
    seq = list("ACGT"[j] for j in rng.integers(0, 4, 20_000))
    for i in rng.integers(0, len(seq), 50):
        seq[int(i)] = "N"
    packed = fastx.pack_records(
        [fastx.Record(b"a", b"a", "".join(seq).encode())], k, False)
    for cfg in (
        CountConfig(k=k, canonical=True),
        CountConfig(k=k, canonical=True, hashed=True),
    ):
        want_c, want_p = linear_codes_all(packed.bases, cfg,
                                          chunk_bases=1 << 30)
        got_c, got_p = linear_codes_all(packed.bases, cfg,
                                        chunk_bases=3000)
        np.testing.assert_array_equal(got_c, want_c)
        np.testing.assert_array_equal(got_p, want_p)


def test_render_lines_matches_textout(lib, rng):
    from unikmer_tpu.ops.codec import decode_codes
    from unikmer_tpu.utils import textout

    for k in (1, 11, 23, 31):
        codes = rng.integers(0, 1 << (2 * k), 3000, dtype=np.uint64)
        tax = rng.integers(0, 1 << 32, 3000, dtype=np.uint64)
        arr = decode_codes(codes, k)
        assert native.render_lines(codes, k) == textout.lines_fixed(arr)
        assert native.render_lines(codes, k, tax) == textout.lines_fixed_plus_int(arr, tax)
        assert native.render_lines(codes, None) == textout.lines_fixed_plus_int(None, codes)
        assert native.render_lines(codes, None, tax) == textout.lines_two_ints(codes, tax)
        np.testing.assert_array_equal(native.decode_codes_ascii(codes, k), arr)
    edge = np.array([0, 1, (1 << 64) - 1], np.uint64)
    assert native.render_lines(edge, None) == b"0\n1\n18446744073709551615\n"


def test_fastx_load_size_cap_falls_back(lib, tmp_path):
    fa = b">x\n" + b"ACGT" * 300 + b"\n"
    p = tmp_path / "c.fa"
    p.write_bytes(fa)
    assert native.load_fastx_packed(str(p), 5, False, max_text=64) is None
    # pack_files still works (python fallback path)
    import unikmer_tpu.io.fastx as fx

    old = fx.NATIVE_INGEST_MAX
    fx.NATIVE_INGEST_MAX = 64
    try:
        got = fx.pack_files([str(p)], 5, False)
    finally:
        fx.NATIVE_INGEST_MAX = old
    want = fx.pack_records(list(fx.read_fastx(str(p))), 5, False)
    np.testing.assert_array_equal(got.bases, want.bases)


def test_parse_code_lines_overflow_and_ws(lib):
    # u64 overflow -> error offset (not silent wrap)
    r = native.parse_code_lines(b"18446744073709551616\n", False, 23, False)
    assert isinstance(r, int)
    r = native.parse_code_lines(b"18446744073709551615\n", False, 23, False)
    codes, _ = r
    assert codes[0] == (1 << 64) - 1
    # whitespace inside the token before a tab must NOT be trimmed
    r = native.parse_code_lines(b"ACGTA \t12\n", True, 5, True)
    assert isinstance(r, int)


# ---------------------------------------------------------------------
# Member-parallel gzip (UK-indexed members; io/pgzip.py writer,
# pgz_inflate_parallel reader)
# ---------------------------------------------------------------------


def test_pgz_indexed_roundtrip_and_interop(lib, rng):
    import gzip
    import io

    from unikmer_tpu.io.pgzip import ParallelGzipWriter

    data = rng.integers(0, 256, size=3_456_789, dtype=np.uint8).tobytes()
    buf = io.BytesIO()
    w = ParallelGzipWriter(buf, compresslevel=5, threads=3, chunk_size=1 << 19)
    for i in range(0, len(data), 100_003):
        w.write(data[i : i + 100_003])
    w.close()
    raw = buf.getvalue()
    # stock gzip readers see an ordinary multi-member stream
    assert gzip.decompress(raw) == data
    # the native reader splits on the FEXTRA index and inflates in parallel
    assert native.pgz_inflate_all(raw) == data
    assert native.pgz_inflate_all(raw, threads=1) == data
    # plain (un-indexed) gzip falls back to None
    assert native.pgz_inflate_all(gzip.compress(data[:100_000])) is None
    # truncated indexed stream: not silently accepted
    assert native.pgz_inflate_all(raw[:-3]) is None
    # one write far larger than the chunk (direct-slice fast path),
    # preceded by a partial buffer so the boundary-fill runs too
    buf2 = io.BytesIO()
    w2 = ParallelGzipWriter(buf2, compresslevel=1, threads=3,
                            chunk_size=1 << 18)
    w2.write(data[:1000])
    w2.write(data[1000:])
    w2.close()
    assert gzip.decompress(buf2.getvalue()) == data
    assert native.pgz_inflate_all(buf2.getvalue()) == data


def test_pgz_small_and_empty_members(lib):
    import gzip
    import io

    from unikmer_tpu.io.pgzip import ParallelGzipWriter

    buf = io.BytesIO()
    w = ParallelGzipWriter(buf, compresslevel=9, threads=2)
    w.write(b"x")
    w.close()
    raw = buf.getvalue()
    assert gzip.decompress(raw) == b"x"
    assert native.pgz_inflate_all(raw) == b"x"
    # empty writer emits nothing (header-less empty file, as before)
    bufe = io.BytesIO()
    ParallelGzipWriter(bufe).close()
    assert bufe.getvalue() == b""


# ---------------------------------------------------------------------
# Parallel sorted-block decode (.unik minor version 1)
# ---------------------------------------------------------------------


def test_unik_parallel_block_decode_roundtrip(lib, rng, tmp_path):
    from unikmer_tpu.io.unik import (
        CANONICAL,
        INCLUDE_TAXID,
        SORTED,
        UnikReader,
        UnikWriter,
    )

    codes = np.unique(rng.integers(0, 1 << 46, size=300_000, dtype=np.uint64))
    tax = rng.integers(1, 60_000, size=len(codes), dtype=np.uint32)
    p = tmp_path / "blk.unik"
    # small blocks force many independently-decoded segments
    with UnikWriter(
        str(p),
        k=23,
        flag=SORTED | CANONICAL | INCLUDE_TAXID,
        number=len(codes),
        max_taxid=60_000,
        block_size=1 << 12,
    ) as w:
        w.write_codes(codes, tax)
    r = UnikReader(str(p))
    assert r.header.minor_version >= 1
    c2, t2 = r.read_all()
    np.testing.assert_array_equal(c2, codes)
    np.testing.assert_array_equal(t2, tax)
    # iter_blocks (streaming path) agrees with the bulk path
    r2 = UnikReader(str(p))
    got = np.concatenate([c for c, _ in r2.iter_blocks()])
    np.testing.assert_array_equal(got, codes)


def test_unik_minor0_chained_deltas_still_read(lib, rng, tmp_path):
    """Files written before the minor-1 bump chain deltas across blocks."""
    import struct

    from unikmer_tpu.io import unik as U

    codes = np.unique(rng.integers(0, 1 << 40, size=50_000, dtype=np.uint64))
    p = tmp_path / "old.unik"
    with open(p, "wb") as f:
        f.write(
            struct.pack(
                U._HEADER_FMT, U.MAGIC, U.MAIN_VERSION, 0, 23, 0,
                U.SORTED | U.CANONICAL, 0, 1, len(codes),
            )
        )
        f.write(struct.pack("<H", 0))
        prev = 0
        for off in range(0, len(codes), 7_000):
            blk = codes[off : off + 7_000]
            payload = native.encode_deltas_gb64(blk, prev)
            prev = int(blk[-1])
            f.write(struct.pack("<II", len(blk), len(payload)))
            f.write(payload)
    r = U.UnikReader(str(p))
    assert r.header.minor_version == 0
    c2, _ = r.read_all()
    np.testing.assert_array_equal(c2, codes)


# ---------------------------------------------------------------------
# Parallel sorted-set kernels
# ---------------------------------------------------------------------


@pytest.mark.parametrize("na,nb", [(0, 0), (0, 5), (5, 0), (1, 1),
                                   (1000, 3), (200_000, 150_000)])
def test_set2_kernels_match_numpy(lib, rng, na, nb):
    a = np.sort(rng.integers(0, 300_000, size=na, dtype=np.uint64))
    b = np.sort(rng.integers(0, 300_000, size=nb, dtype=np.uint64))
    sa, sb = set(a.tolist()), set(b.tolist())
    np.testing.assert_array_equal(
        native.set2_sorted("union", a, b), np.fromiter(sorted(sa | sb), np.uint64)
    )
    np.testing.assert_array_equal(
        native.set2_sorted("inter", a, b), np.fromiter(sorted(sa & sb), np.uint64)
    )
    np.testing.assert_array_equal(
        native.set2_sorted("diff", a, b), np.fromiter(sorted(sa - sb), np.uint64)
    )


def test_member_mask_sorted_matches_numpy(lib, rng):
    ref = np.unique(rng.integers(0, 1 << 40, size=500_000, dtype=np.uint64))
    q = np.sort(
        np.concatenate([
            rng.choice(ref, 200_000),
            rng.integers(0, 1 << 40, size=200_000, dtype=np.uint64),
        ]).astype(np.uint64)
    )
    mask, idx = native.member_mask_sorted(ref, q)
    want = np.minimum(np.searchsorted(ref, q), len(ref) - 1)
    want_mask = ref[want] == q
    np.testing.assert_array_equal(mask, want_mask)
    np.testing.assert_array_equal(idx[mask], want[want_mask])


def test_sets_union_native_tree(rng):
    from unikmer_tpu.ops import sets

    arrays = [
        np.unique(rng.integers(0, 1 << 30, size=n, dtype=np.uint64))
        for n in (100_000, 70_000, 30_000, 1, 0)
    ]
    got, t = sets.union(arrays)
    assert t is None
    want = np.unique(np.concatenate(arrays))
    np.testing.assert_array_equal(got, want)


def test_radix_sort_matches_numpy(lib, rng):
    for n in (0, 1, 2, 1000, 300_000):
        a = rng.integers(0, 1 << 63, size=n, dtype=np.uint64)
        got = native.sort_u64(a)
        np.testing.assert_array_equal(got, np.sort(a))
        assert got is not a  # input untouched
    # small code space exercises the skipped-pass fast path
    a = rng.integers(0, 1 << 12, size=200_000, dtype=np.uint64)
    np.testing.assert_array_equal(native.sort_u64(a), np.sort(a))
    zeros = np.zeros(100_000, np.uint64)
    np.testing.assert_array_equal(native.sort_u64(zeros), zeros)
    # FULL-range keys (bit 63 set — hashed codes): regression for the
    # `mx >> 64` UB infinite loop in the bit-count
    a = rng.integers(0, 1 << 64, size=200_000, dtype=np.uint64)
    a[:3] = [0xFFFFFFFFFFFFFFFF, 1 << 63, 0]
    np.testing.assert_array_equal(native.sort_u64(a), np.sort(a))
    ks, vs = native.sort_u64_kv(a, np.arange(len(a), dtype=np.uint32))
    np.testing.assert_array_equal(ks, np.sort(a))


def test_radix_sort_kv_stable(lib, rng):
    n = 200_000
    keys = rng.integers(0, 1 << 10, size=n, dtype=np.uint64)  # many dups
    order = np.argsort(keys, kind="stable")
    for vals in (
        np.arange(n, dtype=np.uint32),
        rng.integers(0, 1 << 62, size=n, dtype=np.uint64),
        np.arange(n, dtype=np.int64),
    ):
        ks, vs = native.sort_u64_kv(keys, vals)
        np.testing.assert_array_equal(ks, keys[order])
        np.testing.assert_array_equal(vs, vals[order])
        assert vs.dtype == vals.dtype


def test_host_sort_wrappers(rng):
    # exercised with and without the native lib via the size threshold
    for n in (100, 100_000):
        keys = rng.integers(0, 1 << 40, size=n, dtype=np.uint64)
        tax = rng.integers(0, 1 << 20, size=n, dtype=np.uint32)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(native.host_sort(keys), np.sort(keys))
        ks, vs = native.host_sort_kv(keys, tax)
        np.testing.assert_array_equal(ks, keys[order])
        np.testing.assert_array_equal(vs, tax[order])
        ks, perm = native.host_argsort(keys)
        np.testing.assert_array_equal(ks, keys[order])
        np.testing.assert_array_equal(keys[perm], ks)
        np.testing.assert_array_equal(tax[np.asarray(perm)], tax[order])


def test_partitioned_host_sort(lib, rng):
    # exercises the MSD-partition + per-bucket simd path (>= 2^23)
    from unikmer_tpu.native import _partitioned_sort

    for hibits in (12, 46, 64):
        top = (1 << hibits) - 1 if hibits < 64 else (1 << 64) - 1
        a = rng.integers(0, top, size=(1 << 23) + 17, dtype=np.uint64)
        if hibits == 64:
            a[:4] = [0, 0xFFFFFFFFFFFFFFFF, 1 << 63, (1 << 63) - 1]
        got = _partitioned_sort(a)
        assert got is not None
        np.testing.assert_array_equal(got, np.sort(a))
        assert got is not a
    zeros = np.zeros((1 << 23), np.uint64)
    np.testing.assert_array_equal(native.host_sort(zeros), zeros)


def test_set_threads_plumbs_j_flag(rng):
    """-j caps native kernel threads (reference GOMAXPROCS analog,
    root.go:93-98); results are thread-count invariant."""
    import numpy as np

    from unikmer_tpu import native

    bases = rng.integers(0, 5, size=200_000).astype(np.uint8)
    try:
        native.set_threads(1)
        one = native.encode_windows(bases, 21, True)
        h1 = native.nthash_windows(bases, 21, True)
        native.set_threads(7)
        many = native.encode_windows(bases, 21, True)
        h7 = native.nthash_windows(bases, 21, True)
    finally:
        native.set_threads(0)
    assert one.tolist() == many.tolist()
    assert h1.tolist() == h7.tolist()


def test_scaled_max_hash_shared_across_engines(lib):
    """The FracMinHash threshold must be ONE constant path: Go computes
    uint64(float64(^uint64(0)) / float64(scale)) (count.go:98), which
    differs from integer division by up to a few hundred (scale=7: 146,
    scale=3: 341).  Device (ops.nthash.scaled_max_hash), host
    (models/count_host), and native (scaled_max_hash_u64) must agree on
    the float64 rule for every scale."""
    from unikmer_tpu.ops.nthash import scaled_max_hash

    # boundary-sensitive scales: powers of two (exact float division),
    # odd primes (float rounds below int division), and large scales
    for s in [1, 2, 3, 5, 7, 11, 15, 16, 100, 101, 8191, 1 << 20,
              (1 << 31) - 1, (1 << 32) - 1]:
        want = scaled_max_hash(s)
        assert lib.scaled_max_hash_u64(s) == want, s
        # pin the float64 semantics against a big-int oracle of Go's
        # rule: float64(2^64-1) == 2^64 exactly, then float divide
        assert want == int(np.float64(2.0**64) / np.float64(s)) or s == 1
    # the scale=7 gap that VERDICT r1 flagged: float64 rule is 146 BELOW
    # integer division; a hash in (float_thresh, int_thresh] must be
    # dropped by every engine
    assert scaled_max_hash(7) == 2635249153387078656
    assert (2**64 - 1) // 7 - scaled_max_hash(7) == 146


def test_scaled_filter_native_vs_python_threshold(lib, rng):
    """nthash_windows' in-kernel scaled filter == post-hoc python filter
    with scaled_max_hash on the same hashes."""
    from unikmer_tpu.ops.nthash import scaled_max_hash

    bases = rng.integers(0, 4, size=5000).astype(np.uint8)
    k = 31
    full = native.nthash_windows(bases, k, True, 1)
    for s in (3, 7, 15):
        got = native.nthash_windows(bases, k, True, s)
        want = full[full <= np.uint64(scaled_max_hash(s))]
        np.testing.assert_array_equal(got, want)


def test_pack_bases_2bit_native_parity(rng, monkeypatch):
    """Native 2-bit ingress pack must be bit-identical to the numpy
    formulation for every length class (thread-boundary tails
    included) and invalid-base pattern."""
    import unikmer_tpu.native as nat
    from unikmer_tpu.models.count import pack_bases_2bit

    if nat.get_lib() is None:
        pytest.skip("native lib unavailable")
    for n in (0, 1, 7, 8, 9, 1000, (1 << 20) + 3, (1 << 21) - 1):
        bases = rng.integers(0, 6, size=n, dtype=np.uint8)  # 4,5 invalid
        monkeypatch.setenv("UNIKMER_TPU_NO_NATIVE", "1")
        want = pack_bases_2bit(bases)
        monkeypatch.delenv("UNIKMER_TPU_NO_NATIVE")
        got = nat.pack_bases_2bit(bases)
        assert got is not None
        np.testing.assert_array_equal(got[0], want[0], err_msg=str(n))
        np.testing.assert_array_equal(got[1], want[1], err_msg=str(n))
