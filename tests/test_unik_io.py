"""Round-trip tests for the .unik serialization and varint-GB codec."""

import io

import numpy as np
import pytest

from unikmer_tpu.io import unik
from unikmer_tpu.io.varint import (
    decode_gb64,
    delta_decode,
    delta_encode,
    encode_gb64,
)


def rand_u64(rng, n, bits=64):
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64)
    hi = rng.integers(0, 1 << max(bits - 32, 1), size=n, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo if bits > 32 else lo


@pytest.mark.parametrize("n", [0, 1, 3, 4, 5, 1000])
def test_gb64_roundtrip(rng, n):
    vals = rand_u64(rng, n)
    buf = encode_gb64(vals)
    out, used = decode_gb64(buf, n)
    assert used == len(buf)
    np.testing.assert_array_equal(out, vals)


def test_gb64_small_values_compress(rng):
    vals = rng.integers(0, 200, size=1000, dtype=np.uint64)
    buf = encode_gb64(vals)
    assert len(buf) <= 1000 + 2 * 250  # 1 byte/value + ctrl


def test_delta_roundtrip(rng):
    vals = np.sort(rand_u64(rng, 5000))
    d = delta_encode(vals, 0)
    np.testing.assert_array_equal(delta_decode(d, 0), vals)
    # split at arbitrary point with carried prev
    d1 = delta_encode(vals[:100], 0)
    d2 = delta_encode(vals[100:], int(vals[99]))
    out = np.concatenate([delta_decode(d1, 0), delta_decode(d2, int(vals[99]))])
    np.testing.assert_array_equal(out, vals)


def roundtrip(codes, taxids=None, **kw):
    buf = io.BytesIO()
    with unik.UnikWriter(buf, **kw) as w:
        w.write_codes(codes, taxids)
    buf.seek(0)
    r = unik.UnikReader(io.BufferedReader(io.BytesIO(buf.getvalue())))
    out = r.read_all()
    return r.header, out


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize(
    "flag", [0, unik.CANONICAL, unik.COMPACT | unik.CANONICAL, unik.HASHED]
)
def test_unik_plain_roundtrip(rng, compress, flag):
    k = 23
    bits = 64 if flag & unik.HASHED else 2 * k
    codes = rand_u64(rng, 5000, bits)
    hdr, (out, taxids) = roundtrip(codes, k=k, flag=flag, compress=compress)
    np.testing.assert_array_equal(out, codes)
    assert taxids is None
    assert hdr.k == k and hdr.flag == flag
    assert hdr.number == -1


def test_unik_sorted_roundtrip(rng):
    k = 23
    codes = np.sort(rand_u64(rng, 20000, 2 * k))
    hdr, (out, _) = roundtrip(
        codes, k=k, flag=unik.SORTED | unik.CANONICAL, number=len(codes)
    )
    np.testing.assert_array_equal(out, codes)
    assert hdr.is_sorted and hdr.number == 20000


def test_unik_sorted_is_much_smaller(rng):
    k = 23
    # dense set: deltas fit in 1-2 bytes like real genome k-mer sets
    codes = np.sort(
        rng.choice(1 << 24, size=100_000, replace=False).astype(np.uint64)
    )
    plain = io.BytesIO()
    with unik.UnikWriter(plain, k=k, flag=0) as w:
        w.write_codes(codes)
    srt = io.BytesIO()
    with unik.UnikWriter(srt, k=k, flag=unik.SORTED) as w:
        w.write_codes(codes)
    # reference's real-data ratio is ~0.63 (17 MB sorted vs 27 MB plain,
    # README.md:251-263); ours lands ~0.58 on this synthetic set
    assert len(srt.getvalue()) < 0.7 * len(plain.getvalue())


@pytest.mark.parametrize("max_taxid", [200, 70000, 2**31])
def test_unik_taxid_roundtrip(rng, max_taxid):
    k = 15
    codes = np.sort(rand_u64(rng, 3000, 2 * k))
    taxids = rng.integers(1, max_taxid, size=3000, dtype=np.uint32)
    hdr, (out, tax) = roundtrip(
        codes,
        taxids,
        k=k,
        flag=unik.SORTED | unik.INCLUDE_TAXID,
        max_taxid=max_taxid,
    )
    np.testing.assert_array_equal(out, codes)
    np.testing.assert_array_equal(tax, taxids)
    assert hdr.taxid_bytes == unik.taxid_width(max_taxid)


def test_unik_global_taxid_and_scale():
    buf = io.BytesIO()
    with unik.UnikWriter(
        buf, k=31, flag=unik.HASHED, global_taxid=511145, scale=15
    ) as w:
        w.write_codes(np.array([5, 9], np.uint64))
    r = unik.UnikReader(io.BufferedReader(io.BytesIO(buf.getvalue())))
    h = r.header
    assert h.global_taxid == 511145 and h.scale == 15
    assert h.is_scaled and h.has_global_taxid and h.has_taxid_info
    assert not h.is_include_taxid


def test_unik_empty_file_forced_header():
    # diff writes a header even for empty outputs (diff.go:193-195)
    buf = io.BytesIO()
    unik.UnikWriter(buf, k=23, flag=unik.SORTED, number=0).close()
    r = unik.UnikReader(io.BufferedReader(io.BytesIO(buf.getvalue())))
    codes, _ = r.read_all()
    assert len(codes) == 0 and r.header.k == 23


def test_unik_description_limit():
    buf = io.BytesIO()
    with pytest.raises(ValueError):
        unik.UnikWriter(buf, k=5, description=b"x" * 2000)


def test_check_compatibility(rng):
    h1 = unik.UnikHeader(k=23, flag=unik.CANONICAL)
    h2 = unik.UnikHeader(k=23, flag=unik.CANONICAL | unik.SORTED)
    unik.check_compatibility(h1, h2)  # sorted may differ
    with pytest.raises(ValueError):
        unik.check_compatibility(h1, unik.UnikHeader(k=25, flag=unik.CANONICAL))
    with pytest.raises(ValueError):
        unik.check_compatibility(h1, unik.UnikHeader(k=23, flag=unik.HASHED))


def test_multi_block_stream(rng):
    codes = np.sort(rand_u64(rng, 10_000, 40))
    buf = io.BytesIO()
    with unik.UnikWriter(buf, k=20, flag=unik.SORTED, block_size=777) as w:
        for off in range(0, len(codes), 2500):
            w.write_codes(codes[off : off + 2500])
    r = unik.UnikReader(io.BufferedReader(io.BytesIO(buf.getvalue())))
    out, _ = r.read_all()
    np.testing.assert_array_equal(out, codes)


def test_reader_stream_mode_equivalent(tmp_path, rng):
    # stream=True must bypass the whole-file parallel inflate (memory-
    # bounded k-way merge) yet read identical content on UK-indexed
    # multi-member gzip files above the 1 MB inflate floor
    path = str(tmp_path / "big.unik")
    codes = np.sort(rng.integers(0, 1 << 46, size=400_000, dtype=np.uint64))
    with unik.UnikWriter(path, k=23, flag=unik.SORTED, number=len(codes),
                         threads=4) as w:
        w.write_codes(codes)
    import os
    assert os.path.getsize(path) >= (1 << 20)
    with unik.UnikReader(path) as r1:
        c1, _ = r1.read_all()
    with unik.UnikReader(path, stream=True) as r2:
        blocks = [c for c, _ in r2.iter_blocks()]
        # UK-indexed files must take the member-at-a-time libdeflate path
        assert isinstance(r2._file.raw, unik._UKMemberStream)
    np.testing.assert_array_equal(c1, codes)
    np.testing.assert_array_equal(np.concatenate(blocks), codes)


def test_reader_stream_mode_foreign_gzip(tmp_path, rng):
    # a plain (non-UK-indexed) gzip outer stream must fall back to the
    # sequential zlib reader in stream mode and read identical content
    import gzip as _gzip

    codes = np.sort(rng.integers(0, 1 << 40, size=50_000, dtype=np.uint64))
    buf = io.BytesIO()
    with unik.UnikWriter(buf, k=20, flag=unik.SORTED, compress=False) as w:
        w.write_codes(codes)
    path = str(tmp_path / "foreign.unik")
    with open(path, "wb") as f:
        f.write(_gzip.compress(buf.getvalue(), 1))
    for stream in (False, True):
        with unik.UnikReader(path, stream=stream) as r:
            out, _ = r.read_all()
        np.testing.assert_array_equal(out, codes)


def test_member_stream_mixed_members(tmp_path, rng):
    # UK members followed by a foreign member: the member stream must
    # switch to zlib push-back mid-file without losing a byte
    import gzip as _gzip

    from unikmer_tpu.io.pgzip import ParallelGzipWriter

    payload = rng.integers(0, 256, size=3_000_000, dtype=np.uint8).tobytes()
    path = str(tmp_path / "mixed.gz")
    with open(path, "wb") as f:
        w = ParallelGzipWriter(f, compresslevel=1, threads=2)
        w.write(payload[:2_500_000])
        w.close()
        f.write(_gzip.compress(payload[2_500_000:], 1))
    with open(path, "rb") as f:
        br = io.BufferedReader(f)
        assert unik._UKMemberStream.sniff(br)
        ms = io.BufferedReader(unik._UKMemberStream(br), 1 << 20)
        got = ms.read()
    assert got == payload


def test_package_version_constants_track_io():
    import unikmer_tpu
    from unikmer_tpu.io import unik

    assert unikmer_tpu.UNIK_MAIN_VERSION == unik.MAIN_VERSION
    assert unikmer_tpu.UNIK_MINOR_VERSION == unik.MINOR_VERSION


def test_writer_flushes_handed_stream_uncompressed(tmp_path, rng):
    # regression: with compress=False and a caller-owned stream, close()
    # left the payload in the stream's buffer (truncated file until GC)
    import numpy as np

    from unikmer_tpu.io.unik import UnikReader, UnikWriter

    codes = np.unique(rng.integers(0, 1 << 40, size=5000, dtype=np.uint64))
    p = tmp_path / "x.unik"
    f = open(p, "wb")
    try:
        w = UnikWriter(f, k=21, compress=False, number=len(codes))
        w.write_codes(codes)
        w.close()
        # stream intentionally NOT closed: bytes must already be on disk
        with UnikReader(p) as r:
            got = np.concatenate([c for c, _ in r.iter_blocks()])
        assert got.tolist() == codes.tolist()
    finally:
        f.close()
