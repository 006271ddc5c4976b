"""Count pipeline parity vs a brute-force Python implementation, plus the
reference's full-genome conformance fixtures (marked full)."""

import collections

import os

import numpy as np
import pytest

from unikmer_tpu.io.fastx import Record, pack_records, pack_files
from unikmer_tpu.models.count import CountConfig, count_packed, count_linear
from unikmer_tpu.ops import codec
from tests.conftest import (
    FIXTURE_COUNTS_K23_CANONICAL,
    GENOMES,
    random_dna,
)

COMP = dict(zip("ACGT", "TGCA"))


def brute_kmers(seqs, k, canonical=False, circular=False):
    out = []
    for s in seqs:
        s = s.upper()
        if len(s) < k:
            continue
        ss = s + s[: k - 1] if circular else s
        for i in range(len(ss) - k + 1):
            km = ss[i : i + k]
            if any(c not in "ACGT" for c in km):
                continue
            if canonical:
                rc = "".join(COMP[c] for c in reversed(km))
                km = min(km, rc)
            out.append(km)
    return out


def run_count(seqs, k, mode="distinct", canonical=False, circular=False):
    recs = [Record(b"s%d" % i, b"s%d" % i, s.encode()) for i, s in enumerate(seqs)]
    packed = pack_records(recs, k, circular)
    cfg = CountConfig(k=k, canonical=canonical, circular=circular, mode=mode)
    return count_packed(packed, cfg)


@pytest.mark.parametrize("canonical", [False, True])
@pytest.mark.parametrize("k", [5, 23, 31])
def test_distinct_matches_bruteforce(rng, k, canonical):
    seqs = [random_dna(rng, n, p_invalid=0.02).decode() for n in (300, 50, k, k - 1)]
    got = run_count(seqs, k, canonical=canonical)
    want = sorted({codec.encode_kmer(s) for s in brute_kmers(seqs, k, canonical)})
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))


def test_unique_and_repeated(rng):
    k = 9
    seqs = [random_dna(rng, 400).decode() for _ in range(3)]
    seqs.append(seqs[0][:100])  # force repeats
    counts = collections.Counter(
        codec.encode_kmer(s) for s in brute_kmers(seqs, k, canonical=True)
    )
    uniq = run_count(seqs, k, mode="unique", canonical=True)
    rep = run_count(seqs, k, mode="repeated", canonical=True)
    np.testing.assert_array_equal(
        uniq, np.array(sorted(c for c, n in counts.items() if n == 1), np.uint64)
    )
    np.testing.assert_array_equal(
        rep, np.array(sorted(c for c, n in counts.items() if n > 1), np.uint64)
    )


def test_circular_wraparound(rng):
    k = 7
    seqs = [random_dna(rng, 60).decode()]
    got = run_count(seqs, k, circular=True)
    want = sorted({codec.encode_kmer(s) for s in brute_kmers(seqs, k, circular=True)})
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))


def test_linear_keeps_order_and_dups(rng):
    k = 5
    seqs = [random_dna(rng, 100).decode(), random_dna(rng, 40).decode()]
    got = count_linear(
        pack_records(
            [Record(b"a", b"a", seqs[0].encode()), Record(b"b", b"b", seqs[1].encode())],
            k,
        ),
        CountConfig(k=k, canonical=False),
    )
    want = np.array(
        [codec.encode_kmer(s) for s in brute_kmers(seqs, k)], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.full
@pytest.mark.parametrize("name", ["amuc", "mg1655", "iai39"])
def test_fixture_counts_k23(name):
    packed = pack_files([GENOMES[name]], 23)
    codes = count_packed(packed, CountConfig(k=23, canonical=True))
    assert len(codes) == FIXTURE_COUNTS_K23_CANONICAL[name]


@pytest.mark.full
def test_fixture_first_kmers_mg1655():
    # README view output of the sorted MG1655 k=23 file (README.md:176-180)
    packed = pack_files([GENOMES["mg1655"]], 23)
    codes = count_packed(packed, CountConfig(k=23, canonical=True))
    first = [codec.decode_kmer(int(c), 23) for c in codes[:3]]
    assert first == [
        "AAAAAAAAACCATCCAAATCTGG",
        "AAAAAAAAACCGCTAGTATATTC",
        "AAAAAAAAACCTGAAAAAAACGG",
    ]


def test_count_stream_chunked_matches_oneshot(rng):
    from unikmer_tpu.models.count import count_stream

    k = 9
    seqs = [random_dna(rng, n).decode() for n in (500, 700, 300, 900)]
    recs = [Record(b"s%d" % i, b"s%d" % i, s.encode()) for i, s in enumerate(seqs)]
    cfg = CountConfig(k=k, canonical=True)
    oneshot = count_packed(pack_records(recs, k), cfg)
    chunked = count_stream(iter(recs), cfg, chunk_bases=600)  # forces ~4 chunks
    np.testing.assert_array_equal(chunked, oneshot)
    # unique/repeated fall back to exact one-shot
    rep = count_stream(iter(recs + recs[:1]), CountConfig(k=k, mode="repeated"),
                       chunk_bases=600)
    want = run_count(seqs + seqs[:1], k, mode="repeated")
    np.testing.assert_array_equal(rep, want)


def test_stream_pipeline_depth_equivalence(rng, monkeypatch):
    """The double-buffered streaming loops (dispatch N, fetch N-depth)
    must be exact at every depth, for every mode, incl. linear order."""
    from unikmer_tpu.models.count import (
        count_stream, count_stream_packed, linear_codes_all,
    )

    k = 11
    seqs = [random_dna(rng, n).decode() for n in (800, 400, 1200, 700)]
    seqs.append(seqs[0][:500])  # cross-chunk duplicates
    recs = [Record(b"s%d" % i, b"s%d" % i, s.encode())
            for i, s in enumerate(seqs)]
    packed = pack_records(recs, k)
    base = {}
    for mode in ("distinct", "unique", "repeated"):
        cfg = CountConfig(k=k, canonical=True, mode=mode)
        base[mode] = count_stream_packed([packed], cfg, chunk_bases=512)
    lin_cfg = CountConfig(k=k, canonical=True)
    base["lin"] = linear_codes_all(packed.bases, lin_cfg, chunk_bases=512)
    for depth in ("1", "3"):
        monkeypatch.setenv("UNIKMER_TPU_PIPELINE_DEPTH", depth)
        for mode in ("distinct", "unique", "repeated"):
            cfg = CountConfig(k=k, canonical=True, mode=mode)
            np.testing.assert_array_equal(
                count_stream_packed([packed], cfg, chunk_bases=512),
                base[mode])
            np.testing.assert_array_equal(
                count_stream(iter(recs), cfg, chunk_bases=512), base[mode])
        c, p = linear_codes_all(packed.bases, lin_cfg, chunk_bases=512)
        np.testing.assert_array_equal(c, base["lin"][0])
        np.testing.assert_array_equal(p, base["lin"][1])


def test_collapse_sorted_dual_matches_pair(rng):
    """collapse_sorted_dual == (collapse_sorted distinct, repeated) on
    random data incl. sentinel-valued real codes and invalid slots."""
    import jax.numpy as jnp

    from unikmer_tpu.ops.sort import collapse_sorted, collapse_sorted_dual

    SENT = np.uint64(0xFFFFFFFFFFFFFFFF)
    for trial in range(4):
        n = 512
        codes = rng.integers(0, 40, n).astype(np.uint64)
        codes[rng.random(n) < 0.02] = SENT  # real sentinel codes
        valid = rng.random(n) < 0.8
        c, v = jnp.asarray(codes), jnp.asarray(valid)
        wd, nd = collapse_sorted(c, v, mode="distinct")
        wr, nr = collapse_sorted(c, v, mode="repeated")
        gd, gnd, gr, gnr = collapse_sorted_dual(c, v)
        assert int(gnd) == int(nd) and int(gnr) == int(nr), trial
        np.testing.assert_array_equal(
            np.asarray(gd)[: int(nd)], np.asarray(wd)[: int(nd)])
        np.testing.assert_array_equal(
            np.asarray(gr)[: int(nr)], np.asarray(wr)[: int(nr)])


def test_stream_multi_bucket_equivalence(rng, monkeypatch):
    """Multi-bucket grouped dispatch (UNIKMER_TPU_MULTI_BUCKET: B
    equal-padded pieces per program, lax.map-sequenced) must be exact
    for every mode and any group size, incl. leftover partial groups."""
    from unikmer_tpu.models.count import count_stream, count_stream_packed

    k = 11
    seqs = [random_dna(rng, n).decode() for n in (900, 500, 1100, 650, 780)]
    seqs.append(seqs[0][:400])  # cross-chunk duplicates
    recs = [Record(b"s%d" % i, b"s%d" % i, s.encode())
            for i, s in enumerate(seqs)]
    packed = pack_records(recs, k)
    for mode in ("distinct", "unique", "repeated"):
        cfg = CountConfig(k=k, canonical=True, mode=mode)
        monkeypatch.setenv("UNIKMER_TPU_MULTI_BUCKET", "1")
        monkeypatch.setenv("UNIKMER_TPU_DUAL_STEP", "0")
        want = count_stream_packed([packed], cfg, chunk_bases=512)
        for b in ("1", "2", "3"):
            for dual in ("0", "1"):
                monkeypatch.setenv("UNIKMER_TPU_MULTI_BUCKET", b)
                monkeypatch.setenv("UNIKMER_TPU_DUAL_STEP", dual)
                np.testing.assert_array_equal(
                    count_stream_packed([packed], cfg, chunk_bases=512),
                    want, err_msg=f"B={b} dual={dual} mode={mode}")
                np.testing.assert_array_equal(
                    count_stream(iter(recs), cfg, chunk_bases=512), want,
                    err_msg=f"B={b} dual={dual} mode={mode} (records)")


def test_compressed_result_fetch_roundtrip(rng):
    """u16-delta + exception packing must reconstruct codes exactly,
    including sparse sets with many >=2^16 deltas."""
    from unikmer_tpu.models.count import (
        CountConfig,
        _count_step_packed_result,
        _decode_packed_result,
        count_step,
        pad_bases,
    )

    for nbases, k in ((5000, 9), (3000, 23)):  # dense 9-mers, sparse 23-mers
        seqs = [random_dna(rng, nbases).decode()]
        recs = [Record(b"s", b"s", seqs[0].encode())]
        packed = pack_records(recs, k)
        cfg = CountConfig(k=k, canonical=True)
        bases = pad_bases(packed.bases)
        want_out, want_n = count_step(bases, cfg)
        want = np.asarray(want_out[: int(want_n)])
        got = _decode_packed_result(*_count_step_packed_result(bases, cfg))
        np.testing.assert_array_equal(got, want)


def test_pack2bit_roundtrip_and_count(rng):
    from unikmer_tpu.models.count import (
        CountConfig, _count_step_packed2_result, _decode_packed_result,
        count_step, pack_bases_2bit, pad_bases, unpack_bases_2bit,
    )

    bases = rng.integers(0, 4, 5000, dtype=np.uint8)
    bases[rng.choice(5000, 100, replace=False)] = 255  # invalid slots
    padded = pad_bases(bases)
    p2, vm = pack_bases_2bit(padded)
    back = np.asarray(unpack_bases_2bit(p2, vm, len(padded)))
    np.testing.assert_array_equal(back, padded)

    cfg = CountConfig(k=13, canonical=True)
    want_out, want_n = count_step(padded, cfg)
    res = _count_step_packed2_result(p2, vm, cfg, len(padded))
    got = _decode_packed_result(*res)
    np.testing.assert_array_equal(got, np.asarray(want_out[: int(want_n)]))

    # the raw-result packed-ingress program (device chunked-from_fasta
    # path) must match the plain program exactly
    from unikmer_tpu.models.count import _count_step_packed2_raw

    raw_out, raw_n = _count_step_packed2_raw(p2, vm, cfg, len(padded))
    assert int(raw_n) == int(want_n)
    np.testing.assert_array_equal(
        np.asarray(raw_out[: int(raw_n)]),
        np.asarray(want_out[: int(want_n)]))


def test_count_stream_spill_matches_in_ram(rng, monkeypatch):
    """Beyond-RAM spill (UNIKMER_TPU_COUNT_MEM_MB tiny -> extsort chunk
    files + cascade merge) must reproduce the in-RAM merge exactly for
    every mode; the spilled result streams in ascending batches."""
    from unikmer_tpu.models.count import SpilledCount, count_stream

    k = 9
    seqs = [random_dna(rng, n).decode() for n in (900, 500, 700, 800)]
    seqs.append(seqs[1][:400])  # cross-chunk duplicates
    recs = [Record(b"s%d" % i, b"s%d" % i, s.encode())
            for i, s in enumerate(seqs)]
    for mode in ("distinct", "unique", "repeated"):
        cfg = CountConfig(k=k, canonical=True, mode=mode)
        want = count_stream(iter(recs), cfg, chunk_bases=512)
        assert isinstance(want, np.ndarray)
        monkeypatch.setenv("UNIKMER_TPU_COUNT_MEM_MB", "0.0001")
        try:
            got = count_stream(iter(recs), cfg, chunk_bases=512)
        finally:
            monkeypatch.delenv("UNIKMER_TPU_COUNT_MEM_MB")
        assert isinstance(got, SpilledCount), mode
        parts = []
        n = got.write_to(parts.append)
        codes = (np.concatenate(parts) if parts
                 else np.zeros(0, np.uint64))
        assert n == len(codes)
        np.testing.assert_array_equal(codes, want, err_msg=mode)
        assert not os.path.exists(got.tmp_dir)  # temp cleanup


def test_stream_dual_staged_equivalence(rng, monkeypatch):
    """The STAGED dual split (sort program + collapse program with
    device-resident handoff; UNIKMER_TPU_DUAL_STAGED) must be exact for
    -u/-d streams at every group size.  The monolithic B>=2 dual graph
    SIGKILLs the remote compile helper on TPU (BENCH_NOTES round-3);
    this is the staging fix's CPU parity lock."""
    from unikmer_tpu.models.count import count_stream_packed

    k = 11
    seqs = [random_dna(rng, n).decode() for n in (900, 500, 1100, 650)]
    seqs.append(seqs[0][:400])  # cross-chunk duplicates
    recs = [Record(b"s%d" % i, b"s%d" % i, s.encode())
            for i, s in enumerate(seqs)]
    packed = pack_records(recs, k)
    for mode in ("unique", "repeated"):
        cfg = CountConfig(k=k, canonical=True, mode=mode)
        monkeypatch.setenv("UNIKMER_TPU_MULTI_BUCKET", "1")
        monkeypatch.setenv("UNIKMER_TPU_DUAL_STEP", "0")
        monkeypatch.delenv("UNIKMER_TPU_DUAL_MULTI", raising=False)
        monkeypatch.setenv("UNIKMER_TPU_DUAL_STAGED", "0")
        want = count_stream_packed([packed], cfg, chunk_bases=512)
        monkeypatch.setenv("UNIKMER_TPU_DUAL_STEP", "1")
        monkeypatch.setenv("UNIKMER_TPU_DUAL_MULTI", "1")
        for b in ("2", "3"):
            for staged in ("0", "1"):
                monkeypatch.setenv("UNIKMER_TPU_MULTI_BUCKET", b)
                monkeypatch.setenv("UNIKMER_TPU_DUAL_STAGED", staged)
                np.testing.assert_array_equal(
                    count_stream_packed([packed], cfg, chunk_bases=512),
                    want, err_msg=f"B={b} staged={staged} mode={mode}")


def test_dual_staged_matches_monolith(rng):
    """Unit parity: _dual_sort_stage + _dual_collapse_stage ==
    _count_step_dual_multi on stacked buckets (both egress modes)."""
    import jax.numpy as jnp

    from unikmer_tpu.models.count import (
        CountConfig,
        _count_step_dual_multi,
        _dual_collapse_stage,
        _dual_sort_stage,
        pack_bases_2bit,
        pad_bases,
    )

    k = 13
    n_b = 3
    cfg = CountConfig(k=k, canonical=True, mode="repeated")
    p2s, vms = [], []
    n = None
    for i in range(n_b):
        seq = random_dna(rng, 700 + 37 * i)
        rec = Record(b"s", b"s", seq)
        packed = pack_records([rec], k)
        bases = pad_bases(packed.bases)
        p2, vm = pack_bases_2bit(bases)
        n = len(bases)
        p2s.append(p2)
        vms.append(vm)
    p2s = jnp.stack(p2s)
    vms = jnp.stack(vms)
    for z in (False, True):
        want = _count_step_dual_multi(p2s, vms, cfg, n, z)
        s_all, nsr, nhead = _dual_sort_stage(p2s, vms, cfg, n)
        got = _dual_collapse_stage(s_all, nsr, nhead, z)
        assert len(want) == len(got)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g),
                                          err_msg=f"z={z}")


def test_compress_result_exception_buffers(rng):
    """Direct contract of the sort-based exception compaction (round 5:
    the scatter formulation cost 4-6 s/piece on the tpu backend and
    dominated the streamed pipeline): exc_idx ascending with -1 fill,
    exc_val aligned, n_exc exact — including exceptions at index 0,
    adjacent runs, and counts past the _MAX_EXC fetch limit."""
    import jax.numpy as jnp

    from unikmer_tpu.models.count import _MAX_EXC, _compress_result

    n_buf = 1 << 17
    out = np.zeros(n_buf, np.uint64)
    # ~98k exceptions (> _MAX_EXC): 3 of 4 deltas overflow u32
    step_big = np.uint64(1 << 33)
    vals = np.cumsum(
        np.where(np.arange(n_buf) % 4 != 3, step_big, np.uint64(1)),
        dtype=np.uint64)
    out[:] = vals
    n = n_buf - 7  # tail slots ignored
    small, ei, ev, ne, nn = (np.asarray(x) for x in _compress_result(
        jnp.asarray(out), jnp.int64(n)))
    big = np.zeros(n_buf, bool)
    deltas = np.diff(out, prepend=out[:1] * 0)
    big[:n] = deltas[:n] >= (1 << 32)
    want_idx = np.flatnonzero(big)
    assert ne == len(want_idx) and ne > _MAX_EXC
    np.testing.assert_array_equal(ei, want_idx[:_MAX_EXC])
    np.testing.assert_array_equal(ev, out[want_idx[:_MAX_EXC]])
    np.testing.assert_array_equal(
        small[:n][~big[:n]], deltas[:n][~big[:n]].astype(np.uint32))
    assert np.all(small[n:] == 0)
    # few-exceptions case: -1 fill beyond n_exc, values aligned
    out2 = np.arange(n_buf, dtype=np.uint64) * np.uint64(3)
    out2 += np.uint64(1 << 40)  # first delta (index 0) overflows u32
    out2[100:] += np.uint64(1 << 45)  # one more at index 100
    small, ei, ev, ne, nn = (np.asarray(x) for x in _compress_result(
        jnp.asarray(out2), jnp.int64(n_buf)))
    assert ne == 2
    np.testing.assert_array_equal(ei[:2], [0, 100])
    np.testing.assert_array_equal(ev[:2], out2[[0, 100]])
    assert np.all(ei[2:] == -1) and np.all(ev[2:] == 0)
