"""Seeded randomized fuzz: .unik round-trips across flag combinations,
set-op algebra vs Python sets, collapse modes vs Counter."""

import collections
import io

import numpy as np
import pytest

from unikmer_tpu.io import unik
from unikmer_tpu.ops import sets
from unikmer_tpu.ops.sort import collapse_sorted
from unikmer_tpu.pipeline import extsort


@pytest.mark.parametrize("trial", range(20))
def test_fuzz_unik_roundtrip(rng, trial):
    k = int(rng.integers(1, 33))
    flag = 0
    if rng.random() < 0.5:
        flag |= unik.SORTED
    if rng.random() < 0.3:
        flag |= unik.COMPACT
    if rng.random() < 0.5:
        flag |= unik.CANONICAL
    if rng.random() < 0.3:
        flag |= unik.HASHED
    include_tax = rng.random() < 0.5
    if include_tax:
        flag |= unik.INCLUDE_TAXID
    n = int(rng.integers(0, 5000))
    bits = 64 if flag & unik.HASHED else 2 * k
    hi = int(min(1 << bits, 1 << 63))
    codes = rng.integers(0, hi, size=n, dtype=np.uint64)
    if flag & unik.SORTED:
        codes = np.sort(codes)
    max_taxid = int(rng.choice([200, 70000, (1 << 32) - 1]))
    taxids = (
        rng.integers(0, max_taxid, size=n, dtype=np.uint32) if include_tax else None
    )
    compress = bool(rng.random() < 0.5)
    threads = int(rng.choice([1, 4]))
    buf = io.BytesIO()
    with unik.UnikWriter(
        buf, k=k, flag=flag, max_taxid=max_taxid, compress=compress,
        threads=threads, block_size=int(rng.choice([7, 100, 1 << 20])),
        description=bytes(rng.integers(32, 126, size=int(rng.integers(0, 64))).astype(np.uint8)),
        global_taxid=0 if include_tax else int(rng.integers(0, 1000)),
        scale=int(rng.choice([1, 15])),
    ) as w:
        w.write_codes(codes, taxids)
    r = unik.UnikReader(io.BufferedReader(io.BytesIO(buf.getvalue())))
    out, out_tax = r.read_all()
    np.testing.assert_array_equal(out, codes)
    if include_tax:
        np.testing.assert_array_equal(out_tax, taxids)


@pytest.mark.parametrize("trial", range(10))
def test_fuzz_set_algebra(rng, trial):
    space = int(rng.choice([50, 1000, 1 << 40]))
    a = np.unique(rng.integers(0, space, size=rng.integers(0, 400), dtype=np.uint64))
    b = np.unique(rng.integers(0, space, size=rng.integers(0, 400), dtype=np.uint64))
    sa, sb = set(a.tolist()), set(b.tolist())
    u, _ = sets.union([a, b])
    assert u.tolist() == sorted(sa | sb)
    i, _ = sets.intersect([a, b])
    assert i.tolist() == sorted(sa & sb)
    d, _ = sets.subtract(a, None, [b])
    assert d.tolist() == sorted(sa - sb)
    c, _ = sets.common([a, b], threshold=2)
    assert c.tolist() == sorted(sa & sb)


@pytest.mark.parametrize("mode", ["distinct", "unique", "repeated"])
def test_fuzz_collapse_modes(rng, mode):
    for _ in range(5):
        n = int(rng.integers(1, 2000))
        codes = rng.integers(0, 50, size=n, dtype=np.uint64)
        valid = rng.random(n) < 0.8
        out, cnt = collapse_sorted(codes, valid, mode=mode)
        got = np.asarray(out)[: int(cnt)].tolist()
        counter = collections.Counter(codes[valid].tolist())
        if mode == "distinct":
            want = sorted(counter)
        elif mode == "unique":
            want = sorted(c for c, m in counter.items() if m == 1)
        else:
            want = sorted(c for c, m in counter.items() if m > 1)
        assert got == want, mode


def test_fuzz_merge_batches_vs_sort(rng):
    # bulk tournament merge over random sorted chunk files == global sort
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        files = []
        all_codes = []
        for i in range(6):
            codes = np.sort(
                rng.integers(0, 10000, size=rng.integers(1, 3000), dtype=np.uint64)
            )
            all_codes.append(codes)
            path = os.path.join(d, f"c{i}.unik")
            with unik.UnikWriter(path, k=13, flag=unik.SORTED,
                                 block_size=64) as w:
                w.write_codes(codes)
            files.append(path)
        got = []
        extsort.merge_sorted_files(
            files, lambda c, t: got.extend(c.tolist()), mode="none"
        )
        want = np.sort(np.concatenate(all_codes)).tolist()
        assert got == want
        # unique mode
        got_u = []
        extsort.merge_sorted_files(
            files, lambda c, t: got_u.extend(c.tolist()), mode="unique"
        )
        assert got_u == sorted(set(want))
        # repeated (final round)
        got_r = []
        extsort.merge_sorted_files(
            files, lambda c, t: got_r.extend(c.tolist()), mode="repeated"
        )
        counter = collections.Counter(want)
        assert got_r == sorted(c for c, m in counter.items() if m > 1)


# ---------------------------------------------------------------------------
# CLI-level fuzz: grep membership, locate BED, map regions vs brute force
# ---------------------------------------------------------------------------

from unikmer_tpu.ops import codec as _codec
from tests.test_cli_commands import cli as _cli
from tests.test_count import brute_kmers as _brute_kmers
from tests.conftest import random_dna as _random_dna


def _revcomp(s: str) -> str:
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


@pytest.mark.parametrize("trial", range(3))
def test_fuzz_grep_membership(tmp_path, rng, trial, capsysbinary):
    k = int(rng.integers(5, 18))
    seq = _random_dna(rng, 1200).decode()
    fa = tmp_path / "g.fa"
    fa.write_text(f">g\n{seq}\n")
    unik = tmp_path / "s"
    assert _cli(["count", "-k", k, "-K", "-s", fa, "-o", unik]) == 0
    member = set(_brute_kmers([seq], k, canonical=True))
    # queries: half real k-mers, half random (some present by chance)
    n_q = 40
    reals = rng.choice(sorted(member), n_q // 2, replace=False).tolist()
    rands = [_random_dna(rng, k).decode() for _ in range(n_q - len(reals))]
    queries = reals + rands
    qfile = tmp_path / "q.txt"
    qfile.write_text("".join(q + "\n" for q in queries))
    out = tmp_path / "hits"
    capsysbinary.readouterr()
    assert _cli(["grep", "-f", qfile, str(unik) + ".unik", "-o", out]) == 0
    from unikmer_tpu.io.unik import UnikReader

    with UnikReader(str(out) + ".unik") as r:
        hits, _ = r.read_all()
    hit_set = set(int(c) for c in hits)
    want = set()
    for q in queries:
        canon = min(q, _revcomp(q))
        if canon in member:
            want.add(_codec.encode_kmer(canon))
    assert hit_set == want
    # invert match: everything in the set except the queried ones
    out2 = tmp_path / "inv"
    assert _cli(["grep", "-v", "-f", qfile, str(unik) + ".unik", "-o", out2]) == 0
    with UnikReader(str(out2) + ".unik") as r:
        inv, _ = r.read_all()
    want_inv = {_codec.encode_kmer(m) for m in member} - want
    assert set(int(c) for c in inv) == want_inv


@pytest.mark.parametrize("trial", range(3))
def test_fuzz_locate_bed6(tmp_path, rng, trial, capsysbinary):
    k = int(rng.integers(5, 14))
    # duplicated block forces multi-occurrence k-mers
    core = _random_dna(rng, 300).decode()
    seq = core + _random_dna(rng, 100).decode() + core
    fa = tmp_path / "g.fa"
    fa.write_text(f">chr\n{seq}\n")
    unik = tmp_path / "s"
    assert _cli(["count", "-k", k, "-K", "-s", fa, "-o", unik]) == 0
    capsysbinary.readouterr()
    assert _cli(["locate", "-g", fa, str(unik) + ".unik"]) == 0
    bed = capsysbinary.readouterr().out.decode().strip().splitlines()
    got = set()
    for line in bed:
        chrom, s, e, km, zero, strand = line.split("\t")
        assert chrom == "chr" and int(e) - int(s) == k
        assert zero == "0" and strand == "."
        p = int(s)
        # locate prints the genome-strand k-mer at the position
        # (reference locate.go / locked README fixture)
        assert seq[p : p + k] == km
        got.add(p)
    # every genome position whose canonical k-mer is in the set must be
    # reported exactly once
    member = {min(seq[i : i + k], _revcomp(seq[i : i + k]))
              for i in range(len(seq) - k + 1)}
    want = set(range(len(seq) - k + 1))
    assert got == want


@pytest.mark.parametrize("gap", [0, 2])
def test_fuzz_map_regions(tmp_path, rng, gap, capsysbinary):
    k = 9
    seq = _random_dna(rng, 800).decode()
    fa = tmp_path / "g.fa"
    fa.write_text(f">c\n{seq}\n")
    # set = k-mers of two disjoint windows of the genome
    s1, s2 = seq[100:220], seq[400:520]
    sub = tmp_path / "sub.fa"
    sub.write_text(f">a\n{s1}\n>b\n{s2}\n")
    unik = tmp_path / "s"
    assert _cli(["count", "-k", k, "-K", "-s", sub, "-o", unik]) == 0
    capsysbinary.readouterr()
    assert _cli(["map", "-g", fa, str(unik) + ".unik", "-m", 20, "-M",
                 "-x", gap, "-X", 10 if gap else 0]) == 0
    bed = capsysbinary.readouterr().out.decode().strip().splitlines()
    regions = []
    for line in bed:
        chrom, s, e = line.split("\t")[:3]
        regions.append((int(s), int(e)))
    # the two planted windows must be recovered (allowing boundary slack
    # from chance matches elsewhere)
    def covered(a, b):
        return any(s <= a and b <= e for s, e in regions)

    assert covered(100, 220) and covered(400, 520)
    for s, e in regions:
        assert e - s >= 20


def test_fuzz_tsplit_partition(tmp_path, rng):
    """tsplit: output files exactly partition the input by taxid, each
    with the taxid as global header taxid."""
    import glob

    from unikmer_tpu.io.unik import (
        CANONICAL, INCLUDE_TAXID, SORTED, UnikReader, UnikWriter,
    )

    taxids_pool = np.array([1, 2, 562, 561, 511145, 585057, 83333], np.uint32)
    codes = np.unique(rng.integers(0, 1 << 40, 3000, dtype=np.uint64))
    taxes = rng.choice(taxids_pool, len(codes)).astype(np.uint32)
    src = tmp_path / "in.unik"
    with UnikWriter(str(src), 23, CANONICAL | SORTED | INCLUDE_TAXID,
                    number=len(codes), max_taxid=int(taxes.max())) as w:
        w.write_codes(codes, taxes)
    outdir = tmp_path / "parts"
    assert _cli(["tsplit", src, "-O", outdir, "-o", "part"]) == 0
    seen = {}
    for f in glob.glob(str(outdir / "*.unik")):
        with UnikReader(f) as r:
            cs, _ = r.read_all()
            gt = r.header.global_taxid
            assert gt > 0
            seen[gt] = np.asarray(cs)
    assert set(seen) == set(int(t) for t in np.unique(taxes))
    for t, cs in seen.items():
        np.testing.assert_array_equal(cs, codes[taxes == t])


def test_fuzz_rfilter_vs_bruteforce(tmp_path, rng):
    """rfilter -E/-L/-H vs a brute-force walk of the fixture taxonomy."""
    import os

    from unikmer_tpu.io.unik import (
        CANONICAL, INCLUDE_TAXID, SORTED, UnikReader, UnikWriter,
    )

    nodes = {}
    ranks = {}
    for line in open(os.path.join(os.path.dirname(__file__), "data",
                                  "taxdump", "nodes.dmp")):
        parts = [p.strip() for p in line.split("|")]
        nodes[int(parts[0])] = int(parts[1])
        ranks[int(parts[0])] = parts[2]
    pool = np.array(sorted(nodes), np.uint32)
    codes = np.unique(rng.integers(0, 1 << 40, 2000, dtype=np.uint64))
    taxes = rng.choice(pool, len(codes)).astype(np.uint32)
    src = tmp_path / "in.unik"
    with UnikWriter(str(src), 23, CANONICAL | SORTED | INCLUDE_TAXID,
                    number=len(codes), max_taxid=int(taxes.max())) as w:
        w.write_codes(codes, taxes)

    def run_rfilter(extra):
        out = tmp_path / "out"
        assert _cli(["rfilter", src, "-o", out] + extra) == 0
        with UnikReader(str(out) + ".unik") as r:
            cs, _ = r.read_all()
        return set(int(c) for c in cs)

    # -E species: keep only rank == species
    got = run_rfilter(["-E", "species"])
    want = {int(c) for c, t in zip(codes, taxes) if ranks[int(t)] == "species"}
    assert got == want

    # -E species -E strain
    got = run_rfilter(["-E", "species", "-E", "strain"])
    want = {int(c) for c, t in zip(codes, taxes)
            if ranks[int(t)] in ("species", "strain")}
    assert got == want

    # -L species (lower than or ... strictly lower): strain is lower
    got = run_rfilter(["-L", "species"])
    want_strain = {int(c) for c, t in zip(codes, taxes)
                   if ranks[int(t)] == "strain"}
    assert got.issuperset(want_strain)
    assert not any(
        int(c) in got for c, t in zip(codes, taxes)
        if ranks[int(t)] in ("genus", "family", "order", "class", "phylum",
                             "superkingdom", "species")
    )

    # -H genus: strictly higher than genus
    got = run_rfilter(["-H", "genus"])
    higher = ("family", "order", "class", "phylum", "superkingdom")
    want_hi = {int(c) for c, t in zip(codes, taxes) if ranks[int(t)] in higher}
    assert got == want_hi


def test_union_const_taxids_unsorted_input(rng):
    # regression: the unsorted-input check used np.diff on uint64,
    # which wraps on descending steps and never fired — unsorted
    # global-taxid inputs then hit sorted-only native kernels
    a = rng.integers(0, 1 << 40, size=500, dtype=np.uint64)[::-1].copy()
    b = np.unique(rng.integers(0, 1 << 40, size=300, dtype=np.uint64))
    ta = np.full(len(a), 11, np.uint32)
    tb = np.full(len(b), 11, np.uint32)
    u, t = sets.union([a, b], [ta, tb])
    want = sorted(set(a.tolist()) | set(b.tolist()))
    assert u.tolist() == want
    assert t is not None and (t == 11).all()


def test_dedup_sorted_zero_taxid_identity():
    # {0, t} must merge to t (0 = no-taxid identity), matching
    # _lca_merge; {t1, t2} distinct nonzero -> 0; all-zero -> 0
    codes = np.array([5, 5, 7, 7, 9, 9, 10], np.uint64)
    tax = np.array([0, 4, 3, 8, 0, 0, 6], np.uint32)
    c, t = sets.dedup_sorted(codes, tax, None)
    assert c.tolist() == [5, 7, 9, 10]
    assert t.tolist() == [4, 0, 0, 6]


def test_subtract_empty_taxid_target(rng):
    # regression (fuzz_campaign seed 0xf402): an empty taxid-carrying
    # target crashed subtract — member_mask's clipped index was used to
    # gather from the zero-length taxid column
    q = np.unique(rng.integers(0, 1 << 40, size=200, dtype=np.uint64))
    qt = np.full(len(q), 7, np.uint32)
    empty = np.zeros(0, np.uint64)
    out, out_t = sets.subtract(
        q, qt, [empty], [np.zeros(0, np.uint32)], compare_taxid=True
    )
    assert out.tolist() == q.tolist() and out_t.tolist() == qt.tolist()


def test_locate_duplicate_codes_print_once(tmp_path, rng, capsysbinary):
    # regression: duplicate codes inside ONE .unik block printed their
    # BED lines twice (the reference's found-map delete prints once,
    # locate.go:274-285); cross-block duplicates were already deduped
    from tests.conftest import random_dna

    from unikmer_tpu.cli.main import main
    from unikmer_tpu.io.unik import CANONICAL, UnikReader, UnikWriter

    fa = tmp_path / "g.fa"
    fa.write_text(f">s\n{random_dna(rng, 120).decode()}\n")
    a = tmp_path / "a"
    assert main([str(x) for x in ("count", "-k", 11, "-K", fa, "-o", a)]) == 0
    with UnikReader(f"{a}.unik") as r:
        codes = np.concatenate([c for c, _ in r.iter_blocks()])
    dup = tmp_path / "dup.unik"
    with UnikWriter(dup, k=11, flag=CANONICAL) as w:
        w.write_codes(np.concatenate([codes, codes]))  # one block, 2x
    for src in (f"{a}.unik", str(dup)):
        assert main(["locate", "-g", str(fa), src]) == 0
    out = capsysbinary.readouterr().out.splitlines()
    # both runs must emit the same multiset of lines, each unique
    half = len(out) // 2
    assert half and sorted(out[:half]) == sorted(out[half:])
    assert len(set(out[:half])) == half
