"""CLI tests for taxid-carrying paths: parse-taxid counting, LCA union,
compare-taxid diff, mix-taxid inter, taxid grep, view -g hashed decode,
seq-name filters, infile lists and stdin-free plumbing."""

import os

import numpy as np
import pytest

from unikmer_tpu.io.unik import UnikReader
from unikmer_tpu.ops import codec
from tests.conftest import random_dna
from tests.test_count import brute_kmers

TAXDUMP = os.path.join(os.path.dirname(__file__), "data", "taxdump")


def cli(argv):
    from unikmer_tpu.cli.main import main

    os.environ["UNIKMER_DB"] = TAXDUMP
    return main([str(a) for a in argv])


def read_unik(path):
    with UnikReader(path) as r:
        codes, taxids = r.read_all()
        return r.header, codes, taxids


@pytest.fixture()
def fa(tmp_path, rng):
    def make(name, seqs_with_headers):
        p = tmp_path / name
        p.write_text(
            "".join(f">{h}\n{s}\n" for h, s in seqs_with_headers)
        )
        return str(p)

    return make


def test_count_parse_taxid_lca(tmp_path, fa, rng):
    shared = random_dna(rng, 200).decode()
    s1 = shared + random_dna(rng, 100).decode()
    s2 = shared + random_dna(rng, 100).decode()
    # taxids 511145 (MG1655 strain) and 585057 (IAI39) -> LCA 562
    path = fa("multi.fa", [("r1 taxid|511145", s1), ("r2 taxid|585057", s2)])
    out = tmp_path / "o"
    assert cli([
        "count", "-k", 11, "-K", "-s", path, "-o", out,
        "-T", "-r", r"taxid\|(\d+)",
    ]) == 0
    h, codes, taxids = read_unik(f"{out}.unik")
    assert h.is_include_taxid
    shared_codes = {
        codec.encode_kmer(s) for s in brute_kmers([shared], 11, canonical=True)
    }
    for c, t in zip(codes, taxids):
        if int(c) in shared_codes:
            assert t == 562, int(c)  # LCA of both strains
        else:
            # a random 11-mer may collide across the two private tails,
            # which legitimately LCA-merges to 562 as well
            assert t in (511145, 585057, 562)


def test_union_lca_and_inter_mix_taxid(tmp_path, fa, rng):
    seq = random_dna(rng, 500).decode()
    p = fa("g.fa", [("g", seq)])
    a = tmp_path / "a"
    b = tmp_path / "b"
    c = tmp_path / "c"
    assert cli(["count", "-k", 11, "-K", "-s", p, "-o", a, "-t", 511145]) == 0
    assert cli(["count", "-k", 11, "-K", "-s", p, "-o", b, "-t", 585057]) == 0
    assert cli(["count", "-k", 11, "-K", "-s", p, "-o", c]) == 0  # no taxid
    u = tmp_path / "u"
    assert cli(["union", f"{a}.unik", f"{b}.unik", "-s", "-o", u]) == 0
    _, codes, taxids = read_unik(f"{u}.unik")
    assert set(taxids.tolist()) == {562}
    # inter without mix-taxid must die on mixed inputs
    assert cli(["inter", f"{a}.unik", f"{c}.unik", "-o", tmp_path / "x"]) != 0
    # with --mix-taxid it passes; taxids kept from the taxid-carrying file
    i = tmp_path / "i"
    assert cli(["inter", "-m", f"{a}.unik", f"{c}.unik", "-o", i]) == 0
    _, codes, taxids = read_unik(f"{i}.unik")
    assert len(codes) > 0 and set(taxids.tolist()) == {511145}


def test_diff_compare_taxid(tmp_path, fa, rng):
    seq = random_dna(rng, 400).decode()
    p = fa("g.fa", [("g", seq)])
    q = tmp_path / "q"
    # query has species-level taxid 562
    assert cli(["count", "-k", 11, "-K", "-s", p, "-o", q, "-t", 562]) == 0
    desc = tmp_path / "desc"
    # target has strain 511145, a DESCENDANT of 562 -> kept with -t
    assert cli(["count", "-k", 11, "-K", "-s", p, "-o", desc, "-t", 511145]) == 0
    other = tmp_path / "other"
    # target has unrelated taxid 349741 -> removed even with -t
    assert cli(["count", "-k", 11, "-K", "-s", p, "-o", other, "-t", 349741]) == 0

    d1 = tmp_path / "d1"
    assert cli(["diff", "-t", f"{q}.unik", f"{desc}.unik", "-o", d1]) == 0
    _, codes1, _ = read_unik(f"{d1}.unik")
    _, qcodes, _ = read_unik(f"{q}.unik")
    np.testing.assert_array_equal(codes1, qcodes)  # all survive

    d2 = tmp_path / "d2"
    assert cli(["diff", "-t", f"{q}.unik", f"{other}.unik", "-o", d2]) == 0
    _, codes2, _ = read_unik(f"{d2}.unik")
    assert len(codes2) == 0  # all removed (349741 not under 562)


def test_common_threshold(tmp_path, fa, rng):
    seqs = [random_dna(rng, 300).decode() for _ in range(3)]
    shared = random_dna(rng, 60).decode()
    outs = []
    for i, s in enumerate(seqs):
        p = fa(f"g{i}.fa", [(f"g{i}", s + shared)])
        o = tmp_path / f"o{i}"
        assert cli(["count", "-k", 11, "-K", "-s", p, "-o", o]) == 0
        outs.append(f"{o}.unik")
    c2 = tmp_path / "c2"
    assert cli(["common", *outs, "-n", 2, "-o", c2]) == 0
    _, codes, _ = read_unik(f"{c2}.unik")
    shared_codes = {
        codec.encode_kmer(s) for s in brute_kmers([shared], 11, canonical=True)
    }
    assert shared_codes <= set(codes.tolist())
    # -p 1.0 == all files
    c3 = tmp_path / "c3"
    assert cli(["common", *outs, "-p", "1", "-o", c3]) == 0
    _, codes3, _ = read_unik(f"{c3}.unik")
    assert set(codes3.tolist()) <= set(codes.tolist())


def test_grep_by_taxid(tmp_path, fa, rng):
    seq1 = random_dna(rng, 300).decode()
    seq2 = random_dna(rng, 300).decode()
    a = tmp_path / "a"
    b = tmp_path / "b"
    assert cli(["count", "-k", 11, "-K", "-s", fa("a.fa", [("a", seq1)]), "-o", a, "-t", 511145]) == 0
    assert cli(["count", "-k", 11, "-K", "-s", fa("b.fa", [("b", seq2)]), "-o", b, "-t", 349741]) == 0
    cc = tmp_path / "cc"
    assert cli(["concat", f"{a}.unik", f"{b}.unik", "-o", cc]) == 0
    g = tmp_path / "g"
    assert cli(["grep", "-t", "-q", 511145, f"{cc}.unik", "-o", g]) == 0
    _, codes, taxids = read_unik(f"{g}.unik")
    assert set(taxids.tolist()) == {511145}
    _, acodes, _ = read_unik(f"{a}.unik")
    assert sorted(codes.tolist()) == acodes.tolist()


def test_view_genome_decode_hashed(tmp_path, fa, rng):
    seq = random_dna(rng, 400).decode()
    p = fa("g.fa", [("chr1", seq)])
    a = tmp_path / "a"
    assert cli(["count", "-k", 21, "-K", "-H", "-s", p, "-o", a]) == 0
    out = tmp_path / "view.txt"
    assert cli(["view", "-g", p, f"{a}.unik", "-o", out]) == 0
    lines = out.read_text().strip().split("\n")
    want = {
        s if s <= _rc(s) else _rc(s)
        for s in brute_kmers([seq], 21, canonical=False)
    }
    # each line is a 21-mer string present in the genome (fwd or rc)
    for ln in lines[:100]:
        assert len(ln) == 21
        assert ln in seq or _rc(ln) in seq


def _rc(s):
    COMP = dict(zip("ACGT", "TGCA"))
    return "".join(COMP[c] for c in reversed(s))


def test_seq_name_filter_and_infile_list(tmp_path, fa, rng):
    seq1 = random_dna(rng, 300).decode()
    seq2 = random_dna(rng, 300).decode()
    p = fa("two.fa", [("keep_me", seq1), ("plasmid junk", seq2)])
    out = tmp_path / "o"
    assert cli(["count", "-k", 11, "-K", "-s", p, "-o", out, "-B", "plasmid"]) == 0
    _, codes, _ = read_unik(f"{out}.unik")
    want = sorted({codec.encode_kmer(s) for s in brute_kmers([seq1], 11, True)})
    np.testing.assert_array_equal(codes, np.array(want, np.uint64))

    lst = tmp_path / "files.txt"
    lst.write_text(p + "\n")
    out2 = tmp_path / "o2"
    assert cli(["count", "-k", 11, "-K", "-s", "-i", lst, "-o", out2]) == 0
    _, codes2, _ = read_unik(f"{out2}.unik")
    wantall = sorted(
        {codec.encode_kmer(s) for s in brute_kmers([seq1, seq2], 11, True)}
    )
    np.testing.assert_array_equal(codes2, np.array(wantall, np.uint64))


def test_view_genome_partial_decode(tmp_path, fa, rng):
    """Hashes absent from the provided genomes print as integers while
    present ones decode (view.go:176-185)."""
    seq = random_dna(rng, 200).decode()
    p = fa("g.fa", [("chr1", seq)])
    a = tmp_path / "a"
    assert cli(["count", "-k", 15, "-K", "-H", "-s", p, "-o", a]) == 0
    # append a foreign hash so one record can't be decoded
    from unikmer_tpu.io.unik import UnikReader, UnikWriter, SORTED, CANONICAL, HASHED
    import numpy as np

    h, codes, _ = read_unik(f"{a}.unik")
    foreign = np.uint64(0xDEADBEEFDEADBEEF)
    codes2 = np.sort(np.append(codes, foreign))
    with UnikWriter(str(tmp_path / "b.unik"), k=15,
                    flag=SORTED | CANONICAL | HASHED) as w:
        w.write_codes(codes2)
    out = tmp_path / "v.txt"
    assert cli(["view", "-g", p, str(tmp_path / "b.unik"), "-o", out]) == 0
    lines = out.read_text().splitlines()
    assert str(int(foreign)) in lines  # undecodable printed as integer
    assert sum(1 for l in lines if len(l) == 15) == len(codes)


def test_count_linear_parse_taxid(tmp_path, rng, fa):
    """count -l -T: linear (order-preserving, duplicates kept) with
    per-record taxids parsed from headers (count.go:235-258,377-410);
    the batched single-dispatch path must match the per-record oracle."""
    k = 7
    seqs = [
        random_dna(rng, 40).decode(),
        "ACGTACGTACGTACGT",          # repetitive: duplicate windows
        random_dna(rng, 5).decode(),  # shorter than k: skipped
        random_dna(rng, 33).decode().lower(),
    ]
    taxids = [562, 511145, 9606, 585057]
    path = fa("lin.fa", [
        (f"r{i}|taxid={t}", s) for i, (s, t) in enumerate(zip(seqs, taxids))
    ])
    out = tmp_path / "lt"
    assert cli([
        "count", "-k", k, "-K", "-l", "-T", "-r", r"taxid=(\d+)",
        path, "-o", out,
    ]) == 0
    hdr, codes, got_tax = read_unik(f"{out}.unik")
    assert hdr.is_include_taxid and not hdr.is_sorted
    want_codes, want_tax = [], []
    for s, t in zip(seqs, taxids):
        for km in brute_kmers([s], k, canonical=True):
            want_codes.append(km)
            want_tax.append(t)
    got_kmers = [codec.decode_kmer(int(c), k) for c in codes]
    assert got_kmers == want_codes          # exact linear order
    assert got_tax.tolist() == want_tax
    # a record with an unparseable header dies
    bad = fa("bad.fa", [("r0|taxid=5", "ACGTACGTAC"), ("nope", "ACGTACGTAC")])
    assert cli([
        "count", "-k", k, "-K", "-l", "-T", "-r", r"taxid=(\d+)",
        bad, "-o", tmp_path / "x",
    ]) != 0


def test_count_parse_taxid_with_sketch_routes_device(tmp_path, fa, rng):
    # regression: the host taxid engine has no sketch kernels; -T with
    # -W/-S must NOT route there (it would emit plain hashed windows).
    # With a single record the taxid column is trivial, so -T output
    # codes must equal the plain syncmer sketch codes.
    seq = random_dna(rng, 4000).decode()
    path = fa("one.fa", [("r1 taxid|562", seq)])
    out_t = tmp_path / "with_taxid"
    out_p = tmp_path / "plain"
    env = os.environ.get("UNIKMER_TPU_HOST_COUNT")
    os.environ["UNIKMER_TPU_HOST_COUNT"] = "1"  # force-tempt host routing
    try:
        assert cli([
            "count", "-k", 21, "-S", 11, "-s", path, "-o", out_t,
            "-T", "-r", r"taxid\|(\d+)",
        ]) == 0
        assert cli([
            "count", "-k", 21, "-S", 11, "-s", path, "-o", out_p,
        ]) == 0
    finally:
        if env is None:
            os.environ.pop("UNIKMER_TPU_HOST_COUNT", None)
        else:
            os.environ["UNIKMER_TPU_HOST_COUNT"] = env
    _, codes_t, taxids = read_unik(f"{out_t}.unik")
    _, codes_p, _ = read_unik(f"{out_p}.unik")
    assert np.array_equal(np.sort(codes_t), np.sort(codes_p))
    assert set(np.asarray(taxids).tolist()) == {562}


def test_count_compat_syncmer_accepts_parse_taxid(tmp_path, fa, rng):
    # round 4: the compat syncmer grew a device twin
    # (ops/sketch.syncmer_compat_windows), so -T now routes through the
    # device sketch path instead of being rejected (exact LCA-merge
    # parity: tests/test_syncmer_compat_device.py::test_cli_compat_taxid)
    path = fa("one2.fa", [("r1 taxid|562", random_dna(rng, 500).decode())])
    assert cli([
        "count", "-k", 21, "-S", 11, "--syncmer-impl", "compat",
        path, "-o", tmp_path / "x", "-T", "-r", r"taxid\|(\d+)",
    ]) == 0


def test_union_taxids_device_matches_host(tmp_path, fa, rng):
    """union of taxid-carrying files through the on-device compact-table
    LCA (UNIKMER_TPU_DEVICE_TAXID=1) must equal the host engine."""
    shared = random_dna(rng, 300).decode()
    paths = []
    for i, t in enumerate((511145, 585057, 349741)):
        s = shared + random_dna(rng, 200 + 37 * i).decode()
        p = fa(f"u{i}.fa", [(f"r{i} taxid|{t}", s)])
        out = tmp_path / f"u{i}"
        assert cli(["count", "-k", 13, "-K", "-s", p, "-o", out,
                    "-T", "-r", r"taxid\|(\d+)"]) == 0
        paths.append(f"{out}.unik")
    results = {}
    for knob in ("0", "1"):
        out = tmp_path / f"union{knob}"
        old = os.environ.pop("UNIKMER_TPU_DEVICE_TAXID", None)
        os.environ["UNIKMER_TPU_DEVICE_TAXID"] = knob
        try:
            assert cli(["union", *paths, "-o", out, "-s"]) == 0
        finally:
            os.environ.pop("UNIKMER_TPU_DEVICE_TAXID", None)
            if old is not None:
                os.environ["UNIKMER_TPU_DEVICE_TAXID"] = old
        results[knob] = read_unik(f"{out}.unik")
    _, c0, t0 = results["0"]
    _, c1, t1 = results["1"]
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(t0, t1)
    assert len(set(np.asarray(t0).tolist())) > 1  # LCA actually merged
