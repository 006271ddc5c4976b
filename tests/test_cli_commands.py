"""CLI command round-trip tests on small synthetic data (fast suite).

Each test drives the real CLI entry (in-process) and checks against
brute-force expectations.
"""

import gzip
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


@pytest.fixture()
def genomes(tmp_path, rng):
    paths = []
    seqs = []
    for i, n in enumerate((3000, 2500)):
        seq = random_dna(rng, n).decode()
        p = tmp_path / f"g{i}.fa"
        p.write_text(f">g{i} synthetic\n{seq}\n")
        paths.append(str(p))
        seqs.append(seq)
    return paths, seqs


def read_unik(path):
    with UnikReader(path) as r:
        codes, taxids = r.read_all()
        return r.header, codes, taxids


def expected_set(seqs, k, canonical=True):
    return sorted({codec.encode_kmer(s) for s in brute_kmers(seqs, k, canonical)})


def test_count_sort_roundtrip(tmp_path, genomes):
    paths, seqs = genomes
    out = tmp_path / "a.k15"
    assert cli(["count", "-k", 15, "-K", "-s", paths[0], "-o", out]) == 0
    h, codes, _ = read_unik(str(out) + ".unik")
    want = expected_set([seqs[0]], 15)
    np.testing.assert_array_equal(codes, np.array(want, np.uint64))
    assert h.is_sorted and h.is_canonical and h.number == len(want)


def test_sort_external_equals_in_memory(tmp_path, genomes):
    paths, seqs = genomes
    a = tmp_path / "a.k11"
    b = tmp_path / "b.k11"
    assert cli(["count", "-k", 11, "-K", paths[0], "-o", a]) == 0
    assert cli(["count", "-k", 11, "-K", paths[1], "-o", b]) == 0
    mem = tmp_path / "mem"
    ext = tmp_path / "ext"
    assert cli(["sort", "-u", f"{a}.unik", f"{b}.unik", "-o", mem]) == 0
    assert cli([
        "sort", "-u", f"{a}.unik", f"{b}.unik", "-o", ext,
        "-m", "1K", "-t", tmp_path,
    ]) == 0
    _, m1, _ = read_unik(f"{mem}.unik")
    _, m2, _ = read_unik(f"{ext}.unik")
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(m1, np.array(expected_set(seqs, 11), np.uint64))


def test_sort_repeated_mode(tmp_path, genomes):
    paths, seqs = genomes
    a = tmp_path / "a.k11"
    assert cli(["count", "-k", 11, "-K", "-s", paths[0], "-o", a]) == 0
    dup = tmp_path / "dup"
    # a ∪ a -> every k-mer repeated
    assert cli(["sort", "-d", f"{a}.unik", f"{a}.unik", "-o", dup]) == 0
    _, codes, _ = read_unik(f"{dup}.unik")
    np.testing.assert_array_equal(
        codes, np.array(expected_set([seqs[0]], 11), np.uint64)
    )
    # external chunked repeated must agree
    dup2 = tmp_path / "dup2"
    assert cli(["sort", "-d", f"{a}.unik", f"{a}.unik", "-o", dup2,
                "-m", "1K", "-t", tmp_path]) == 0
    _, codes2, _ = read_unik(f"{dup2}.unik")
    np.testing.assert_array_equal(codes, codes2)


def test_split_merge_roundtrip(tmp_path, genomes):
    paths, seqs = genomes
    a = tmp_path / "a.k11"
    assert cli(["count", "-k", 11, "-K", paths[0], "-o", a]) == 0
    chunks = tmp_path / "chunks"
    assert cli(["split", f"{a}.unik", "-O", chunks, "-m", "2K", "-u"]) == 0
    files = sorted(os.listdir(chunks))
    assert len(files) >= 2 and all(f.startswith("chunk_") for f in files)
    merged = tmp_path / "merged"
    assert cli(["merge", "-D", chunks, "-u", "-o", merged]) == 0
    _, codes, _ = read_unik(f"{merged}.unik")
    np.testing.assert_array_equal(
        codes, np.array(expected_set([seqs[0]], 11), np.uint64)
    )


def test_head_and_sample(tmp_path, genomes):
    paths, _ = genomes
    a = tmp_path / "a.k15"
    assert cli(["count", "-k", 15, "-K", "-s", paths[0], "-o", a]) == 0
    _, all_codes, _ = read_unik(f"{a}.unik")
    h5 = tmp_path / "h5"
    assert cli(["head", "-n", 5, f"{a}.unik", "-o", h5]) == 0
    _, codes, _ = read_unik(f"{h5}.unik")
    np.testing.assert_array_equal(codes, all_codes[:5])
    sm = tmp_path / "sm"
    assert cli(["sample", "-s", 3, "-w", 7, f"{a}.unik", "-o", sm]) == 0
    _, codes, _ = read_unik(f"{sm}.unik")
    np.testing.assert_array_equal(codes, all_codes[2::7])


def test_grep_and_invert(tmp_path, genomes):
    paths, seqs = genomes
    a = tmp_path / "a.k15"
    assert cli(["count", "-k", 15, "-K", "-s", paths[0], "-o", a]) == 0
    _, all_codes, _ = read_unik(f"{a}.unik")
    queries = [codec.decode_kmer(int(c), 15) for c in all_codes[:3]]
    hit = tmp_path / "hit"
    assert cli(["grep", "-q", ",".join(queries), f"{a}.unik", "-o", hit, "-s"]) == 0
    _, codes, _ = read_unik(f"{hit}.unik")
    np.testing.assert_array_equal(codes, all_codes[:3])
    inv = tmp_path / "inv"
    assert cli(["grep", "-q", ",".join(queries), "-v", f"{a}.unik", "-o", inv, "-s"]) == 0
    _, codes, _ = read_unik(f"{inv}.unik")
    np.testing.assert_array_equal(codes, all_codes[3:])


def test_grep_device_membership_matches_host(tmp_path, genomes,
                                             monkeypatch):
    """The device membership tier (UNIKMER_TPU_GREP_DEVICE=1: HBM query
    set + bit-packed per-block lookups) must byte-match the host
    merge-join, incl. invert and -F unik queries, and the all-ones
    sentinel code."""
    paths, seqs = genomes
    a = tmp_path / "a.k15"
    b = tmp_path / "b.k15"
    assert cli(["count", "-k", 15, "-K", "-s", paths[0], "-o", a]) == 0
    assert cli(["count", "-k", 15, "-K", "-s", paths[1], "-o", b]) == 0
    # k=32 poly-T for sentinel-code coverage
    pt = tmp_path / "polyt.fa"
    pt.write_text(">s\n" + "T" * 64 + "ACGTACGTAGGATCCTTGCAACGGTCAGTCAT" * 3 + "\n")
    s32 = tmp_path / "s32"
    assert cli(["count", "-k", 32, "-s", str(pt), "-o", s32]) == 0
    cases = [
        (["grep", "-F", f"{b}.unik", f"{a}.unik", "-s"], "f"),
        (["grep", "-F", f"{b}.unik", "-v", f"{a}.unik", "-s"], "fv"),
        (["grep", "-F", f"{s32}.unik", f"{s32}.unik", "-s"], "sent"),
    ]
    for argv, tag in cases:
        monkeypatch.setenv("UNIKMER_TPU_GREP_DEVICE", "0")
        host = tmp_path / f"host_{tag}"
        assert cli([*argv, "-o", host]) == 0
        monkeypatch.setenv("UNIKMER_TPU_GREP_DEVICE", "1")
        dev = tmp_path / f"dev_{tag}"
        assert cli([*argv, "-o", dev]) == 0
        _, hc, _ = read_unik(f"{host}.unik")
        _, dc, _ = read_unik(f"{dev}.unik")
        np.testing.assert_array_equal(hc, dc, err_msg=tag)


def test_grep_degenerate(tmp_path, genomes):
    paths, _ = genomes
    a = tmp_path / "a.k15"
    assert cli(["count", "-k", 15, "-K", "-s", paths[0], "-o", a]) == 0
    _, all_codes, _ = read_unik(f"{a}.unik")
    q = codec.decode_kmer(int(all_codes[0]), 15)
    qd = "N" + q[1:]
    out = tmp_path / "d"
    assert cli(["grep", "-q", qd, "-D", f"{a}.unik", "-o", out, "-s"]) == 0
    _, codes, _ = read_unik(f"{out}.unik")
    assert int(all_codes[0]) in codes.tolist()


def test_filter_low_complexity(tmp_path):
    # build a file with a poly-A (low-complexity) and a normal k-mer
    lines = "AAAAAAAAAAAAAAA\nACGTAGCTAGGATCC\n"
    txt = tmp_path / "kmers.txt"
    txt.write_text(lines)
    u = tmp_path / "in"
    assert cli(["dump", txt, "-o", u, "-k", 15]) == 0
    out = tmp_path / "out"
    assert cli(["filter", f"{u}.unik", "-o", out]) == 0
    _, codes, _ = read_unik(f"{out}.unik")
    assert codes.tolist() == [codec.encode_kmer("ACGTAGCTAGGATCC")]
    inv = tmp_path / "inv"
    assert cli(["filter", "-v", f"{u}.unik", "-o", inv]) == 0
    _, codes, _ = read_unik(f"{inv}.unik")
    assert codes.tolist() == [codec.encode_kmer("AAAAAAAAAAAAAAA")]


def test_encode_decode_dump_view(tmp_path, capsys):
    txt = tmp_path / "kmers.txt"
    txt.write_text("ACGTACGTACG\nTTTTTTTTTTT\n")
    u = tmp_path / "u"
    # (-s only CLAIMS sortedness, matching the reference; order is input order)
    assert cli(["dump", txt, "-o", u, "-K"]) == 0
    h, codes, _ = read_unik(f"{u}.unik")
    assert h.k == 11 and h.is_canonical
    want = [
        int(codec.canonical_np(codec.encode_kmer(s), 11))
        for s in ["ACGTACGTACG", "TTTTTTTTTTT"]
    ]
    assert codes.tolist() == want


def test_tsplit(tmp_path, genomes):
    paths, seqs = genomes
    a = tmp_path / "a.k11"
    b = tmp_path / "b.k11"
    assert cli(["count", "-k", 11, "-K", "-s", paths[0], "-o", a, "-t", 511145]) == 0
    assert cli(["count", "-k", 11, "-K", "-s", paths[1], "-o", b, "-t", 349741]) == 0
    cc = tmp_path / "cc"
    assert cli(["concat", f"{a}.unik", f"{b}.unik", "-o", cc]) == 0
    td = tmp_path / "td"
    assert cli(["tsplit", f"{cc}.unik", "-O", td, "-o", "part"]) == 0
    files = sorted(os.listdir(td))
    assert files == ["part.taxid-349741.k11.unik", "part.taxid-511145.k11.unik"]
    h, codes, _ = read_unik(str(td / files[1]))
    assert h.global_taxid == 511145
    np.testing.assert_array_equal(
        codes, np.array(expected_set([seqs[0]], 11), np.uint64)
    )


def test_locate_bed6(tmp_path, genomes, capsysbinary):
    paths, seqs = genomes
    a = tmp_path / "a.k11"
    assert cli(["count", "-k", 11, "-K", "-s", paths[0], "-o", a]) == 0
    out_txt = tmp_path / "loc.bed"
    assert cli(["locate", "-g", paths[0], f"{a}.unik", "-o", out_txt]) == 0
    lines = out_txt.read_bytes().decode().strip().split("\n")
    # every position of the genome is covered exactly once (unique k-mers
    # may repeat; each code reported at all its positions, once)
    total_kmers = len(brute_kmers([seqs[0]], 11))
    assert len(lines) == total_kmers
    f0 = lines[0].split("\t")
    assert f0[0] == "g0" and int(f0[2]) - int(f0[1]) == 11
    assert f0[4] == "0" and f0[5] == "."
    for ln in lines[:50]:
        f = ln.split("\t")
        pos = int(f[1])
        assert f[3] == seqs[0][pos : pos + 11]


def test_map_regions(tmp_path, genomes):
    paths, seqs = genomes
    a = tmp_path / "a.k11"
    assert cli(["count", "-k", 11, "-K", "-s", paths[0], "-o", a]) == 0
    bed = tmp_path / "map.bed"
    assert cli(["map", "-g", paths[0], f"{a}.unik", "-o", bed, "-m", 50, "-M"]) == 0
    lines = bed.read_text().strip().split("\n")
    # the full genome maps as one (or few) long region(s)
    assert lines
    first = lines[0].split("\t")
    assert first[0] == "g0"
    spans = sum(int(l.split("\t")[2]) - int(l.split("\t")[1]) for l in lines)
    assert spans >= len(seqs[0]) * 0.9


def test_rfilter_species_level(tmp_path, genomes):
    paths, _ = genomes
    a = tmp_path / "a.k11"
    # 511145 is "no rank" under strain in our mini taxdump
    assert cli(["count", "-k", 11, "-K", "-s", paths[0], "-o", a, "-t", 562]) == 0
    cc = tmp_path / "cc"
    assert cli(["concat", f"{a}.unik", "-o", cc]) == 0  # keeps taxids
    out = tmp_path / "sp"
    assert cli(["rfilter", f"{a}.unik", "-E", "species", "-o", out]) == 0
    _, codes, taxids = read_unik(f"{out}.unik")
    assert len(codes) > 0 and set(taxids.tolist()) == {562}
    out2 = tmp_path / "hi"
    assert cli(["rfilter", f"{a}.unik", "-H", "genus", "-o", out2]) == 0
    _, codes2, _ = read_unik(f"{out2}.unik")
    assert len(codes2) == 0  # species 562 is not higher than genus


def test_view_output_formats(tmp_path, genomes):
    paths, _ = genomes
    a = tmp_path / "a.k11"
    assert cli(["count", "-k", 11, "-K", "-s", paths[0], "-o", a, "-t", 562]) == 0
    _, codes, _ = read_unik(f"{a}.unik")
    k0 = codec.decode_kmer(int(codes[0]), 11)

    def view(*flags):
        out = tmp_path / "v.txt"
        assert cli(["view", *flags, f"{a}.unik", "-o", out]) == 0
        return out.read_text().splitlines()

    assert view()[0] == k0
    assert view("-n")[0] == f"{k0}\t{int(codes[0])}"
    assert view("-N")[0] == str(int(codes[0]))
    assert view("-t")[0] == f"{k0}\t562"
    assert view("-T")[0] == "562"
    fa_lines = view("-a")
    assert fa_lines[0] == f">{int(codes[0])}" and fa_lines[1] == k0
    fq_lines = view("-q")
    assert fq_lines[0] == f"@{int(codes[0])}"
    assert fq_lines[1] == k0 and fq_lines[2] == "+" and fq_lines[3] == "g" * 11
    # gzipped output
    gz = tmp_path / "v.txt.gz"
    assert cli(["view", f"{a}.unik", "-o", gz]) == 0
    assert gzip.open(gz, "rt").readline().strip() == k0


def test_count_syncmer_impl_compat_cli(tmp_path, genomes):
    # --syncmer-impl=compat routes to the native host kernel; output is
    # the sorted distinct compat emission stream
    from unikmer_tpu import native

    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    paths, seqs = genomes
    out = tmp_path / "compat"
    assert cli([
        "count", "-k", 31, "-S", 16, "--syncmer-impl", "compat",
        paths[0], "-o", out,
    ]) == 0
    h, codes, _ = read_unik(f"{out}.unik")
    assert h.is_hashed and h.is_canonical
    from unikmer_tpu.io.fastx import pack_files

    packed = pack_files([paths[0]], 31)
    want = np.unique(native.sketch_emit(packed.bases, 31, 16,
                                        "syncmer_compat"))
    assert np.array_equal(np.sort(codes.astype(np.uint64)), want)
    # edgar (default) differs from compat on real sequence
    out2 = tmp_path / "edgar"
    assert cli([
        "count", "-k", 31, "-S", 16, paths[0], "-o", out2,
    ]) == 0
    _, codes2, _ = read_unik(f"{out2}.unik")
    assert len(codes2) != len(codes) or not np.array_equal(
        np.sort(codes2), np.sort(codes))


def test_grep_spill_path_matches_in_ram(tmp_path, genomes, rng):
    # UNIKMER_TPU_GREP_MEM_MB tiny -> the sorted/-u/-d sink spills
    # through extsort chunks; output must match the in-RAM path exactly
    paths, seqs = genomes
    a = tmp_path / "a.k15"
    # -l keeps duplicates so -u/-d modes are non-trivial
    assert cli(["count", "-k", 15, "-K", "-l", paths[0], "-o", a]) == 0
    _, all_codes, _ = read_unik(f"{a}.unik")
    queries = [codec.decode_kmer(int(c), 15) for c in all_codes[:4]]
    outs = {}
    for label, env in (("ram", None), ("spill", "0.0001")):
        for mode_args in (["-s"], ["-u"], ["-d"], []):
            out = tmp_path / f"{label}{''.join(mode_args)}"
            old = os.environ.pop("UNIKMER_TPU_GREP_MEM_MB", None)
            if env is not None:
                os.environ["UNIKMER_TPU_GREP_MEM_MB"] = env
            try:
                assert cli(["grep", "-q", ",".join(queries), "-v",
                            f"{a}.unik", "-o", out] + mode_args) == 0
            finally:
                os.environ.pop("UNIKMER_TPU_GREP_MEM_MB", None)
                if old is not None:
                    os.environ["UNIKMER_TPU_GREP_MEM_MB"] = old
            h, codes, _ = read_unik(f"{out}.unik")
            outs[(label, tuple(mode_args))] = codes
            # streamed/merged outputs leave number unknown, like the
            # reference's writer-channel paths (grep.go:518-539)
            assert h.number in (-1, len(codes))
            assert h.is_sorted == bool(mode_args)  # -s/-u/-d set SORTED
    for mode_args in (("-s",), ("-u",), ("-d",), ()):
        np.testing.assert_array_equal(
            outs[("ram", mode_args)], outs[("spill", mode_args)],
            err_msg=f"mode {mode_args}",
        )
