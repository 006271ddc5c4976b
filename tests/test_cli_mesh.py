"""CLI --mesh routing: count/union/inter/diff through the sharded
engine on the virtual 8-device CPU mesh must match the single-device
paths byte-for-byte (VERDICT round-1 next #2)."""

import os

import numpy as np
import pytest

from unikmer_tpu.io.unik import UnikReader
from tests.conftest import random_dna

TAXDUMP = os.path.join(os.path.dirname(__file__), "data", "taxdump")


def cli(argv):
    from unikmer_tpu.cli.main import main

    os.environ["UNIKMER_DB"] = TAXDUMP
    return main([str(a) for a in argv])


def read_codes(path):
    with UnikReader(path) as r:
        codes, _ = r.read_all()
        return np.asarray(codes)


@pytest.fixture()
def genome_files(tmp_path, rng):
    paths = []
    shared = random_dna(rng, 1500).decode()
    for i in range(3):
        seqs = [shared] + [random_dna(rng, n).decode()
                           for n in (2000 + 311 * i, 900)]
        p = tmp_path / f"g{i}.fa"
        p.write_text("".join(f">s{j}\n{s}\n" for j, s in enumerate(seqs)))
        paths.append(str(p))
    return paths


@pytest.mark.parametrize("extra", [[], ["-H"], ["-d"], ["-u"],
                                   ["-H", "-D", "3"],
                                   ["-W", "5"], ["-S", "8"],
                                   ["-W", "5", "-d"], ["-W", "5", "-u"],
                                   ["-W", "5", "-D", "3"],
                                   ["-S", "8", "-d"]])
def test_count_mesh_matches_single(tmp_path, genome_files, extra):
    a = tmp_path / "single"
    b = tmp_path / "mesh"
    assert cli(["count", "-k", 21, "-K", "-s", genome_files[0], "-o", a,
                *extra]) == 0
    assert cli(["count", "-k", 21, "-K", "-s", genome_files[0], "-o", b,
                "--mesh", 4, *extra]) == 0
    np.testing.assert_array_equal(
        read_codes(f"{a}.unik"), read_codes(f"{b}.unik"))


def test_count_mesh_multirecord_sketch(tmp_path, genome_files):
    # minimizer reigns must reset at record boundaries identically on
    # the mesh (records land mid-shard and at shard edges)
    a = tmp_path / "ms"
    b = tmp_path / "mm"
    for extra in (["-W", "7"], ["-S", "11"]):
        assert cli(["count", "-k", 21, "-K", "-s", *genome_files, "-o", a,
                    *extra]) == 0
        assert cli(["count", "-k", 21, "-K", "-s", *genome_files, "-o", b,
                    "--mesh", 4, *extra]) == 0
        np.testing.assert_array_equal(
            read_codes(f"{a}.unik"), read_codes(f"{b}.unik"),
            err_msg=str(extra))


def test_count_mesh_stream_spill(tmp_path, genome_files, monkeypatch):
    # the mesh stream shares the single-device beyond-RAM spill: a tiny
    # cap forces SpilledCount, output must stay byte-identical
    a = tmp_path / "nospill"
    b = tmp_path / "spill"
    assert cli(["count", "-k", 21, "-K", "-s", *genome_files, "-o", a,
                "--mesh", 4]) == 0
    monkeypatch.setenv("UNIKMER_TPU_COUNT_MEM_MB", "0.02")
    assert cli(["count", "-k", 21, "-K", "-s", *genome_files, "-o", b,
                "--mesh", 4]) == 0
    np.testing.assert_array_equal(
        read_codes(f"{a}.unik"), read_codes(f"{b}.unik"))


def test_set_ops_mesh_match_single(tmp_path, genome_files):
    uniks = []
    for i, g in enumerate(genome_files):
        out = tmp_path / f"u{i}"
        assert cli(["count", "-k", 19, "-K", "-s", g, "-o", out]) == 0
        uniks.append(f"{out}.unik")
    for op, args in (
        ("union", ["-s"]),
        ("inter", []),
        ("diff", ["-s"]),
    ):
        a = tmp_path / f"{op}.single"
        b = tmp_path / f"{op}.mesh"
        assert cli([op, *uniks, "-o", a, *args]) == 0
        assert cli([op, *uniks, "-o", b, "--mesh", 4, *args]) == 0
        np.testing.assert_array_equal(
            read_codes(f"{a}.unik"), read_codes(f"{b}.unik"), err_msg=op)


def test_common_mesh_matches_single(tmp_path, genome_files):
    uniks = []
    for i, g in enumerate(genome_files):
        out = tmp_path / f"c{i}"
        assert cli(["count", "-k", 17, "-K", "-s", g, "-o", out]) == 0
        uniks.append(f"{out}.unik")
    a = tmp_path / "common.single"
    b = tmp_path / "common.mesh"
    assert cli(["common", *uniks, "-n", 2, "-o", a]) == 0
    assert cli(["common", *uniks, "-n", 2, "-o", b, "--mesh", 4]) == 0
    np.testing.assert_array_equal(
        read_codes(f"{a}.unik"), read_codes(f"{b}.unik"))


def read_codes_taxids(path):
    with UnikReader(path) as r:
        codes, taxids = r.read_all()
        if taxids is None and r.header.has_global_taxid:
            taxids = np.full(len(codes), r.header.global_taxid, np.uint32)
        return np.asarray(codes), np.asarray(taxids)


@pytest.fixture()
def taxid_uniks(tmp_path, genome_files):
    uniks = []
    for g, t in zip(genome_files, (511145, 585057, 349741)):
        out = tmp_path / f"t{t}"
        assert cli(["count", "-k", 19, "-K", "-s", g, "-o", out,
                    "-t", t]) == 0
        uniks.append(f"{out}.unik")
    return uniks


@pytest.mark.parametrize("vocab_cap", [None, "0"])
def test_taxid_set_ops_mesh_match_single(tmp_path, taxid_uniks,
                                         monkeypatch, vocab_cap):
    """union/inter/diff/common --mesh over taxid-carrying inputs must
    byte-match the host engine, through BOTH vocabulary LCA tiers
    (closure table; vocab_cap=0 forces the path matrix)."""
    if vocab_cap is not None:
        monkeypatch.setenv("UNIKMER_TPU_TAXID_VOCAB_MAX", vocab_cap)
    for op, args in (
        ("union", ["-s"]),
        ("inter", []),
        ("diff", ["-s"]),
        ("common", ["-n", 2]),
    ):
        a = tmp_path / f"{op}{bool(vocab_cap)}.single"
        b = tmp_path / f"{op}{bool(vocab_cap)}.mesh"
        assert cli([op, *taxid_uniks, "-o", a, *args]) == 0
        assert cli([op, *taxid_uniks, "-o", b, "--mesh", 4, *args]) == 0
        ca, ta = read_codes_taxids(f"{a}.unik")
        cb, tb = read_codes_taxids(f"{b}.unik")
        np.testing.assert_array_equal(ca, cb, err_msg=op)
        np.testing.assert_array_equal(ta, tb, err_msg=op)


def test_mix_taxid_inter_mesh_matches_single(tmp_path, genome_files,
                                             taxid_uniks):
    # one taxid-less input (--mix-taxid): the zero column must pass the
    # other side's taxids through identically on the mesh
    plain = tmp_path / "plain"
    assert cli(["count", "-k", 19, "-K", "-s", genome_files[0],
                "-o", plain]) == 0
    a = tmp_path / "mix.single"
    b = tmp_path / "mix.mesh"
    argv = ["inter", "-m", taxid_uniks[1], f"{plain}.unik"]
    assert cli([*argv, "-o", a]) == 0
    assert cli([*argv, "-o", b, "--mesh", 4]) == 0
    ca, ta = read_codes_taxids(f"{a}.unik")
    cb, tb = read_codes_taxids(f"{b}.unik")
    np.testing.assert_array_equal(ca, cb)
    np.testing.assert_array_equal(ta, tb)


@pytest.mark.parametrize("vocab_cap", [None, "0"])
@pytest.mark.parametrize("extra", [[], ["-u"], ["-d"], ["-W", "5"]])
def test_count_taxid_mesh_matches_single(tmp_path, genome_files,
                                         monkeypatch, vocab_cap, extra):
    """count -T --mesh (sharded packed-key build, both LCA tiers) must
    byte-match the single-device -T engine."""
    fa = tmp_path / "tagged.fa"
    taxids = (511145, 585057, 349741)
    with open(fa, "w") as out:
        for g, t in zip(genome_files, taxids):
            for i, line in enumerate(open(g).read().splitlines()):
                if line.startswith(">"):
                    out.write(f"{line} taxid|{t}\n")
                else:
                    out.write(line + "\n")
    if vocab_cap is not None:
        monkeypatch.setenv("UNIKMER_TPU_TAXID_VOCAB_MAX", vocab_cap)
    argv = ["count", "-k", 19, "-K", "-s", "-T", "-r", r"taxid\|(\d+)",
            str(fa), *extra]
    a = tmp_path / "single"
    b = tmp_path / "mesh"
    assert cli([*argv, "-o", a]) == 0
    assert cli([*argv, "-o", b, "--mesh", 4]) == 0
    ca, ta = read_codes_taxids(f"{a}.unik")
    cb, tb = read_codes_taxids(f"{b}.unik")
    np.testing.assert_array_equal(ca, cb)
    np.testing.assert_array_equal(ta, tb)


def test_mesh_capacity_retry(tmp_path, genome_files, monkeypatch):
    # a deliberately tiny initial capacity forces the dropped-counter
    # retry loop (doubling until no overflow)
    from unikmer_tpu.io.fastx import pack_files
    from unikmer_tpu.models.count import CountConfig
    from unikmer_tpu.parallel.sharded import mesh_count_distinct

    packed = pack_files([genome_files[0]], 21)
    cfg = CountConfig(k=21, canonical=True)
    want = mesh_count_distinct(packed.bases, cfg, 4)
    got = mesh_count_distinct(packed.bases, cfg, 4, capacity=16)
    np.testing.assert_array_equal(got, want)


def test_count_mesh_too_many_devices_dies(tmp_path, genome_files):
    out = tmp_path / "x"
    assert cli(["count", "-k", 21, "-K", genome_files[0], "-o", out,
                "--mesh", 64]) != 0


@pytest.mark.full
def test_mesh_full_genome_conformance(tmp_path):
    """README fixtures through --mesh 4 on the real genomes: counts and
    the union md5 must stay exact (SURVEY §6)."""
    import hashlib
    import subprocess
    import sys

    OLD = "/root/reference/testdata/old"
    uniks = []
    for name, n_want in (("Ecoli-IAI39", 4902266), ("Ecoli-MG1655", 4546632)):
        out = tmp_path / name
        assert cli(["count", "-k", 23, "-K", "-s", f"{OLD}/{name}.fasta.gz",
                    "-o", out, "--mesh", 4]) == 0
        with UnikReader(f"{out}.unik") as r:
            assert r.header.number == n_want, name
        uniks.append(f"{out}.unik")
    u = tmp_path / "union"
    assert cli(["union", *uniks, "-s", "-o", u, "--mesh", 4]) == 0
    with UnikReader(f"{u}.unik") as r:
        assert r.header.number == 6872728


def test_mesh_sentinel_code_exact(tmp_path, rng):
    # a 32-base poly-T run at k=32 non-canonical encodes to 2^64-1 ==
    # the padding sentinel; the mesh path must keep it exactly like the
    # single-device path's collision accounting (ops/sort)
    seq = random_dna(rng, 500).decode() + "T" * 40 + random_dna(rng, 200).decode()
    p = tmp_path / "polyt.fa"
    p.write_text(f">s\n{seq}\n")
    a = tmp_path / "single"
    b = tmp_path / "mesh"
    assert cli(["count", "-k", 32, "-s", str(p), "-o", a]) == 0
    assert cli(["count", "-k", 32, "-s", str(p), "-o", b, "--mesh", 4]) == 0
    ca, cb = read_codes(f"{a}.unik"), read_codes(f"{b}.unik")
    assert ca[-1] == np.uint64(0xFFFFFFFFFFFFFFFF)  # poly-T present
    np.testing.assert_array_equal(ca, cb)
    # and through the set ops
    u = tmp_path / "u"
    assert cli(["union", f"{a}.unik", f"{b}.unik", "-s", "-o", u,
                "--mesh", 4]) == 0
    np.testing.assert_array_equal(read_codes(f"{u}.unik"), ca)


def test_mesh_one_trivial(tmp_path, genome_files):
    # --mesh 1: the trivial 1-device mesh runs the SAME shard_map
    # programs as N-device meshes (the cheapest real-hardware de-risk
    # of the scale-out path, VERDICT round-3 next #6) and must be
    # byte-identical to the single-device route
    a = tmp_path / "single"
    b = tmp_path / "mesh1"
    assert cli(["count", "-k", 21, "-K", "-s", genome_files[0],
                "-o", a]) == 0
    assert cli(["count", "-k", 21, "-K", "-s", genome_files[0],
                "-o", b, "--mesh", 1]) == 0
    np.testing.assert_array_equal(
        read_codes(f"{a}.unik"), read_codes(f"{b}.unik"))
    u1 = tmp_path / "u1"
    u2 = tmp_path / "u2"
    assert cli(["union", "-s", f"{a}.unik", f"{b}.unik", "-o", u1]) == 0
    assert cli(["union", "-s", f"{a}.unik", f"{b}.unik", "-o", u2,
                "--mesh", 1]) == 0
    np.testing.assert_array_equal(
        read_codes(f"{u1}.unik"), read_codes(f"{u2}.unik"))
