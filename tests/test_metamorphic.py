"""Metamorphic CLI identities on random inputs: different command
pipelines that must produce identical text (the reference README's
md5-equivalence methodology, README.md:226-229, generalized to seeded
random data instead of the fixed genomes)."""

import numpy as np
import pytest

from unikmer_tpu.io import unik
from tests.conftest import random_dna


def cli(argv):
    from unikmer_tpu.cli.main import main

    return main([str(a) for a in argv])


def view_text(path, tmp_path, extra=()):
    out = tmp_path / "_view.txt"
    assert cli(["view", "-t", *extra, path, "-o", out]) == 0
    return out.read_text()


def write_unik(path, codes, k, taxids=None, sort=True):
    flag = unik.CANONICAL
    if sort:
        flag |= unik.SORTED
        order = np.argsort(codes, kind="stable")
        codes = codes[order]
        if taxids is not None:
            taxids = taxids[order]
    if taxids is not None:
        flag |= unik.INCLUDE_TAXID
    with open(path, "wb") as f:
        with unik.UnikWriter(
            f, k=k, flag=flag, number=len(codes),
            max_taxid=int(taxids.max()) if taxids is not None else 0,
        ) as w:
            w.write_codes(codes, taxids)


@pytest.fixture
def three_files(tmp_path, rng):
    k = 21
    paths = []
    pool = rng.integers(0, 1 << (2 * k), size=6000, dtype=np.uint64)
    for i in range(3):
        # overlapping draws so inter/common/diff are non-trivial
        codes = np.unique(rng.choice(pool, size=3000))
        p = tmp_path / f"in{i}.unik"
        write_unik(p, codes, k)
        paths.append(str(p))
    return paths, k


def test_union_equals_sort_u_equals_split_merge(tmp_path, three_files):
    paths, k = three_files
    u1 = tmp_path / "u1"
    u2 = tmp_path / "u2"
    u3 = tmp_path / "u3"
    assert cli(["union", *paths, "-s", "-o", u1]) == 0
    assert cli(["sort", *paths, "-u", "-m", "1K", "-o", u2]) == 0
    chunks = tmp_path / "chunks"
    assert cli(["split", *paths, "-O", chunks, "-m", "1K"]) == 0
    assert cli(["merge", "-D", chunks, "-u", "-o", u3]) == 0
    t1 = view_text(f"{u1}.unik", tmp_path)
    assert t1 == view_text(f"{u2}.unik", tmp_path)
    assert t1 == view_text(f"{u3}.unik", tmp_path)


def test_inter_equals_common_full_threshold(tmp_path, three_files):
    paths, k = three_files
    a = tmp_path / "a"
    b = tmp_path / "b"
    assert cli(["inter", *paths, "-o", a]) == 0
    assert cli(["common", *paths, "-n", 3, "-o", b]) == 0
    assert view_text(f"{a}.unik", tmp_path) == view_text(
        f"{b}.unik", tmp_path
    )


def test_diff_chains_like_single_subtraction(tmp_path, three_files):
    paths, k = three_files
    d1 = tmp_path / "d1"
    assert cli(["diff", *paths, "-s", "-o", d1]) == 0
    step = tmp_path / "step"
    assert cli(["diff", paths[0], paths[1], "-s", "-o", step]) == 0
    d2 = tmp_path / "d2"
    assert cli(["diff", f"{step}.unik", paths[2], "-s", "-o", d2]) == 0
    assert view_text(f"{d1}.unik", tmp_path) == view_text(
        f"{d2}.unik", tmp_path
    )


def test_head_sample_consistency(tmp_path, three_files):
    paths, k = three_files
    h = tmp_path / "h"
    assert cli(["head", "-n", 100, paths[0], "-o", h]) == 0
    s = tmp_path / "s"
    # window 1 starting at the first record = identity sampling
    assert cli(["sample", "-s", 1, "-w", 1, paths[0], "-o", s]) == 0
    head_text = view_text(f"{h}.unik", tmp_path)
    all_text = view_text(f"{s}.unik", tmp_path)
    assert all_text == view_text(paths[0], tmp_path)
    assert all_text.startswith(head_text)
    assert len(head_text.splitlines()) == 100


def test_grep_F_self_is_identity_and_invert_empty(tmp_path, three_files):
    paths, k = three_files
    hit = tmp_path / "hit"
    assert cli(["grep", "-F", paths[0], paths[0], "-s", "-o", hit]) == 0
    assert view_text(f"{hit}.unik", tmp_path) == view_text(
        paths[0], tmp_path
    )
    miss = tmp_path / "miss"
    assert cli(["grep", "-v", "-F", paths[0], paths[0], "-s", "-o",
                miss]) == 0
    assert view_text(f"{miss}.unik", tmp_path) == ""


def test_taxid_union_lca_associativity(tmp_path, rng):
    """LCA union over 3 taxid-carrying files is order-independent."""
    k = 15
    # small linear taxonomy tree via nodes.dmp in a data dir
    data = tmp_path / "db"
    data.mkdir()
    # tree: 1 <- 2 <- {4, 5}; 1 <- 3
    (data / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n"
        "2\t|\t1\t|\tsuperkingdom\t|\n"
        "3\t|\t1\t|\tsuperkingdom\t|\n"
        "4\t|\t2\t|\tgenus\t|\n"
        "5\t|\t2\t|\tgenus\t|\n"
    )
    pool = rng.integers(0, 1 << (2 * k), size=800, dtype=np.uint64)
    paths = []
    for i, t in enumerate((4, 5, 3)):
        codes = np.unique(rng.choice(pool, size=400))
        tax = np.full(len(codes), t, np.uint32)
        p = tmp_path / f"t{i}.unik"
        write_unik(p, codes, k, taxids=tax)
        paths.append(str(p))
    u1 = tmp_path / "u1"
    u2 = tmp_path / "u2"
    assert cli(["union", *paths, "-s", "--data-dir", data, "-o", u1]) == 0
    assert cli(["union", *paths[::-1], "-s", "--data-dir", data, "-o",
                u2]) == 0
    # compare with taxid column shown
    o1 = tmp_path / "o1.txt"
    o2 = tmp_path / "o2.txt"
    assert cli(["view", "-t", f"{u1}.unik", "-o", o1]) == 0
    assert cli(["view", "-t", f"{u2}.unik", "-o", o2]) == 0
    assert o1.read_text() == o2.read_text()
    # codes present in multiple files got a real LCA (an ancestor)
    taxcol = {ln.split("\t")[1] for ln in o1.read_text().splitlines()}
    assert taxcol <= {"1", "2", "3", "4", "5"}
    assert "1" in taxcol or "2" in taxcol  # some collision happened


@pytest.mark.full
def test_union_routes_identical_at_scale(tmp_path, rng):
    """4 Mbp x 3 genomes: union -s == sort -u -m == split+merge -u,
    md5-identical payloads (the README Quick Start identity at a scale
    that exercises chunk spill, the host count engine, and the native
    sorted-union tree together)."""
    import hashlib

    outs = []
    for g in range(3):
        seq = random_dna(rng, 4_000_000).decode()
        p = tmp_path / f"g{g}.fa"
        p.write_text(f">g{g}\n{seq}\n")
        o = tmp_path / f"s{g}"
        assert cli(["count", "-k", "23", "-K", "-s", p, "-o", o]) == 0
        outs.append(f"{o}.unik")
    assert cli(["union", "-s", *outs, "-o", tmp_path / "u1"]) == 0
    assert cli(["sort", "-u", "-m", "3M", *outs, "-o", tmp_path / "u2",
                "-t", tmp_path / "tmp", "--force"]) == 0
    assert cli(["split", *outs, "-O", tmp_path / "chunks", "-m", "2M",
                "-u"]) == 0
    assert cli(["merge", "--is-dir", tmp_path / "chunks", "-u",
                "-o", tmp_path / "u3"]) == 0

    def digest(p):
        with unik.UnikReader(str(p)) as r:
            codes, _ = r.read_all()
        return hashlib.md5(codes.tobytes()).hexdigest(), len(codes)

    d1 = digest(tmp_path / "u1.unik")
    assert d1 == digest(tmp_path / "u2.unik") == digest(tmp_path / "u3.unik")
    assert d1[1] > 11_000_000  # ~12M distinct 23-mers expected
