"""CLI-level conformance against the reference README fixtures
(SURVEY.md §4/§6): exact record counts and the md5 of `view -t` on the
union of the two E. coli genomes (global taxids LCA-merged through the
mini NCBI taxdump in tests/data/taxdump).

Note the reference README's globs (`*.k23.sorted.unik`) match only the
two E. coli files — A. muciniphila's file is named without `.k23` — so
union/inter/diff fixtures are over those two files, first file IAI39.
"""

import hashlib
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import GENOMES

UNION_MD5 = "4c038832209278840d4d75944b29219c"
TAXDUMP = os.path.join(os.path.dirname(__file__), "data", "taxdump")


def run_cli(argv, tmp, capture=False):
    from unikmer_tpu.cli.main import main

    old_env = dict(os.environ)
    os.environ["UNIKMER_DB"] = TAXDUMP
    try:
        if capture:
            import io
            from contextlib import redirect_stdout

            # view writes bytes to sys.stdout.buffer: spawn-free capture
            r, w = os.pipe()
            saved = os.dup(1)
            os.dup2(w, 1)
            os.close(w)
            chunks = []
            import threading

            def drain():
                while True:
                    b = os.read(r, 1 << 20)
                    if not b:
                        return
                    chunks.append(b)

            t = threading.Thread(target=drain)
            t.start()
            try:
                rc = main(argv)
            finally:
                sys.stdout.flush()
                os.dup2(saved, 1)
                os.close(saved)
            t.join()
            os.close(r)
            return rc, b"".join(chunks)
        return main(argv), b""
    finally:
        os.environ.clear()
        os.environ.update(old_env)


@pytest.mark.full
def test_full_pipeline_fixtures(tmp_path):
    tmp = str(tmp_path)
    iai = os.path.join(tmp, "iai39.k23")
    mg = os.path.join(tmp, "mg1655.k23")
    rc, _ = run_cli(
        ["count", "-k", "23", "-K", "-s", GENOMES["iai39"], "-o", iai,
         "-t", "585057"], tmp)
    assert rc == 0
    rc, _ = run_cli(
        ["count", "-k", "23", "-K", "-s", GENOMES["mg1655"], "-o", mg,
         "-t", "511145"], tmp)
    assert rc == 0

    from unikmer_tpu.io.unik import UnikReader

    assert UnikReader(iai + ".unik").header.number == 4_902_266
    assert UnikReader(mg + ".unik").header.number == 4_546_632

    un = os.path.join(tmp, "union.k23")
    it = os.path.join(tmp, "inter.k23")
    df = os.path.join(tmp, "diff.k23")
    assert run_cli(["union", iai + ".unik", mg + ".unik", "-s", "-o", un], tmp)[0] == 0
    assert run_cli(["inter", iai + ".unik", mg + ".unik", "-o", it], tmp)[0] == 0
    assert run_cli(["diff", "-s", iai + ".unik", mg + ".unik", "-o", df], tmp)[0] == 0
    assert UnikReader(un + ".unik").header.number == 6_872_728
    assert UnikReader(it + ".unik").header.number == 2_576_170
    assert UnikReader(df + ".unik").header.number == 2_326_096

    view_out = os.path.join(tmp, "union.view.txt")
    rc, _ = run_cli(["view", "-t", un + ".unik", "-o", view_out], tmp)
    assert rc == 0
    with open(view_out, "rb") as f:
        out = f.read()
    assert hashlib.md5(out).hexdigest() == UNION_MD5

    # LCA sanity: shared k-mers got E. coli species taxid 562
    taxids = {int(line.rsplit(b"\t", 1)[1]) for line in out.splitlines()}
    assert taxids == {511145, 585057, 562}


@pytest.mark.full
def test_locate_readme_example(tmp_path):
    """README.md:186-191: locate of the linear-minimizer sketch on
    A. muciniphila — byte-exact first lines (pins minimizer emission
    order, hashed locate, and BED6 rendering)."""
    tmp = str(tmp_path)
    m = os.path.join(tmp, "amuc.m")
    rc, _ = run_cli(
        ["count", "-k", "23", "-W", "5", "-H", "-K", "-l", GENOMES["amuc"],
         "-o", m], tmp)
    assert rc == 0
    from unikmer_tpu.io.unik import UnikReader

    # info table fixture: 860,900 records (README.md:198)
    n = sum(len(c) for c, _ in UnikReader(m + ".unik").iter_blocks())
    assert n == 860_900
    bed = os.path.join(tmp, "loc.bed")
    rc, _ = run_cli(["locate", "-g", GENOMES["amuc"], m + ".unik", "-o", bed], tmp)
    assert rc == 0
    with open(bed) as f:
        lines = [next(f).rstrip("\n") for _ in range(5)]
    assert lines == [
        "NC_010655.1\t2\t25\tATCTTATAAAATAACCACATAAC\t0\t.",
        "NC_010655.1\t5\t28\tTTATAAAATAACCACATAACTTA\t0\t.",
        "NC_010655.1\t6\t29\tTATAAAATAACCACATAACTTAA\t0\t.",
        "NC_010655.1\t9\t32\tAAAATAACCACATAACTTAAAAA\t0\t.",
        "NC_010655.1\t13\t36\tTAACCACATAACTTAAAAAGAAT\t0\t.",
    ]


@pytest.mark.full
def test_sort_u_and_d_readme_fixtures(tmp_path):
    """README.md:222-236: `sort -u -m 1M` over the two E. coli sorted
    sets equals the union (same md5); `sort -d` gives the 2,576,170
    repeated set (equal to the intersection of the two distinct sets)."""
    tmp = str(tmp_path)
    iai = os.path.join(tmp, "iai39.k23")
    mg = os.path.join(tmp, "mg1655.k23")
    for path, genome, tax in ((iai, GENOMES["iai39"], "585057"),
                              (mg, GENOMES["mg1655"], "511145")):
        rc, _ = run_cli(["count", "-k", "23", "-K", "-s", genome, "-o", path,
                         "-t", tax], tmp)
        assert rc == 0

    from unikmer_tpu.io.unik import UnikReader

    un2 = os.path.join(tmp, "union2.k23")
    rc, _ = run_cli(["sort", "-u", "-m", "1M", iai + ".unik", mg + ".unik",
                     "-o", un2], tmp)
    assert rc == 0
    # the README's table comes from `stats -a` which counts records (the
    # external-sort path cannot know the total before writing)
    n2 = sum(len(c) for c, _ in UnikReader(un2 + ".unik").iter_blocks())
    assert n2 == 6_872_728
    view_out = os.path.join(tmp, "u2.txt")
    assert run_cli(["view", "-t", un2 + ".unik", "-o", view_out], tmp)[0] == 0
    with open(view_out, "rb") as f:
        assert hashlib.md5(f.read()).hexdigest() == UNION_MD5

    dup = os.path.join(tmp, "dup.k23")
    rc, _ = run_cli(["sort", "-d", iai + ".unik", mg + ".unik", "-o", dup], tmp)
    assert rc == 0
    nd = sum(len(c) for c, _ in UnikReader(dup + ".unik").iter_blocks())
    assert nd == 2_576_170
    # every repeated k-mer is shared by both strains -> LCA species 562
    dview = os.path.join(tmp, "dup.txt")
    assert run_cli(["view", "-t", dup + ".unik", "-o", dview], tmp)[0] == 0
    with open(dview, "rb") as f:
        out = f.read()
    taxids = {int(l.rsplit(b"\t", 1)[1]) for l in out.splitlines()}
    assert taxids == {562}
