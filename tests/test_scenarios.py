"""End-to-end scenario tests mirroring the BASELINE.json config list:
hashed k=51 scaled sketches with diff/common across 10 genomes, and the
split/merge external-sort pipeline over many genomes."""

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
        return codes


@pytest.fixture(scope="module")
def ten_genomes(tmp_path_factory, rng):
    tmp = tmp_path_factory.mktemp("genomes")
    core = random_dna(rng, 1500).decode()  # shared backbone
    paths = []
    for i in range(10):
        own = random_dna(rng, 800).decode()
        p = tmp / f"g{i:02d}.fa"
        p.write_text(f">g{i}\n{core}{own}\n")
        paths.append(str(p))
    return paths, core


def test_k51_scaled_diff_common_across_10_genomes(tmp_path, ten_genomes):
    paths, core = ten_genomes
    outs = []
    for i, p in enumerate(paths):
        o = tmp_path / f"s{i:02d}"
        assert cli(["count", "-k", 51, "-K", "-s", "-D", 4, p, "-o", o]) == 0
        outs.append(f"{o}.unik")
        h = UnikReader(outs[-1]).header
        assert h.is_hashed and h.is_scaled and h.scale == 4
    # common across all 10: at least the core-backbone sketch k-mers
    com = tmp_path / "common"
    assert cli(["common", *outs, "-n", 10, "-o", com]) == 0
    common_codes = read_codes(f"{com}.unik")
    assert len(common_codes) > 0
    # diff g0 - (g1..g9): none of the core k-mers survive
    dif = tmp_path / "diff"
    assert cli(["diff", outs[0], *outs[1:], "-s", "-o", dif]) == 0
    diff_codes = read_codes(f"{dif}.unik")
    assert len(np.intersect1d(diff_codes, common_codes)) == 0
    assert len(diff_codes) > 0  # g0's private sequence remains
    # union is consistent: |union| == |common-of-1| over all files
    un = tmp_path / "union"
    assert cli(["union", *outs, "-s", "-o", un]) == 0
    u = read_codes(f"{un}.unik")
    all_codes = np.unique(np.concatenate([read_codes(o) for o in outs]))
    np.testing.assert_array_equal(u, all_codes)


def test_split_merge_pipeline_many_genomes(tmp_path, rng):
    # 20 small genomes -> per-genome counts -> split into chunks ->
    # merge -D == direct sort -u over everything
    outs = []
    for i in range(20):
        seq = random_dna(rng, 600).decode()
        p = tmp_path / f"m{i:02d}.fa"
        p.write_text(f">m{i}\n{seq}\n")
        o = tmp_path / f"m{i:02d}"
        assert cli(["count", "-k", 17, "-K", p, "-o", o]) == 0
        outs.append(f"{o}.unik")
    chunks = tmp_path / "chunks"
    assert cli(["split", *outs, "-O", chunks, "-m", "3K", "-u"]) == 0
    merged = tmp_path / "merged"
    assert cli(["merge", "-D", chunks, "-u", "-o", merged, "-M", 3,
                "-t", tmp_path, "--force"]) == 0
    direct = tmp_path / "direct"
    assert cli(["sort", "-u", *outs, "-o", direct]) == 0
    np.testing.assert_array_equal(
        read_codes(f"{merged}.unik"), read_codes(f"{direct}.unik")
    )
