"""Round-trip sweep over k, mirroring the reference's testdata/cr2.sh:
count -> head -> view -> dump -> sort must reproduce consistent sets,
and sorted re-encoding must round-trip byte-identically at the text
level.  (The reference uses this script as its implicit consistency
test, SURVEY.md §4.)"""

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


@pytest.mark.parametrize("k", [11, 17, 25, 31])
def test_cr2_style_roundtrip(tmp_path, rng, k):
    seq = random_dna(rng, 5000).decode()
    genome = tmp_path / "g.fa"
    genome.write_text(f">g\n{seq}\n")

    counted = tmp_path / f"c{k}"
    assert cli(["count", "-k", k, "-K", "-s", genome, "-o", counted]) == 0
    codes = read_codes(f"{counted}.unik")

    # head -n 1000 -> view -> dump -> sort: same first-1000 set
    head = tmp_path / "head"
    assert cli(["head", "-n", 1000, f"{counted}.unik", "-o", head]) == 0
    view_txt = tmp_path / "head.txt"
    assert cli(["view", f"{head}.unik", "-o", view_txt]) == 0
    dumped = tmp_path / "dumped"
    assert cli(["dump", view_txt, "-K", "-o", dumped]) == 0
    sorted_ = tmp_path / "sorted"
    assert cli(["sort", "-u", f"{dumped}.unik", "-o", sorted_]) == 0
    got = read_codes(f"{sorted_}.unik")
    np.testing.assert_array_equal(got, codes[: min(1000, len(codes))])

    # full view -> dump -s round trip reproduces the whole sorted set
    full_txt = tmp_path / "full.txt"
    assert cli(["view", f"{counted}.unik", "-o", full_txt]) == 0
    redump = tmp_path / "redump"
    assert cli(["dump", full_txt, "-K", "-s", "-o", redump]) == 0
    np.testing.assert_array_equal(read_codes(f"{redump}.unik"), codes)

    # view of the re-dumped file is byte-identical text
    full_txt2 = tmp_path / "full2.txt"
    assert cli(["view", f"{redump}.unik", "-o", full_txt2]) == 0
    assert full_txt.read_bytes() == full_txt2.read_bytes()

    # compact encoding (k<=32, unhashed) round-trips too
    compact = tmp_path / "compact"
    assert cli(["head", "-n", 500, "-c", f"{counted}.unik", "-o", compact]) == 0
    # head copies the input's flags; recount unsorted compact instead
    cpt = tmp_path / "cpt"
    assert cli(["count", "-k", k, "-K", "-c", genome, "-o", cpt]) == 0
    h = UnikReader(f"{cpt}.unik").header
    assert h.is_compact and not h.is_sorted
    np.testing.assert_array_equal(
        np.sort(read_codes(f"{cpt}.unik")), codes
    )
