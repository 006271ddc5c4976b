"""Additional CLI/IO coverage: FASTQ ingest, cascade merge, grep -m/-F,
locate --circular, concat -t override."""

import os

import numpy as np
import pytest

from unikmer_tpu.io.fastx import read_fastx
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


def test_fastq_ingest(tmp_path, rng):
    reads = [random_dna(rng, 50).decode() for _ in range(20)]
    fq = tmp_path / "reads.fq"
    fq.write_text(
        "".join(
            f"@r{i} desc\n{s}\n+\n{'I' * len(s)}\n" for i, s in enumerate(reads)
        )
    )
    recs = list(read_fastx(str(fq)))
    assert len(recs) == 20
    assert recs[0].id == b"r0" and recs[0].seq == reads[0].encode()
    out = tmp_path / "o"
    assert cli(["count", "-k", 11, "-K", "-s", fq, "-o", out]) == 0
    _, codes, _ = read_unik(f"{out}.unik")
    want = sorted({codec.encode_kmer(s) for s in brute_kmers(reads, 11, True)})
    np.testing.assert_array_equal(codes, np.array(want, np.uint64))


def test_merge_cascade_rounds(tmp_path, rng):
    # 6 chunk files merged with max-open-files=2 -> multi-round cascade
    seq = random_dna(rng, 4000).decode()
    p = tmp_path / "g.fa"
    p.write_text(f">g\n{seq}\n")
    a = tmp_path / "a"
    assert cli(["count", "-k", 11, "-K", p, "-o", a]) == 0
    chunks = tmp_path / "chunks"
    assert cli(["split", f"{a}.unik", "-O", chunks, "-m", "512"]) == 0
    n_chunks = len(os.listdir(chunks))
    assert n_chunks >= 5
    m1 = tmp_path / "m1"
    assert cli(["merge", "-D", chunks, "-u", "-o", m1, "-M", 2,
                "-t", tmp_path, "--force"]) == 0
    m2 = tmp_path / "m2"
    assert cli(["merge", "-D", chunks, "-u", "-o", m2]) == 0
    _, c1, _ = read_unik(f"{m1}.unik")
    _, c2, _ = read_unik(f"{m2}.unik")
    np.testing.assert_array_equal(c1, c2)
    want = sorted({codec.encode_kmer(s) for s in brute_kmers([seq], 11, True)})
    np.testing.assert_array_equal(c1, np.array(want, np.uint64))


def test_grep_multiple_outfiles_and_unik_query(tmp_path, rng):
    seq1, seq2 = (random_dna(rng, 800).decode() for _ in range(2))
    pa = tmp_path / "a.fa"
    pa.write_text(f">a\n{seq1}\n")
    pb = tmp_path / "b.fa"
    pb.write_text(f">b\n{seq2}\n")
    a = tmp_path / "a.k11"
    b = tmp_path / "b.k11"
    assert cli(["count", "-k", 11, "-K", "-s", pa, "-o", a]) == 0
    assert cli(["count", "-k", 11, "-K", "-s", pb, "-o", b]) == 0
    # query = set a itself, via -F
    od = tmp_path / "grepout"
    assert cli(["grep", "-F", f"{a}.unik", f"{a}.unik", f"{b}.unik",
                "-m", "-O", od, "-s"]) == 0
    files = sorted(os.listdir(od))
    assert files == ["a.k11.unik.grep.unik", "b.k11.unik.grep.unik"]
    _, ca, _ = read_unik(str(od / files[0]))
    _, acodes, _ = read_unik(f"{a}.unik")
    np.testing.assert_array_equal(ca, acodes)  # a ∩ a = a
    _, cb, _ = read_unik(str(od / files[1]))
    inter = np.intersect1d(acodes, read_unik(f"{b}.unik")[1])
    np.testing.assert_array_equal(cb, inter)


def test_locate_circular(tmp_path, rng):
    seq = random_dna(rng, 300).decode()
    p = tmp_path / "g.fa"
    p.write_text(f">g\n{seq}\n")
    a = tmp_path / "a"
    assert cli(["count", "-k", 11, "-K", "-s", "--circular", p, "-o", a]) == 0
    bed = tmp_path / "loc.bed"
    assert cli(["locate", "-g", p, "--circular", f"{a}.unik", "-o", bed]) == 0
    lines = bed.read_text().strip().split("\n")
    # every position incl. wrap-around start positions is present
    assert len(lines) == len(seq)


def test_concat_taxid_override(tmp_path, rng):
    seq = random_dna(rng, 300).decode()
    p = tmp_path / "g.fa"
    p.write_text(f">g\n{seq}\n")
    a = tmp_path / "a"
    assert cli(["count", "-k", 11, "-K", "-s", p, "-o", a, "-t", 511145]) == 0
    cc = tmp_path / "cc"
    assert cli(["concat", f"{a}.unik", "-t", 562, "-o", cc, "-n", 42]) == 0
    h, codes, taxids = read_unik(f"{cc}.unik")
    assert h.global_taxid == 562 and not h.is_include_taxid
    assert h.number == 42


def test_stdin_stdout_pipe(tmp_path, rng):
    """Real pipe usage via subprocess: count to stdout | view from stdin."""
    import subprocess
    import sys

    seq = random_dna(rng, 400).decode()
    p = tmp_path / "g.fa"
    p.write_text(f">g\n{seq}\n")
    env = dict(
        os.environ,
        PYTHONPATH="/root/repo:/root/.axon_site",
        UNIKMER_TPU_PLATFORM="cpu",
    )
    r1 = subprocess.run(
        [sys.executable, "-m", "unikmer_tpu.cli.main", "count", "-k", "11",
         "-K", "-s", str(p), "-o", "-"],
        env=env, capture_output=True, timeout=300,
    )
    assert r1.returncode == 0 and len(r1.stdout) > 50
    r2 = subprocess.run(
        [sys.executable, "-m", "unikmer_tpu.cli.main", "view", "-"],
        env=env, input=r1.stdout, capture_output=True, timeout=300,
    )
    assert r2.returncode == 0
    lines = r2.stdout.decode().strip().split("\n")
    want = sorted({
        codec.encode_kmer(s) for s in brute_kmers([seq], 11, canonical=True)
    })
    assert len(lines) == len(want)
    assert lines[0] == codec.decode_kmer(want[0], 11)


def test_hashed_k51_roundtrip(tmp_path, rng):
    """k>32 forces ntHash; dump --hashed accepts raw hash values."""
    seq = random_dna(rng, 500).decode()
    p = tmp_path / "g.fa"
    p.write_text(f">g\n{seq}\n")
    a = tmp_path / "a"
    assert cli(["count", "-k", 51, "-K", "-s", p, "-o", a]) == 0
    h, codes, _ = read_unik(f"{a}.unik")
    assert h.is_hashed and h.k == 51 and len(codes) > 0
    # view prints hash integers; dump --hashed reads them back
    vw = tmp_path / "v.txt"
    assert cli(["view", f"{a}.unik", "-o", vw]) == 0
    d = tmp_path / "d"
    assert cli(["dump", vw, "--hashed", "-k", 51, "-s", "-K", "-o", d]) == 0
    h2, codes2, _ = read_unik(f"{d}.unik")
    assert h2.is_hashed
    np.testing.assert_array_equal(codes2, codes)


def test_grep_query_unik_k_mismatch_dies(tmp_path, rng):
    # grep.go:553-554: input k must equal the -F query file's k; and
    # query files must be mutually compatible (grep.go:229-240)
    from tests.conftest import random_dna

    fa = tmp_path / "g.fa"
    fa.write_text(f">s\n{random_dna(rng, 150).decode()}\n")
    a21, a31 = tmp_path / "a21", tmp_path / "a31"
    assert cli(["count", "-k", 21, "-K", fa, "-o", a21]) == 0
    assert cli(["count", "-k", 31, "-K", fa, "-o", a31]) == 0
    out = tmp_path / "o"
    assert cli(
        ["grep", "-F", f"{a21}.unik", f"{a31}.unik", "-o", out]
    ) != 0
    assert cli(
        ["grep", "-F", f"{a21}.unik", "-F", f"{a31}.unik",
         f"{a21}.unik", "-o", out]
    ) != 0
    # equal k still works
    assert cli(
        ["grep", "-F", f"{a21}.unik", f"{a21}.unik", "-o", out]
    ) == 0


def test_grep_taxid_info_mismatch_dies(tmp_path, rng):
    # grep.go:556-562: inputs must agree on taxid-info presence unless
    # -I/--ignore-taxid
    from tests.conftest import random_dna

    fa = tmp_path / "g.fa"
    fa.write_text(f">s\n{random_dna(rng, 150).decode()}\n")
    plain, taxed = tmp_path / "p", tmp_path / "t"
    assert cli(["count", "-k", 21, "-K", fa, "-o", plain]) == 0
    assert cli(["count", "-k", 21, "-K", fa, "-o", taxed, "-t", 562]) == 0
    out = tmp_path / "o"
    q = tmp_path / "q.txt"
    q.write_text("A" * 21 + "\n")
    argv = ["grep", "-f", q, f"{plain}.unik", f"{taxed}.unik", "-o", out]
    assert cli(argv) != 0
    assert cli(["grep", "-I"] + argv[1:]) == 0


@pytest.mark.parametrize(
    "argv",
    [
        ["view"], ["sort"], ["merge"], ["concat"], ["head"], ["sample"],
        ["split"],
    ],
)
def test_taxid_info_mismatch_dies_everywhere(tmp_path, rng, argv):
    """Multi-file commands must die when inputs disagree on taxid-info
    presence unless -I (the shared block in sort.go:217-222 etc.)."""
    from tests.conftest import random_dna

    fa = tmp_path / "g.fa"
    fa.write_text(f">s\n{random_dna(rng, 100).decode()}\n")
    plain, taxed = tmp_path / "p", tmp_path / "t"
    assert cli(["count", "-k", 11, "-K", "-s", fa, "-o", plain]) == 0
    assert cli(["count", "-k", 11, "-K", "-s", fa, "-o", taxed,
                "-t", 562]) == 0
    inputs = [f"{plain}.unik", f"{taxed}.unik"]
    if argv[0] == "head":
        argv = argv + ["-n", 10**6]  # default -n 10 stops before file 2
    outs = (["-o", tmp_path / "o"] if argv[0] != "split"
            else ["-O", tmp_path / "od"])
    assert cli(argv + inputs + outs) != 0
    assert cli(argv + ["-I"] + inputs + outs + (
        ["--force"] if argv[0] == "split" else [])) == 0
