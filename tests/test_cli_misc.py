"""Misc command coverage: encode/decode formats, version, autocompletion,
info tabular mode."""

import os


from unikmer_tpu.ops import codec
from unikmer_tpu.ops.nthash import nthash_kmer


def cli(argv, tmp=None):
    from unikmer_tpu.cli.main import main

    return main([str(a) for a in argv])


def test_encode_plain_and_all(tmp_path):
    txt = tmp_path / "in.txt"
    txt.write_text("ACGT\nacgu\n")
    out = tmp_path / "out.txt"
    assert cli(["encode", txt, "-o", out]) == 0
    assert out.read_text().splitlines() == ["27", "27"]
    assert cli(["encode", txt, "-o", out, "-a"]) == 0
    lines = out.read_text().splitlines()
    assert lines[0] == "ACGT\tACGT\t27\t00 01 10 11"
    assert lines[1] == "acgu\tACGT\t27\t00 01 10 11"
    # canonical: ACGT is its own revcomp
    assert cli(["encode", txt, "-o", out, "-K"]) == 0
    assert out.read_text().splitlines() == ["27", "27"]


def test_encode_hashed(tmp_path):
    txt = tmp_path / "in.txt"
    txt.write_text("ACGTACGTACG\n")
    out = tmp_path / "out.txt"
    assert cli(["encode", txt, "-H", "-o", out]) == 0
    assert int(out.read_text().strip()) == nthash_kmer("ACGTACGTACG", False)
    # k>32 forces hashing
    long = "ACGT" * 10
    txt.write_text(long + "\n")
    assert cli(["encode", txt, "-o", out]) == 0
    assert int(out.read_text().strip()) == nthash_kmer(long, False)


def test_decode_roundtrip_and_overflow(tmp_path):
    txt = tmp_path / "in.txt"
    txt.write_text("27\n0\n")
    out = tmp_path / "out.txt"
    assert cli(["decode", txt, "-k", 4, "-o", out]) == 0
    assert out.read_text().splitlines() == ["ACGT", "AAAA"]
    assert cli(["decode", txt, "-k", 4, "-o", out, "-a"]) == 0
    assert out.read_text().splitlines()[0] == "27\tACGT"
    txt.write_text("300\n")
    assert cli(["decode", txt, "-k", 2, "-o", out]) != 0


def test_version(capsys):
    assert cli(["version"]) == 0
    out = capsys.readouterr().out
    assert "unikmer" in out


def test_autocompletion(tmp_path):
    f = tmp_path / "comp.sh"
    assert cli(["autocompletion", "--file", f, "--type", "bash"]) == 0
    s = f.read_text()
    assert "count" in s and "rfilter" in s and "complete" in s
    assert cli(["autocompletion", "--file", f, "--type", "zsh"]) == 0
    assert cli(["autocompletion", "--file", f, "--type", "fish"]) == 0


def test_num_force_scan_and_info_all(tmp_path, rng, capsys):
    """Unknown header Number (-1 sentinel): `num` prints -1, `num -f`
    and `info -a` count records by scanning (num.go:93-107,
    info.go:378-394)."""
    from tests.conftest import random_dna

    p = tmp_path / "g.fa"
    p.write_text(f">g\n{random_dna(rng, 300).decode()}\n")
    a = tmp_path / "a"
    # our count always knows the cardinality (batch pipeline) and sets
    # Number; concat streams with Number unknown (-1) by default
    assert cli(["count", "-k", 11, "-l", p, "-o", a]) == 0
    c = tmp_path / "c"
    assert cli(["concat", f"{a}.unik", "-o", c]) == 0
    f = f"{c}.unik"

    out = tmp_path / "num.txt"
    # num auto-scans when header Number < 0 (num.go:93-107 does too)
    assert cli(["num", f, "-o", out]) == 0
    assert out.read_text().split() == ["290"]  # 300 - 11 + 1
    assert cli(["num", f, "-f", "-n", "-b", "-o", out]) == 0
    n, name = out.read_text().split()
    assert name == "c.unik" and int(n) == 290

    tsv = tmp_path / "info.tsv"
    assert cli(["info", f, "-T", "-o", tsv]) == 0
    row = tsv.read_text().splitlines()[1].split("\t")
    hdr = tsv.read_text().splitlines()[0].split("\t")
    assert row[hdr.index("number")] == "-1"
    assert cli(["info", f, "-T", "-a", "-o", tsv]) == 0
    row = tsv.read_text().splitlines()[1].split("\t")
    assert row[hdr.index("number")] == "290"


def test_info_skip_err(tmp_path):
    """-e skips unreadable inputs instead of aborting (info.go worker
    error path)."""
    bad = tmp_path / "bad.unik"
    bad.write_bytes(b"not a unik file at all")
    out = tmp_path / "info.tsv"
    assert cli(["info", bad, "-T", "-o", out]) != 0
    assert cli(["info", bad, "-T", "-e", "-o", out]) == 0
    assert len(out.read_text().splitlines()) == 1  # header only


def test_launcher_script_and_lazy_startup(tmp_path):
    """bin/unikmer-tpu runs host-only commands without importing jax
    (the ~2.3 s import would dominate small commands)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    launcher = os.path.join(root, "bin", "unikmer-tpu")
    assert os.access(launcher, os.X_OK)
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [launcher, "version"], capture_output=True, text=True, env=env,
        timeout=60,
    )
    assert out.returncode == 0 and "unikmer-tpu" in out.stdout
    # the host-only import path must not pull jax
    probe = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.modules.pop('jax', None); "
         "import unikmer_tpu.cli.main; "
         "sys.exit(1 if 'jax' in sys.modules else 0)"],
        env=dict(env, PYTHONPATH=root), capture_output=True, timeout=60,
    )
    assert probe.returncode == 0, probe.stderr.decode()


def test_info_tabular(tmp_path, rng):
    from tests.conftest import random_dna

    p = tmp_path / "g.fa"
    p.write_text(f">g\n{random_dna(rng, 200).decode()}\n")
    a = tmp_path / "a"
    assert cli(["count", "-k", 11, "-K", "-s", p, "-o", a]) == 0
    out = tmp_path / "info.tsv"
    assert cli(["info", f"{a}.unik", "-T", "-o", out]) == 0
    lines = out.read_text().splitlines()
    header = lines[0].split("\t")
    assert header[:3] == ["file", "k", "canonical"]
    row = lines[1].split("\t")
    assert row[1] == "11" and row[2] == "✓"


def test_filter_bit_trick_vs_bruteforce(rng):
    """low_complexity_mask (windowed-popcount formulation) against the
    reference filterCode loop (filter.go:181-221), incl. non-default
    penalties."""
    import numpy as np

    from unikmer_tpu.ops.filter import low_complexity_mask

    def brute(code, k, ps=3, pd=1, th=15, w=7):
        w = min(w, k)
        b = [(code >> (2 * i)) & 3 for i in range(k)]
        sc = [pd] * k
        for i in range(1, k):
            if b[i] == b[i - 1]:
                sc[i] = ps
        for s in range(max(k - w - 1, 0) + 1):
            if sum(sc[s : s + w]) >= th:
                return True
        return False

    for k in (3, 7, 8, 23, 32):
        codes = rng.integers(0, 1 << min(2 * k, 63), size=800,
                             dtype=np.uint64)
        codes[:8] = 0  # poly-A
        for args in ((), (5, 2, 20, 5)):
            got = low_complexity_mask(codes, k, *args)
            want = np.array([brute(int(c), k, *args) for c in codes])
            assert (got == want).all(), (k, args)


def test_embedded_main_survives_command_exits(tmp_path):
    """Commands that mirror the reference's process-level exits (grep's
    zero-query os.Exit(0), grep.go:475-478) must not kill an embedding
    process: main() converts SystemExit to a return code."""
    fa = tmp_path / "g.fa"
    fa.write_text(">s\nACGTACGTACGTACGT\n")
    src = tmp_path / "s"
    assert cli(["count", "-k", 5, "-K", fa, "-o", src]) == 0
    qf = tmp_path / "q.txt"
    qf.write_text("\n")  # no usable queries
    out = tmp_path / "hit"
    assert cli(
        ["grep", "-f", qf, f"{src}.unik", "-o", out]
    ) == 0  # reference exits 0 here; embedded call must return, not raise


def test_parse_byte_size_reference_semantics():
    """Exact ParseByteSize parity (util.go:291-336): last-char-only
    unit, empty/bare-unit -> 0, negatives clamp, '1Kb' is an error."""
    import pytest as _pytest

    from unikmer_tpu.utils.sizes import parse_byte_size as p

    assert p("") == 0 and p("  \t") == 0
    assert p("K") == 0 and p("g") == 0
    assert p("123") == 123
    assert p("1.5") == 1
    assert p("-3") == 0 and p("-1K") == 0
    assert p("1k") == 1024 and p("1K") == 1024
    assert p("2M") == 2 << 20 and p("0.5G") == 1 << 29
    assert p("100b") == 100 and p("100B") == 100
    for bad in ("1Kb", "1T", "x", "1..2M"):
        with _pytest.raises(ValueError):
            p(bad)
