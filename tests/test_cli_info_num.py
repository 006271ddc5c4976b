"""Direct tests for info/num: unknown-Number sentinel, -a/-f full
scans, file-name/basename output modes, multi-file tables
(unikmer/cmd/info.go:378-421, num.go:84-119)."""

import os

import numpy as np

from unikmer_tpu.io import unik


def cli(argv, capsys=None):
    from unikmer_tpu.cli.main import main

    return main([str(a) for a in argv])


def make_unik(path, n=60, k=11, number_known=True, taxids=False,
              description=b"", global_taxid=0):
    rng = np.random.default_rng(3)
    codes = np.unique(rng.integers(0, 1 << (2 * k), size=n, dtype=np.uint64))
    flag = unik.CANONICAL | unik.SORTED
    if taxids:
        flag |= unik.INCLUDE_TAXID
    with unik.UnikWriter(
        open(path, "wb"), k=k, flag=flag, max_taxid=999,
        number=len(codes) if number_known else -1,
        description=description, global_taxid=global_taxid,
    ) as w:
        w.write_codes(
            codes,
            rng.integers(1, 999, len(codes), np.uint32) if taxids else None,
        )
    return len(codes)


def test_info_unknown_number_and_scan(tmp_path, capsys):
    p = tmp_path / "u.unik"
    n = make_unik(p, number_known=False)
    assert cli(["info", p, "-T"]) == 0
    row = capsys.readouterr().out.splitlines()[1].split("\t")
    assert row[-2] == "-1"  # unknown sentinel, README.md:269
    assert cli(["info", p, "-T", "-a"]) == 0
    row = capsys.readouterr().out.splitlines()[1].split("\t")
    assert row[-2] == f"{n:,}"


def test_info_description_and_global_taxid(tmp_path, capsys):
    p = tmp_path / "d.unik"
    make_unik(p, description=b"hello fixture", global_taxid=562)
    assert cli(["info", p, "-T"]) == 0
    row = capsys.readouterr().out.splitlines()[1]
    assert "hello fixture" in row and "562" in row


def test_info_multiple_files_mixed_k(tmp_path, capsys):
    a, b = tmp_path / "a.unik", tmp_path / "b.unik"
    make_unik(a, k=11)
    make_unik(b, k=23, taxids=True)
    assert cli(["info", a, b, "-T"]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert len(lines) == 3  # header + 2 rows, no compat enforcement
    assert lines[1].split("\t")[1] == "11"
    assert lines[2].split("\t")[1] == "23"


def test_num_scans_when_unknown(tmp_path, capsys):
    """num without -f must still scan when the header Number is unknown
    (reference: reader.Number < 0 || force, num.go:93)."""
    p = tmp_path / "u.unik"
    n = make_unik(p, number_known=False)
    assert cli(["num", p]) == 0
    assert capsys.readouterr().out.strip() == str(n)


def test_num_filename_and_basename(tmp_path, capsys):
    p = tmp_path / "x.unik"
    n = make_unik(p)
    assert cli(["num", "-n", p]) == 0
    assert capsys.readouterr().out.strip() == f"{n}\t{p}"
    assert cli(["num", "-n", "-b", p]) == 0
    assert capsys.readouterr().out.strip() == f"{n}\tx.unik"


def test_num_out_file_and_multi(tmp_path, capsys):
    a, b = tmp_path / "a.unik", tmp_path / "b.unik"
    na, nb = make_unik(a), make_unik(b, n=30)
    out = tmp_path / "counts.txt"
    assert cli(["num", a, b, "-o", out]) == 0
    assert open(out).read().splitlines() == [str(na), str(nb)]
