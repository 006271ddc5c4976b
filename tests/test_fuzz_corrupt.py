"""Corruption-robustness fuzzer: mutated/truncated/garbage .unik files
and malformed text inputs must produce a clean CLI error (nonzero exit,
[ERROR] log — the reference's checkError/exit(-1) contract,
unikmer/cmd/util-cli.go:39-44), never an uncaught traceback or a hang.

A mutation that happens to leave the file valid (e.g. a bit flip inside
an uncompressed payload byte) may legitimately succeed; the invariant
under fuzz is "no third outcome"."""

import io
import os
import zlib

import numpy as np
import pytest

from unikmer_tpu.io import unik


def run_cli(argv, tmp):
    """Returns the exit code; SystemExit counts as its code."""
    from unikmer_tpu.cli.main import main

    try:
        rc = main([str(a) for a in argv])
    except SystemExit as e:  # utils.log.die
        rc = e.code if isinstance(e.code, int) else 1
    return rc


def make_valid(tmp, compress, taxids, sorted_=True, n=300):
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 1 << 46, size=n, dtype=np.uint64)
    if sorted_:
        codes = np.unique(codes)
    flag = unik.CANONICAL | (unik.SORTED if sorted_ else 0)
    if taxids:
        flag |= unik.INCLUDE_TAXID
    path = str(tmp / f"valid_{compress}_{taxids}.unik")
    with unik.UnikWriter(
        open(path, "wb"), k=23, flag=flag, compress=compress,
        max_taxid=9999,
    ) as w:
        if taxids:
            w.write_codes(codes, rng.integers(1, 9999, len(codes), np.uint32))
        else:
            w.write_codes(codes)
    return path


CMDS = [
    lambda p, o: ["view", p, "-o", o],
    lambda p, o: ["num", "-f", p],
    lambda p, o: ["info", "-a", p],
    lambda p, o: ["head", "-n", 5, p, "-o", o],
    lambda p, o: ["sort", "-u", p, "-o", o],
]


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize("taxids", [True, False])
def test_fuzz_truncations(tmp_path, compress, taxids):
    src = make_valid(tmp_path, compress, taxids)
    data = open(src, "rb").read()
    rng = np.random.default_rng(7)
    cuts = sorted(
        set(rng.integers(0, len(data), size=25).tolist()) | {0, 1, 8, len(data) - 1}
    )
    for cut in cuts:
        p = tmp_path / "t.unik"
        p.write_bytes(data[:cut])
        for mk in CMDS[:3]:
            rc = run_cli(mk(p, tmp_path / "o"), tmp_path)
            assert rc != 0, (cut, mk(p, "o"))


@pytest.mark.parametrize("compress", [True, False])
def test_fuzz_bitflips(tmp_path, compress):
    src = make_valid(tmp_path, compress, taxids=compress)
    data = bytearray(open(src, "rb").read())
    rng = np.random.default_rng(11)
    for trial in range(60):
        mutant = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(mutant)))
            mutant[pos] ^= 1 << int(rng.integers(0, 8))
        p = tmp_path / "m.unik"
        p.write_bytes(bytes(mutant))
        mk = CMDS[trial % len(CMDS)]
        rc = run_cli(mk(p, tmp_path / f"o{trial}"), tmp_path)
        assert rc == 0 or rc != 0  # reachable: contract is "no exception"


def test_fuzz_garbage_files(tmp_path):
    rng = np.random.default_rng(13)
    cases = [
        b"",
        b"\x00" * 100,
        b"not a unik file at all\n" * 10,
        bytes(rng.integers(0, 256, 400, np.uint8)),
        b"\x1f\x8b" + bytes(rng.integers(0, 256, 64, np.uint8)),  # gzip magic
        zlib.compress(b"wrong payload"),
        # right magic, absurd header bytes
        b".unikmer" + bytes(rng.integers(0, 256, 64, np.uint8)),
    ]
    for i, blob in enumerate(cases):
        p = tmp_path / f"g{i}.unik"
        p.write_bytes(blob)
        for mk in CMDS:
            rc = run_cli(mk(p, tmp_path / f"og{i}"), tmp_path)
            assert rc != 0, (i, mk(p, "o"))


def test_fuzz_malformed_dump_lines(tmp_path):
    bad_texts = [
        "ACGTXGGA\n",            # invalid base
        "ACGT\nACGTA\n",         # inconsistent k
        "\n\nACGT\n",            # blank lines
        "ACGT\tnotataxid\n",     # non-integer taxid column
        "ACGT\t-5\n",            # negative taxid
        "12345678901234567890123456789012345678901\n" ,  # digits len!=k
        "ACGT\t1\t2\t3\n",       # too many columns
    ]
    for i, txt in enumerate(bad_texts):
        p = tmp_path / f"d{i}.txt"
        p.write_text(txt)
        rc = run_cli(["dump", p, "-o", tmp_path / f"od{i}"], tmp_path)
        assert isinstance(rc, int), txt


def test_fuzz_malformed_fasta(tmp_path):
    cases = [
        "",                       # empty file
        ">\n",                    # empty header, no seq
        ">r1\n>r2\nACGT\n",       # record with no sequence
        "ACGT\n",                 # no header at all
        ">r1\nACGT",              # no trailing newline
        "@r1\nACGT\n+\nII\n",     # fastq with short quality line
        ">r1\n" + "N" * 100 + "\n",
    ]
    for i, txt in enumerate(cases):
        p = tmp_path / f"f{i}.fa"
        p.write_text(txt)
        rc = run_cli(
            ["count", "-k", 5, "-K", "-s", p, "-o", tmp_path / f"of{i}"],
            tmp_path,
        )
        assert isinstance(rc, int), txt
