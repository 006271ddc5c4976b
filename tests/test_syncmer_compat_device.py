"""Device twin of the compat closed-syncmer (round 4, VERDICT round-3
next #7): ops/sketch.syncmer_compat_windows must reproduce the native
forensic kernel (native/unikit_native.cpp syncmer_compat_emit_u64)
exactly — per RECORD, across interior Ns, record boundaries, and the
count pipelines — so `--syncmer-impl=compat` can ride the device
stack (incl. -T, which the host engine cannot serve for sketches)."""

import os

import numpy as np
import pytest

from tests.conftest import random_dna
from unikmer_tpu.io.fastx import Record, pack_records
from unikmer_tpu.io.unik import UnikReader
from unikmer_tpu.ops.codec import BASE_LUT

native = pytest.importorskip("unikmer_tpu.native")
if native.get_lib() is None:
    pytest.skip("native lib unavailable", allow_module_level=True)

TAXDUMP = os.path.join(os.path.dirname(__file__), "data", "taxdump")


def oracle_per_record(seqs, k, s):
    outs = [
        native.sketch_emit(BASE_LUT[np.frombuffer(q, np.uint8)], k, s,
                           "syncmer_compat")
        for q in seqs
    ]
    outs = [o for o in outs if o is not None and len(o)]
    if not outs:
        return np.zeros(0, np.uint64)
    return np.sort(np.unique(np.concatenate(outs)))


def twin(seqs, k, s):
    from unikmer_tpu.ops.sketch import compat_gap, syncmer_compat_windows

    recs = [Record(b"r%d" % i, b"r%d" % i, q) for i, q in enumerate(seqs)]
    packed = pack_records(recs, k, gap=compat_gap(k, s))
    codes, emit = syncmer_compat_windows(packed.bases, k, s)
    return np.sort(np.unique(np.asarray(codes)[np.asarray(emit)]))


@pytest.mark.parametrize("k,s", [(31, 16), (21, 11), (13, 5), (9, 9),
                                 (32, 2), (7, 6)])
def test_twin_matches_native_multirecord(rng, k, s):
    seqs = []
    for i in range(4):
        n = int(rng.integers(k, 300))
        q = bytearray(random_dna(rng, n))
        if i % 2:  # interior Ns: window breaks that do NOT reset fills
            for j in rng.integers(0, n, max(n // 60, 1)):
                q[j] = ord("N")
        seqs.append(bytes(q))
    np.testing.assert_array_equal(oracle_per_record(seqs, k, s),
                                  twin(seqs, k, s))


def test_twin_fuzz(rng):
    for trial in range(12):
        k = int(rng.integers(5, 33))
        s = int(rng.integers(2, k + 1))
        seqs = [bytes(random_dna(rng, int(rng.integers(k, 250))))
                for _ in range(int(rng.integers(1, 4)))]
        np.testing.assert_array_equal(
            oracle_per_record(seqs, k, s), twin(seqs, k, s),
            err_msg=f"k={k} s={s}")


def cli(argv):
    from unikmer_tpu.cli.main import main

    os.environ["UNIKMER_DB"] = TAXDUMP
    return main([str(a) for a in argv])


def read_all(path):
    with UnikReader(path) as r:
        codes, taxids = r.read_all()
        return np.asarray(codes), taxids


def test_cli_compat_host_vs_device(tmp_path, rng, monkeypatch):
    """count -S --syncmer-impl=compat: host engine and device twin must
    be byte-identical on a multi-record input with Ns."""
    p = tmp_path / "in.fa"
    seqs = []
    for i in range(3):
        q = bytearray(random_dna(rng, 400 + 37 * i).decode(), "ascii")
        if i == 1:
            q[50:53] = b"NNN"
        seqs.append(q.decode())
    p.write_text("".join(f">s{i}\n{q}\n" for i, q in enumerate(seqs)))
    a = tmp_path / "host"
    b = tmp_path / "dev"
    monkeypatch.setenv("UNIKMER_TPU_HOST_COUNT", "1")
    assert cli(["count", "-k", 21, "-S", 11, "--syncmer-impl", "compat",
                "-s", p, "-o", a]) == 0
    monkeypatch.setenv("UNIKMER_TPU_HOST_COUNT", "0")
    assert cli(["count", "-k", 21, "-S", 11, "--syncmer-impl", "compat",
                "-s", p, "-o", b]) == 0
    ca, _ = read_all(f"{a}.unik")
    cb, _ = read_all(f"{b}.unik")
    np.testing.assert_array_equal(ca, cb)
    # and the per-record oracle agrees
    want = oracle_per_record([q.encode() for q in seqs], 21, 11)
    np.testing.assert_array_equal(ca, want)


def test_cli_compat_taxid(tmp_path, rng, monkeypatch):
    """count -T with the compat syncmer (device-only route): codes must
    equal the per-record oracle and taxids the LCA merge."""
    from unikmer_tpu.taxonomy.taxdump import load_taxonomy

    taxdb = load_taxonomy(TAXDUMP)
    shared = random_dna(rng, 300).decode()
    seqs = [shared + random_dna(rng, 200).decode(),
            shared + random_dna(rng, 150).decode()]
    taxids = [511145, 585057]
    p = tmp_path / "in.fa"
    p.write_text("".join(
        f">s{i} taxid|{t}\n{q}\n" for i, (q, t) in enumerate(zip(seqs, taxids))
    ))
    out = tmp_path / "out"
    assert cli(["count", "-k", 21, "-S", 11, "--syncmer-impl", "compat",
                "-s", "-T", "-r", r"taxid\|(\d+)", p, "-o", out]) == 0
    codes, got_tax = read_all(f"{out}.unik")
    # oracle: per-record emissions + LCA merge per code
    per = [
        np.unique(np.asarray(native.sketch_emit(
            BASE_LUT[np.frombuffer(q.encode(), np.uint8)], 21, 11,
            "syncmer_compat")))
        for q in seqs
    ]
    merged = {}
    for t, arr in zip(taxids, per):
        for c in arr.tolist():
            merged[c] = taxdb.lca(merged[c], t) if c in merged else t
    want_codes = np.sort(np.fromiter(merged.keys(), np.uint64, len(merged)))
    np.testing.assert_array_equal(codes, want_codes)
    np.testing.assert_array_equal(
        np.asarray(got_tax),
        np.asarray([merged[c] for c in want_codes.tolist()], np.uint32))


def test_cli_compat_mesh_falls_back(tmp_path, rng):
    """--mesh with compat must fall back (not halo-shardable) and stay
    byte-identical to the single-device run."""
    p = tmp_path / "in.fa"
    p.write_text(f">s\n{random_dna(rng, 900).decode()}\n")
    a = tmp_path / "plain"
    b = tmp_path / "mesh"
    assert cli(["count", "-k", 21, "-S", 11, "--syncmer-impl", "compat",
                "-s", p, "-o", a]) == 0
    assert cli(["count", "-k", 21, "-S", 11, "--syncmer-impl", "compat",
                "-s", p, "-o", b, "--mesh", 4]) == 0
    np.testing.assert_array_equal(read_all(f"{a}.unik")[0],
                                  read_all(f"{b}.unik")[0])
