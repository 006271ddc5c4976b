"""Host count engine (models/count_host.py): differential parity with
the device pipeline and with the from-scratch oracle, CLI routing, and
the jax-free property.

The host engine exists because the reference's headline benchmark is a
single-genome `count` (README.md:156-158) where startup dominates; it
must be byte-for-byte indistinguishable from the device path.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import random_dna
from tests.test_count import brute_kmers

from unikmer_tpu.io.fastx import Record, pack_records
from unikmer_tpu.models import count_host

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_records(rng, n_rec, min_len, max_len):
    recs = []
    for i in range(n_rec):
        L = int(rng.integers(min_len, max_len))
        seq = bytearray(random_dna(rng, L))
        # sprinkle invalid bases to exercise window resets
        for _ in range(int(rng.integers(0, 4))):
            seq[int(rng.integers(0, L))] = ord("N")
        recs.append(Record(b"r%d" % i, b"r%d" % i, bytes(seq)))
    return recs


@pytest.mark.parametrize("mode", ["distinct", "unique", "repeated"])
@pytest.mark.parametrize("circular", [False, True])
def test_host_vs_device_modes(rng, mode, circular):
    from unikmer_tpu.models.count import CountConfig, count_packed

    k = int(rng.choice([3, 11, 21, 31, 32]))
    recs = _mk_records(rng, 5, max(k, 4), 120)
    # force duplicates so unique/repeated discriminate
    recs.append(recs[0])
    packed = pack_records(recs, k, circular)
    got = count_host.count_host(packed, k, True, mode)
    assert got is not None
    want = count_packed(packed, CountConfig(k=k, canonical=True,
                                            circular=circular, mode=mode))
    np.testing.assert_array_equal(got, np.asarray(want), err_msg=f"k={k}")


def test_host_linear_vs_oracle(rng):
    k = 7
    seqs = ["ACGTACGTACGTACGT", random_dna(rng, 60).decode(),
            "ACGNNGTACGTACGTA"]
    recs = [Record(b"r", b"r", s.encode()) for s in seqs]
    packed = pack_records(recs, k, False)
    got = count_host.linear_host(packed, k, True)
    want = [c for s in seqs for c in brute_kmers([s], k, canonical=True)]
    from unikmer_tpu.ops import codec

    assert [codec.decode_kmer(int(c), k) for c in got] == want


def test_host_cli_byte_parity(tmp_path, rng):
    """UNIKMER_TPU_HOST_COUNT=1 and =0 must write identical bytes for
    every flag combo the host engine supports."""
    from unikmer_tpu.cli.main import main

    fa = tmp_path / "g.fa"
    fa.write_text(
        "".join(f">r{i}\n{random_dna(rng, 200).decode()}\n" for i in range(3))
    )
    for extra in ([], ["-s"], ["-c"], ["-u"], ["-d"], ["-l"],
                  ["--circular"], ["-t", "562"]):
        outs = []
        for knob in ("1", "0"):
            os.environ["UNIKMER_TPU_HOST_COUNT"] = knob
            try:
                out = tmp_path / f"o{knob}"
                assert main(["count", "-k", "17", "-K", *extra,
                             str(fa), "-o", str(out)]) == 0
                outs.append((out.parent / (out.name + ".unik")).read_bytes())
            finally:
                os.environ.pop("UNIKMER_TPU_HOST_COUNT", None)
        assert outs[0] == outs[1], extra


def test_count_cli_is_jax_free_on_host_path(tmp_path, rng):
    """The headline-latency win: a small un-hashed count must never
    import jax."""
    fa = tmp_path / "g.fa"
    fa.write_text(f">s\n{random_dna(rng, 500).decode()}\n")
    probe = subprocess.run(
        [sys.executable, "-c",
         "import sys; from unikmer_tpu.cli.main import main; "
         f"rc = main(['count', '-k', '23', '-K', '-s', {str(fa)!r}, "
         f"'-o', {str(tmp_path / 'o')!r}]); "
         "sys.exit(2 if rc else (1 if 'jax' in sys.modules else 0))"],
        env=dict(os.environ, PYTHONPATH=ROOT, PALLAS_AXON_POOL_IPS="",
                 UNIKMER_TPU_PLATFORM="cpu"),
        capture_output=True, timeout=120,
    )
    assert probe.returncode == 0, probe.stderr.decode()[-800:]


def test_ensure_device_env_reexec(monkeypatch, tmp_path):
    """_ensure_device_env: re-execs with the pool restored ONLY when the
    launcher pinned AND a pool existed; marker removed, HOST_COUNT=0."""
    from unikmer_tpu.cli.commands.count import _ensure_device_env

    calls = []
    monkeypatch.setattr(os, "execvpe",
                        lambda exe, argv, env: calls.append((argv, env)))
    # no marker -> no-op
    monkeypatch.delenv("UNIKMER_TPU_LAUNCHER_PINNED", raising=False)
    _ensure_device_env()
    assert not calls
    # marker but empty saved pool -> no device existed -> stay in-process
    monkeypatch.setenv("UNIKMER_TPU_LAUNCHER_PINNED", "1")
    monkeypatch.setenv("UNIKMER_TPU_SAVED_POOL", "")
    _ensure_device_env()
    assert not calls
    # marker + pool -> exec with pool restored and the pin dropped
    monkeypatch.setenv("UNIKMER_TPU_SAVED_POOL", "10.0.0.1")
    monkeypatch.setenv("UNIKMER_TPU_PLATFORM", "cpu")
    _ensure_device_env()
    assert len(calls) == 1
    argv, env = calls[0]
    assert argv[1:3] == ["-m", "unikmer_tpu.cli.main"]
    assert env["PALLAS_AXON_POOL_IPS"] == "10.0.0.1"
    assert env["UNIKMER_TPU_HOST_COUNT"] == "0"
    assert "UNIKMER_TPU_LAUNCHER_PINNED" not in env
    assert "UNIKMER_TPU_PLATFORM" not in env


def test_launcher_device_config_falls_back_correctly(tmp_path, rng):
    """A device-routed count (auto size cap forced to 0) under the
    launcher on this CPU-only box must fall back to the XLA CPU
    pipeline and stay correct (the saved pool is empty, so no re-exec
    happens)."""
    fa = tmp_path / "g.fa"
    seq = random_dna(rng, 300).decode()
    fa.write_text(f">s\n{seq}\n")
    out = tmp_path / "h"
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="",
               UNIKMER_TPU_HOST_COUNT_MAX_MB="0")  # force the device route
    env.pop("UNIKMER_TPU_PLATFORM", None)  # let the launcher pin
    p = subprocess.run(
        [os.path.join(ROOT, "bin", "unikmer-tpu"), "count", "-k", "15",
         "-W", "9", str(fa), "-o", str(out)],
        env=env, capture_output=True, timeout=300, text=True,
    )
    assert p.returncode == 0, p.stderr[-800:]
    from unikmer_tpu.io.unik import UnikReader

    with UnikReader(f"{out}.unik") as r:
        assert r.header.is_hashed  # sketches force -H
        codes, _ = r.read_all()
    assert 0 < len(codes) < len(seq)  # minimizer downsamples


def _rc(s):
    comp = dict(zip("ACGT", "TGCA"))
    return "".join(comp[c] for c in reversed(s))


@pytest.mark.parametrize("scale", [1, 7])
@pytest.mark.parametrize("k", [11, 31, 33, 64])
def test_host_vs_device_hashed(rng, k, scale):
    from unikmer_tpu.models.count import CountConfig, count_packed

    recs = _mk_records(rng, 4, k, 200)
    packed = pack_records(recs, k, False)
    got = count_host.count_host(packed, k, True, "distinct",
                                hashed=True, scale=scale)
    assert got is not None
    want = count_packed(packed, CountConfig(k=k, canonical=True, hashed=True,
                                            scale=scale, mode="distinct"))
    np.testing.assert_array_equal(got, np.asarray(want))


def test_host_scaled_fixture_cli(tmp_path):
    """MG1655 k=31 scaled s=15 = 586,734 (analysis/distance/README.md:5-10)
    through the jax-free host path."""
    from unikmer_tpu.cli.main import main
    from unikmer_tpu.io.unik import UnikReader

    out = tmp_path / "s15"
    assert main([
        "count", "-k", "31", "-K", "-H", "-D", "15", "-s",
        "/root/reference/testdata/old/Ecoli-MG1655.fasta.gz",
        "-o", str(out),
    ]) == 0
    with UnikReader(f"{out}.unik") as r:
        assert r.header.number == 586_734
        assert r.header.is_hashed and r.header.scale == 15


def test_count_linear_stdin_device_fallback(tmp_path, rng):
    """Stdin never routes to the host engine (size unknown) and must
    not be consumed before any re-exec decision: piped linear count
    stays in-process and emits every window (the review-found stdin
    data-loss scenario)."""
    seq = random_dna(rng, 80).decode()
    out = tmp_path / "o"
    p = subprocess.run(
        [sys.executable, "-m", "unikmer_tpu.cli.main", "count", "-l",
         "-k", "11", "-K", "-", "-o", str(out)],
        input=f">s\n{seq}\n".encode(),
        env=dict(os.environ, PYTHONPATH=ROOT, PALLAS_AXON_POOL_IPS="",
                 UNIKMER_TPU_PLATFORM="cpu",
                 UNIKMER_TPU_LAUNCHER_PINNED="1",
                 UNIKMER_TPU_SAVED_POOL=""),
        capture_output=True, timeout=300,
    )
    assert p.returncode == 0, p.stderr.decode()[-800:]
    from unikmer_tpu.io.unik import UnikReader

    with UnikReader(f"{out}.unik") as r:
        codes, _ = r.read_all()
    assert len(codes) == len(seq) - 11 + 1


def test_post_pack_cap_falls_back_to_device(tmp_path, rng, monkeypatch):
    """When the packed buffer exceeds UNIKMER_TPU_HOST_COUNT_MAX_BASES
    the main path falls back to the bounded-memory device streaming and
    the output is identical."""
    from unikmer_tpu.cli.main import main
    from unikmer_tpu.io.unik import UnikReader

    fa = tmp_path / "g.fa"
    fa.write_text(f">s\n{random_dna(rng, 5000).decode()}\n")
    outs = []
    for cap in ("1000", str(1 << 28)):  # force fallback, then host
        monkeypatch.setenv("UNIKMER_TPU_HOST_COUNT_MAX_BASES", cap)
        out = tmp_path / f"c{cap}"
        assert main(["count", "-k", "21", "-K", "-s", str(fa),
                     "-o", str(out)]) == 0
        outs.append((out.parent / (out.name + ".unik")).read_bytes())
    assert outs[0] == outs[1]


@pytest.mark.parametrize("trial", range(8))
def test_host_device_byte_parity_fuzz(tmp_path, rng, trial):
    run_parity_trial(tmp_path, rng)


def run_parity_trial(tmp_path, rng):
    """Randomized flag combos (k up to 64, hashed, scaled, modes, sort,
    compact, circular, fastq, multi-file): HOST_COUNT=1 and =0 must
    write identical bytes.  (scripts/fuzz_campaign.py drives extra
    seeds.)"""
    from unikmer_tpu.cli.main import main

    k = int(rng.choice([5, 17, 31, 32, 33, 47, 64]))
    hashed = bool(k > 32 or rng.random() < 0.5)
    scale = int(rng.choice([1, 1, 5, 100])) if hashed else 1
    sketch = rng.choice(["", "-W", "-S"]) if k >= 4 else ""
    mode_flag = rng.choice(["", "-u", "-d"])
    layout = rng.choice(["", "-s", "-c"])
    circular = rng.random() < 0.3
    fastq = rng.random() < 0.3
    n_files = int(rng.integers(1, 3))

    files = []
    for fi in range(n_files):
        p = tmp_path / (f"g{fi}.fq" if fastq else f"g{fi}.fa")
        recs = []
        for ri in range(int(rng.integers(1, 4))):
            L = int(rng.integers(max(k, 2), 400))
            s = bytearray(random_dna(rng, L))
            for _ in range(int(rng.integers(0, 3))):
                s[int(rng.integers(0, L))] = ord("N")
            if fastq:
                recs.append(f"@r{ri}\n{s.decode()}\n+\n{'I' * L}\n")
            else:
                recs.append(f">r{ri}\n{s.decode()}\n")
        p.write_text("".join(recs))
        files.append(str(p))

    argv = ["count", "-k", str(k), "-K"]
    if hashed:
        argv.append("-H")
    if scale > 1:
        argv += ["-D", str(scale)]
    if sketch == "-W":
        argv += ["-W", str(int(rng.integers(2, 20)))]
    elif sketch == "-S":
        argv += ["-S", str(int(rng.integers(2, min(k, 32) + 1)))]
    if sketch == "-W":
        argv += ["-W", str(int(rng.integers(2, 20)))]
    elif sketch == "-S":
        argv += ["-S", str(int(rng.integers(2, min(k, 32) + 1)))]
    if mode_flag:
        argv.append(mode_flag)
    if layout:
        argv.append(layout)
    if circular:
        argv.append("--circular")
    outs = []
    for knob in ("1", "0"):
        os.environ["UNIKMER_TPU_HOST_COUNT"] = knob
        try:
            out = tmp_path / f"t{knob}"
            assert main(argv + files + ["-o", str(out)]) == 0
            outs.append((tmp_path / f"t{knob}.unik").read_bytes())
        finally:
            os.environ.pop("UNIKMER_TPU_HOST_COUNT", None)
    assert outs[0] == outs[1], argv


@pytest.mark.parametrize("hashed", [False, True])
def test_genome_index_host_vs_device(tmp_path, rng, monkeypatch, hashed):
    """build_genome_index must produce an identical index through the
    host window kernels and the device fallback."""
    from unikmer_tpu.models import locate as locate_mod

    fa = tmp_path / "g.fa"
    fa.write_text(
        f">a\n{random_dna(rng, 400).decode()}\n"
        f">b\n{random_dna(rng, 150).decode()}NNN{random_dna(rng, 80).decode()}\n"
    )
    host = locate_mod.build_genome_index([str(fa)], 21, hashed=hashed)
    monkeypatch.setattr(locate_mod, "linear_windows_host",
                        lambda *a, **k: None)
    dev = locate_mod.build_genome_index([str(fa)], 21, hashed=hashed)
    np.testing.assert_array_equal(host.codes, dev.codes)
    np.testing.assert_array_equal(host.seq_idx, dev.seq_idx)
    np.testing.assert_array_equal(host.pos, dev.pos)


def test_count_taxids_host_vs_device(tmp_path, rng):
    """count -T parity: host twin (count_taxids_host) vs the device
    count_packed_taxids across modes, incl. LCA collisions."""
    import re as _re

    from unikmer_tpu.models.count import CountConfig, count_packed_taxids
    from unikmer_tpu.models.count_host import count_taxids_host
    from unikmer_tpu.taxonomy.taxdump import load_taxonomy

    taxdb = load_taxonomy(os.path.join(ROOT, "tests", "data", "taxdump"))
    shared = random_dna(rng, 120).decode()
    recs = []
    for i, t in enumerate([511145, 585057, 562]):
        seq = shared + random_dna(rng, 60).decode()
        recs.append(Record(b"r%d|taxid=%d" % (i, t), b"r", seq.encode()))
    re_taxid = _re.compile(rb"taxid=(\d+)")
    for mode in ("distinct", "unique", "repeated"):
        got = count_taxids_host(list(recs), 11, True, False, 1, mode,
                                False, re_taxid, taxdb)
        assert got is not None
        want = count_packed_taxids(
            list(recs), CountConfig(k=11, canonical=True, mode=mode),
            re_taxid, taxdb)
        np.testing.assert_array_equal(got[0], want[0], err_msg=mode)
        np.testing.assert_array_equal(got[1], want[1], err_msg=mode)


@pytest.mark.parametrize("kind", ["minimizer", "syncmer"])
def test_sketch_kernels_vs_device(rng, kind):
    """Native sketch emission streams (monotonic deque) vs the device
    doubling-argmin implementation, randomized with invalid bases."""
    from unikmer_tpu import native
    from unikmer_tpu.ops.sketch import minimizer_windows, syncmer_windows

    for _ in range(6):
        n = int(rng.integers(0, 2000))
        k = int(rng.integers(1, 40))
        bases = rng.integers(0, 4, size=n).astype(np.uint8)
        bases[rng.random(n) < 0.03] = 4
        if kind == "minimizer":
            p = int(rng.integers(1, 20))
            codes, emit = minimizer_windows(bases, k, p)
        else:
            p = int(rng.integers(1, k + 1))
            codes, emit = syncmer_windows(bases, k, p)
        got = native.sketch_emit(bases, k, p, kind)
        want = np.asarray(codes)[np.asarray(emit)]
        assert got is not None and got.tolist() == want.tolist(), (n, k, p)
