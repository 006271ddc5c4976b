"""Differential CLI pipeline fuzzer.

Random messy FASTA/FASTQ inputs (lowercase, U/N/IUPAC bases, short and
empty records) are counted and then pushed through randomized chains of
set-algebra commands; every intermediate .unik is checked against an
independent pure-Python oracle that re-implements the reference
semantics from scratch (window walk: unikmer/cmd/count.go:314-436;
low-complexity scoring: filter.go:181-221; set ops: union.go / inter.go
/ common.go / diff.go / grep.go — see SURVEY.md §2-3).

Unlike test_metamorphic (identity laws) and test_cli_conformance (fixed
fixtures), this checks arbitrary pipelines for exact set equality on
adversarial inputs.
"""

import os

import numpy as np
import pytest

from unikmer_tpu.io.unik import UnikReader

_ENC = {"A": 0, "C": 1, "G": 2, "T": 3}
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def cli(argv):
    from unikmer_tpu.cli.main import main

    return main([str(a) for a in argv])


# ---------------------------------------------------------------- oracle


def _encode(km: str) -> int:
    code = 0
    for c in km:
        code = (code << 2) | _ENC[c]
    return code


def _decode(code: int, k: int) -> str:
    out = []
    for _ in range(k):
        out.append("ACGT"[code & 3])
        code >>= 2
    return "".join(reversed(out))


def oracle_count(seqs, k, circular=False):
    """Distinct canonical k-mer codes (reference window semantics:
    skip records shorter than k, windows containing a non-ACGT base are
    dropped, U==T, case-insensitive, circular appends first k-1)."""
    out = set()
    for s in seqs:
        s = s.upper().replace("U", "T")
        if len(s) < k:
            continue
        ss = s + s[: k - 1] if circular else s
        for i in range(len(ss) - k + 1):
            km = ss[i : i + k]
            if any(c not in _ENC for c in km):
                continue
            rc = "".join(_COMP[c] for c in reversed(km))
            out.add(_encode(min(km, rc)))
    return out


def oracle_lowcomp(code: int, k: int, pen_s=3, pen_d=1, thr=15, win=7) -> bool:
    """True = low-complexity.  Bit-for-bit port of the reference scoring
    loop (filter.go:181-221) including the i <= k-window-1 bound that
    skips the final window position."""
    scores = []
    last = None
    c = code
    for i in range(k):
        b = c & 3
        scores.append(pen_s if (i > 0 and b == last) else pen_d)
        last = b
        c >>= 2
    i_last = max(k - win - 1, 0)
    s = sum(scores[:win])
    for i in range(i_last + 1):
        if i > 0:
            s = s - scores[i - 1] + scores[i + win - 1]
        if s >= thr:
            return True
    return False


# ------------------------------------------------------------ generators

def messy_seq(rng, n, k):
    # heavier invalid-base density at small k (any N kills a whole
    # k-window, so large k needs cleaner sequence to stay nontrivial)
    junk = "NnUuRY." if k <= 11 else "NUu"
    alphabet = "ACGT" * (12 if k <= 11 else 40) + "acgt" * 3 + junk
    return "".join(rng.choice(list(alphabet), size=n)) if n else ""


def write_genome(rng, path, k, fastq=False, backbone=""):
    """Random multi-record file mixing normal, boundary and degenerate
    record lengths; a shared backbone (spliced into one record) keeps
    cross-file intersections nontrivial.  Returns the sequences."""
    scale = max(1, k // 8)
    lens = [
        int(rng.integers(60 * scale, 400 * scale))
        for _ in range(int(rng.integers(1, 4)))
    ]
    # boundary records: empty, k-1, exactly k
    lens += list(rng.choice([0, max(k - 1, 0), k], size=int(rng.integers(0, 3))))
    seqs = [messy_seq(rng, n, k) for n in lens]
    if backbone:
        seqs[0] = seqs[0] + backbone + messy_seq(rng, 30, k)
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            if fastq:
                f.write(f"@r{i} fuzz\n{s}\n+\n{'I' * len(s)}\n")
            else:
                f.write(f">r{i} fuzz\n{s}\n")
    return seqs


def read_set(path):
    with UnikReader(path) as r:
        codes, _ = r.read_all()
    return codes


# ---------------------------------------------------------------- driver


def _op_union(cli_, rng, tmp, pool, i):
    m = int(rng.integers(2, min(4, len(pool)) + 1))
    picks = rng.choice(len(pool), size=m, replace=False)
    out = tmp / f"u{i}"
    assert cli_(["union", *[pool[j][0] for j in picks], "-s", "-o", out]) == 0
    want = set().union(*[pool[j][1] for j in picks])
    return f"{out}.unik", want


def _op_inter(cli_, rng, tmp, pool, i):
    m = int(rng.integers(2, min(4, len(pool)) + 1))
    picks = rng.choice(len(pool), size=m, replace=False)
    out = tmp / f"i{i}"
    assert cli_(["inter", *[pool[j][0] for j in picks], "-o", out]) == 0
    want = set.intersection(*[set(pool[j][1]) for j in picks])
    return f"{out}.unik", want


def _op_diff(cli_, rng, tmp, pool, i):
    m = int(rng.integers(2, min(4, len(pool)) + 1))
    picks = rng.choice(len(pool), size=m, replace=False)
    out = tmp / f"d{i}"
    assert cli_(["diff", *[pool[j][0] for j in picks], "-s", "-o", out]) == 0
    want = set(pool[picks[0]][1])
    for j in picks[1:]:
        want -= pool[j][1]
    return f"{out}.unik", want


def _op_common(cli_, rng, tmp, pool, i):
    m = int(rng.integers(2, min(4, len(pool)) + 1))
    picks = rng.choice(len(pool), size=m, replace=False)
    t = int(rng.integers(2, m + 1))
    out = tmp / f"c{i}"
    assert cli_(["common", *[pool[j][0] for j in picks], "-n", t, "-o", out]) == 0
    from collections import Counter

    cnt = Counter()
    for j in picks:
        cnt.update(pool[j][1])
    want = {c for c, n in cnt.items() if n >= t}
    return f"{out}.unik", want


def _op_grep(cli_, rng, tmp, pool, i):
    a, b = rng.choice(len(pool), size=2, replace=False)
    invert = bool(rng.random() < 0.4)
    out = tmp / f"g{i}"
    argv = ["grep", "-F", pool[a][0], pool[b][0], "-s", "-o", out]
    if invert:
        argv.insert(1, "-v")
    assert cli_(argv) == 0
    if not pool[a][1]:
        # empty query set: grep exits 0 WITHOUT writing output, matching
        # the reference's os.Exit(0) (grep.go:475-478)
        assert not (tmp / f"g{i}.unik").exists()
        return pool[b]
    want = (pool[b][1] - pool[a][1]) if invert else (pool[b][1] & pool[a][1])
    return f"{out}.unik", want


def _op_concat_sort(cli_, rng, tmp, pool, i):
    a, b = rng.choice(len(pool), size=2, replace=True)
    cat = tmp / f"cat{i}"
    out = tmp / f"cs{i}"
    assert cli_(["concat", pool[a][0], pool[b][0], "-o", cat]) == 0
    if a != b and rng.random() < 0.5:
        # repeated-only over two unique sets == intersection
        assert cli_(["sort", "-d", f"{cat}.unik", "-o", out]) == 0
        want = pool[a][1] & pool[b][1]
    else:
        assert cli_(["sort", "-u", f"{cat}.unik", "-o", out]) == 0
        want = pool[a][1] | pool[b][1]
    return f"{out}.unik", want


def _op_extsort_roundtrip(cli_, rng, tmp, pool, i):
    """External chunked sort of an already-unique file is an identity."""
    j = int(rng.integers(0, len(pool)))
    out = tmp / f"x{i}"
    chunk = int(rng.integers(10, 500))
    assert cli_(
        ["sort", "-u", "-m", chunk, pool[j][0], "-o", out,
         "-t", tmp / f"x{i}.tmp", "--force"]
    ) == 0
    return f"{out}.unik", set(pool[j][1])


def _op_mesh_setop(cli_, rng, tmp, pool, i):
    """Sharded mesh route (--mesh 4 on the virtual 8-CPU mesh) of a
    random set op must match the Python-set oracle like the host route."""
    op = ["union", "inter", "diff"][int(rng.integers(0, 3))]
    m = int(rng.integers(2, min(3, len(pool)) + 1))
    picks = rng.choice(len(pool), size=m, replace=False)
    out = tmp / f"m{i}"
    argv = [op, *[pool[j][0] for j in picks], "-o", out, "--mesh", 4]
    if op != "inter":
        argv.append("-s")
    assert cli_(argv) == 0
    if op == "union":
        want = set().union(*[pool[j][1] for j in picks])
    elif op == "inter":
        want = set.intersection(*[set(pool[j][1]) for j in picks])
    else:
        want = set(pool[picks[0]][1])
        for j in picks[1:]:
            want -= pool[j][1]
    return f"{out}.unik", want


_OPS = [
    _op_union,
    _op_inter,
    _op_diff,
    _op_common,
    _op_grep,
    _op_concat_sort,
    _op_extsort_roundtrip,
    _op_mesh_setop,
]


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_pipeline_vs_oracle(tmp_path, trial):
    run_trial(tmp_path, 0xC11 + trial, [3, 5, 11, 17, 23, 31][trial])


def run_trial(tmp_path, seed, k):
    """One randomized pipeline-vs-oracle trial (scripts/fuzz_campaign.py
    drives this over many extra seeds)."""
    rng = np.random.default_rng(seed)
    circular = bool(rng.random() < 0.25)
    fastq = bool(rng.random() < 0.3)

    backbone = "".join(rng.choice(list("ACGT"), size=60 + 4 * k))
    pool = []  # (path, oracle set) — every entry sorted+unique on disk
    for g in range(int(rng.integers(2, 5))):
        fa = tmp_path / ("g%d.%s" % (g, "fq" if fastq else "fa"))
        seqs = write_genome(rng, fa, k, fastq=fastq, backbone=backbone)
        out = tmp_path / f"s{g}"
        argv = ["count", "-k", k, "-K", "-s", fa, "-o", out]
        if circular:
            argv.append("--circular")
        assert cli(argv) == 0
        pool.append((f"{out}.unik", oracle_count(seqs, k, circular)))

    for i in range(6):
        op = _OPS[int(rng.integers(0, len(_OPS)))]
        pool.append(op(cli, rng, tmp_path, pool, i))

    # low-complexity filter against the from-scratch scoring oracle
    if k >= 7:
        src_path, src_set = pool[int(rng.integers(0, len(pool)))]
        out = tmp_path / "flt"
        assert cli(["filter", src_path, "-o", out]) == 0
        want = {c for c in src_set if not oracle_lowcomp(c, k)}
        pool.append((f"{out}.unik", want))
        out2 = tmp_path / "fltv"
        assert cli(["filter", "-v", src_path, "-o", out2]) == 0
        pool.append((f"{out2}.unik", src_set - want))

    # head -n of a sorted unique file = first n of the sorted oracle set
    src_path, src_set = pool[int(rng.integers(0, len(pool)))]
    n = int(rng.integers(1, 50))
    out = tmp_path / "hd"
    assert cli(["head", "-n", n, src_path, "-o", out]) == 0
    got = read_set(f"{out}.unik")
    assert list(got) == sorted(src_set)[:n]

    # verify every intermediate exactly
    for path, want in pool:
        got = read_set(path)
        assert len(got) == len(set(np.asarray(got).tolist())), path
        assert sorted(np.asarray(got).tolist()) == sorted(want), (
            path,
            len(got),
            len(want),
        )
        hdr = UnikReader(path).header
        assert hdr.k == k and hdr.is_canonical, path

    # text round-trip on one survivor: view output equals oracle decode
    path, want = pool[-1]
    txt = tmp_path / "v.txt"
    assert cli(["view", path, "-o", txt]) == 0
    lines = [
        ln.split("\t")[0]
        for ln in open(txt).read().splitlines()
        if ln
    ]
    assert sorted(lines) == sorted(_decode(c, k) for c in want)
