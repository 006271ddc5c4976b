"""Differential fuzzer for taxid-carrying pipelines.

Random taxonomy trees + random taxid assignments, pushed through
randomized chains of LCA-merging commands; every intermediate checked
against a from-scratch oracle implementing the reference rules:

  union/common: per-code LCA fold over every occurrence
    (unikmer/cmd/union.go:195-202, common.go:262-267)
  inter: LCA fold over all files, survivors = present everywhere
    (inter.go:228-249)
  diff --compare-taxid: on a code match keep the query entry (original
    taxid) iff qtaxid == ttaxid or qtaxid is an ancestor of ttaxid
    (diff.go:360-366, 405-409)
  grep -t: exact taxid membership, no descendant walk (grep.go:618-632)
  tsplit: group sorted records by taxid into per-taxid global-taxid
    files (tsplit.go:112-282)
"""

import os

import numpy as np
import pytest

from unikmer_tpu.io.unik import UnikReader
from tests.test_fuzz_cli_oracle import oracle_count, write_genome

RANKS = ["no rank", "superkingdom", "phylum", "genus", "species"]


def cli(argv, taxdump):
    from unikmer_tpu.cli.main import main

    os.environ["UNIKMER_DB"] = str(taxdump)
    return main([str(a) for a in argv])


def read_pairs(path):
    with UnikReader(path) as r:
        codes, taxids = r.read_all()
        if taxids is None and r.header.global_taxid:
            taxids = np.full(len(codes), r.header.global_taxid, np.uint32)
        return dict(zip(np.asarray(codes).tolist(), np.asarray(taxids).tolist()))


# ---------------------------------------------------------------- oracle


def make_taxonomy(rng, tmp, n=40):
    parent = {1: 1}
    for i in range(2, n + 1):
        parent[i] = int(rng.integers(1, i))
    d = tmp / "taxdump"
    d.mkdir(exist_ok=True)
    with open(d / "nodes.dmp", "w") as f:
        for t, p in parent.items():
            f.write(f"{t}\t|\t{p}\t|\t{RANKS[t % len(RANKS)]}\t|\n")
    return parent, d


def lca(parent, a, b):
    if a == b:
        return a
    seen = {a}
    x = a
    while x != parent[x]:
        x = parent[x]
        seen.add(x)
    x = b
    while True:
        if x in seen:
            return x
        if x == parent[x]:
            return x
        x = parent[x]


def is_ancestor(parent, q, t):
    """q is t or an ancestor of t."""
    x = t
    while True:
        if x == q:
            return True
        if x == parent[x]:
            return False
        x = parent[x]


def fold_lca(parent, dicts):
    out = {}
    for d in dicts:
        for c, t in d.items():
            out[c] = lca(parent, out[c], t) if c in out else t
    return out


# ------------------------------------------------------------------- ops


def _op_union(cli_, rng, parent, tmp, pool, i):
    m = int(rng.integers(2, min(4, len(pool)) + 1))
    picks = rng.choice(len(pool), size=m, replace=False)
    out = tmp / f"u{i}"
    assert cli_(["union", *[pool[j][0] for j in picks], "-s", "-o", out]) == 0
    return f"{out}.unik", fold_lca(parent, [pool[j][1] for j in picks])


def _op_concat_sortu(cli_, rng, parent, tmp, pool, i):
    a, b = rng.choice(len(pool), size=2, replace=True)
    cat, out = tmp / f"cat{i}", tmp / f"cs{i}"
    assert cli_(["concat", pool[a][0], pool[b][0], "-o", cat]) == 0
    assert cli_(["sort", "-u", f"{cat}.unik", "-o", out]) == 0
    return f"{out}.unik", fold_lca(parent, [pool[a][1], pool[b][1]])


def _op_inter(cli_, rng, parent, tmp, pool, i):
    m = int(rng.integers(2, min(3, len(pool)) + 1))
    picks = rng.choice(len(pool), size=m, replace=False)
    out = tmp / f"i{i}"
    assert cli_(["inter", *[pool[j][0] for j in picks], "-o", out]) == 0
    folded = fold_lca(parent, [pool[j][1] for j in picks])
    keep = set.intersection(*[set(pool[j][1]) for j in picks])
    return f"{out}.unik", {c: t for c, t in folded.items() if c in keep}


def _op_common(cli_, rng, parent, tmp, pool, i):
    m = int(rng.integers(2, min(4, len(pool)) + 1))
    picks = rng.choice(len(pool), size=m, replace=False)
    t = int(rng.integers(2, m + 1))
    out = tmp / f"c{i}"
    assert cli_(["common", *[pool[j][0] for j in picks], "-n", t, "-o", out]) == 0
    folded = fold_lca(parent, [pool[j][1] for j in picks])
    from collections import Counter

    cnt = Counter()
    for j in picks:
        cnt.update(set(pool[j][1]))
    return f"{out}.unik", {c: v for c, v in folded.items() if cnt[c] >= t}


def _op_diff(cli_, rng, parent, tmp, pool, i):
    m = int(rng.integers(2, min(3, len(pool)) + 1))
    picks = rng.choice(len(pool), size=m, replace=False)
    compare = bool(rng.random() < 0.5)
    out = tmp / f"d{i}"
    argv = ["diff", *[pool[j][0] for j in picks], "-s", "-o", out]
    if compare:
        argv.insert(1, "-t")
    assert cli_(argv) == 0
    q = dict(pool[picks[0]][1])
    for j in picks[1:]:
        tgt = pool[j][1]
        if compare:
            q = {
                c: qt
                for c, qt in q.items()
                if c not in tgt or qt == tgt[c] or is_ancestor(parent, qt, tgt[c])
            }
        else:
            q = {c: qt for c, qt in q.items() if c not in tgt}
    return f"{out}.unik", q


def _op_grep_taxid(cli_, rng, parent, tmp, pool, i):
    j = int(rng.integers(0, len(pool)))
    present = sorted(set(pool[j][1].values()))
    qs = list(
        rng.choice(present, size=min(2, len(present)), replace=False)
    ) + [int(rng.integers(1, 41))]
    invert = bool(rng.random() < 0.4)
    out = tmp / f"g{i}"
    argv = ["grep", "-t", "-q", ",".join(str(q) for q in qs),
            pool[j][0], "-s", "-o", out]
    if invert:
        argv.insert(1, "-v")
    assert cli_(argv) == 0
    qset = set(qs)
    want = {
        c: t for c, t in pool[j][1].items() if (t in qset) != invert
    }
    return f"{out}.unik", want


_OPS = [_op_union, _op_concat_sortu, _op_inter, _op_common, _op_diff,
        _op_grep_taxid]


@pytest.mark.parametrize("trial", range(5))
def test_fuzz_taxid_pipeline_vs_oracle(tmp_path, trial):
    run_trial(tmp_path, 0x7A1D + trial, [5, 11, 17, 23, 31][trial])


@pytest.mark.parametrize("trial", range(2))
def test_fuzz_taxid_pipeline_paths_tier(tmp_path, trial, monkeypatch):
    """Same randomized pipelines with the path-matrix LCA tier forced
    (UNIKMER_TPU_TAXID_VOCAB_MAX=0) and the device routes forced on."""
    monkeypatch.setenv("UNIKMER_TPU_TAXID_VOCAB_MAX", "0")
    monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "1")
    run_trial(tmp_path, 0xBA7 + trial, [13, 19][trial])


@pytest.mark.parametrize("trial", range(2))
def test_fuzz_taxid_pipeline_mesh(tmp_path, trial, monkeypatch):
    """Same randomized pipelines routed through the 4-device mesh
    (--mesh via UNIKMER_TPU_MESH): count -T, set ops, grep all mix."""
    monkeypatch.setenv("UNIKMER_TPU_MESH", "4")
    run_trial(tmp_path, 0x3E5 + trial, [11, 21][trial])


def run_trial(tmp_path, seed, k):
    """One randomized taxid pipeline trial (scripts/fuzz_campaign.py
    drives this over many extra seeds)."""
    rng = np.random.default_rng(seed)
    parent, taxdump = make_taxonomy(rng, tmp_path)

    def cli_(argv):
        return cli(argv, taxdump)

    backbone = "".join(rng.choice(list("ACGT"), size=60 + 4 * k))
    pool = []  # (path, {code: taxid})
    for g in range(int(rng.integers(3, 6))):
        use_parse = rng.random() < 0.4
        out = tmp_path / f"s{g}"
        if use_parse:
            # per-record taxids via -T regex; oracle folds LCA per record
            seqs, dicts = [], []
            with open(tmp_path / f"g{g}.fa", "w") as f:
                for r in range(int(rng.integers(1, 4))):
                    s = write_genome.__globals__["messy_seq"](
                        rng, int(rng.integers(80, 300)), k
                    )
                    if r == 0:
                        s += backbone
                    t = int(rng.integers(1, 41))
                    f.write(f">r{r} taxid|{t}\n{s}\n")
                    dicts.append(
                        {c: t for c in oracle_count([s], k)}
                    )
            assert cli_(
                ["count", "-k", k, "-K", "-s", tmp_path / f"g{g}.fa",
                 "-o", out, "-T", "-r", r"taxid\|(\d+)"]
            ) == 0
            want = fold_lca(parent, dicts)
        else:
            fa = tmp_path / f"g{g}.fa"
            seqs = write_genome(rng, fa, k, backbone=backbone)
            t = int(rng.integers(1, 41))
            assert cli_(
                ["count", "-k", k, "-K", "-s", fa, "-o", out, "-t", t]
            ) == 0
            want = {c: t for c in oracle_count(seqs, k)}
        pool.append((f"{out}.unik", want))

    for i in range(6):
        op = _OPS[int(rng.integers(0, len(_OPS)))]
        pool.append(op(cli_, rng, parent, tmp_path, pool, i))

    for path, want in pool:
        got = read_pairs(path)
        assert got == want, (path, len(got), len(want))

    # tsplit one taxid-carrying survivor into per-taxid files
    for path, want in reversed(pool):
        if want and len(set(want.values())) > 1:
            d = tmp_path / "tsp"
            assert cli_(["tsplit", path, "-O", d, "--force"]) == 0
            got = {}
            for f in sorted(os.listdir(d)):
                with UnikReader(str(d / f)) as r:
                    codes, _ = r.read_all()
                    gt = r.header.global_taxid
                    assert gt > 0
                    for c in np.asarray(codes).tolist():
                        got[c] = gt
            assert got == want
            break
