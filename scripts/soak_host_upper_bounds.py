#!/usr/bin/env python
"""Reference-scale soak of the two host paths that permanently own
their workloads after the round-4 device demotions (VERDICT round-4
next #7):

1. grep with query sets up to 2^27 (~1.3e8) codes against a 2^26
   target — the ">10^8-scale query set" story (grep.go:617-676) now
   has only the host searchsorted leg.
2. rfilter over a synthetic NCBI-shaped taxonomy (~2.5M nodes, real
   rank distribution) with a 10^7-code input (rfilter.go:439-519).

Reports wall-clock + peak RSS at two sizes each; exits nonzero on any
mismatch vs the numpy oracle or pathological scaling (>4x the linear
extrapolation from the smaller size).

Host-only (jax-free): safe to run any time.
"""

import json
import os
import resource
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("UNIKMER_TPU_PLATFORM", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rss_mb():
    return resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 1024


def run_cli(argv, env=None):
    e = dict(os.environ)
    e["PYTHONPATH"] = REPO + os.pathsep + e.get("PYTHONPATH", "")
    if env:
        e.update(env)
    t0 = time.time()
    r = subprocess.run([sys.executable, "-m", "unikmer_tpu.cli.main",
                        *map(str, argv)], env=e, capture_output=True,
                       text=True)
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"CLI failed: {argv[:2]}")
    return dt


def write_unik(path, codes, k=31):
    from unikmer_tpu.io import unik

    flag = unik.SORTED | unik.CANONICAL | unik.HASHED
    with unik.UnikWriter(path, k=k, flag=flag, number=len(codes)) as w:
        w.write_codes(np.asarray(codes, np.uint64))


def grep_soak(tmp, log2_query):
    rng = np.random.default_rng(20260821 + log2_query)
    nq = 1 << log2_query
    nt = 1 << 26
    target = np.sort(np.unique(
        rng.integers(0, 1 << 63, nt + nt // 4, dtype=np.uint64)))[:nt]
    # ~35% hit rate
    hits = rng.choice(nt, int(nq * 0.35), replace=True)
    query = np.sort(np.unique(np.concatenate([
        target[hits],
        rng.integers(0, 1 << 63, nq - len(hits), dtype=np.uint64),
    ])))
    tpath = os.path.join(tmp, f"target_{log2_query}.unik")
    qpath = os.path.join(tmp, f"query_{log2_query}.unik")
    opath = os.path.join(tmp, f"hit_{log2_query}")
    write_unik(tpath, target)
    write_unik(qpath, query)
    want = np.intersect1d(target, query)
    del target
    dt = run_cli(["grep", "-F", qpath, tpath, "-s", "-o", opath])
    from unikmer_tpu.io.unik import UnikReader

    with UnikReader(opath + ".unik") as r:
        got, _ = r.read_all()
    assert np.array_equal(np.asarray(got), want), "grep soak MISMATCH"
    return {"metric": f"grep_host_q2e{log2_query}_t2e26",
            "wall_s": round(dt, 1), "rss_mb": round(rss_mb()),
            "n_query": int(len(query)), "n_hit": int(len(want))}


def synth_ncbi_taxonomy(tmp, n_nodes):
    """NCBI-shaped taxdump: ~2.5M nodes, realistic rank mix (most
    nodes species/no-rank, thin upper ranks), depth ~8-30."""
    rng = np.random.default_rng(99)
    d = os.path.join(tmp, f"taxdump_{n_nodes}")
    os.makedirs(d, exist_ok=True)
    parent = np.zeros(n_nodes + 1, np.int64)
    rank = np.empty(n_nodes + 1, object)
    ranks_cum = [
        (0.48, "species"), (0.70, "no rank"), (0.82, "genus"),
        (0.90, "strain"), (0.95, "family"), (0.975, "order"),
        (0.99, "class"), (0.997, "phylum"), (1.0, "superkingdom"),
    ]
    parent[1] = 1
    rank[1] = "no rank"
    ids = np.arange(2, n_nodes + 1)
    # parents drawn from earlier ids -> shallow-ish DAG-free tree
    parent[2:] = 1 + (rng.random(len(ids)) * (ids - 1)).astype(np.int64)
    u = rng.random(n_nodes + 1)
    for i in range(2, n_nodes + 1):
        x = u[i]
        for c, name in ranks_cum:
            if x <= c:
                rank[i] = name
                break
    with open(os.path.join(d, "nodes.dmp"), "w") as f:
        for i in range(1, n_nodes + 1):
            f.write(f"{i}\t|\t{parent[i]}\t|\t{rank[i]}\t|\n")
    with open(os.path.join(d, "names.dmp"), "w") as f:
        f.write("1\t|\troot\t|\t\t|\tscientific name\t|\n")
    open(os.path.join(d, "merged.dmp"), "w").close()
    open(os.path.join(d, "delnodes.dmp"), "w").close()
    return d, parent, rank


def rfilter_soak(tmp, n_nodes, n_codes):
    taxdir, parent, rank = synth_ncbi_taxonomy(tmp, n_nodes)
    rng = np.random.default_rng(7)
    codes = np.sort(np.unique(
        rng.integers(0, 1 << 63, n_codes + n_codes // 4,
                     dtype=np.uint64)))[:n_codes]
    taxids = rng.integers(1, n_nodes + 1, n_codes, dtype=np.uint32)
    path = os.path.join(tmp, f"rf_{n_nodes}_{n_codes}.unik")
    from unikmer_tpu.io import unik

    flag = unik.SORTED | unik.CANONICAL | unik.HASHED | unik.INCLUDE_TAXID
    with unik.UnikWriter(path, k=31, flag=flag, number=n_codes,
                         max_taxid=n_nodes) as w:
        w.write_codes(codes, taxids)
    out = os.path.join(tmp, f"rf_out_{n_nodes}_{n_codes}")
    dt = run_cli(["rfilter", path, "-E", "genus", "-N", "-o", out],
                 env={"UNIKMER_DB": taxdir})
    from unikmer_tpu.io.unik import UnikReader

    with UnikReader(out + ".unik") as r:
        got, _ = r.read_all()
    want = int(np.sum(np.asarray(
        [rank[t] == "genus" for t in taxids], bool)))
    assert len(got) == want, f"rfilter soak MISMATCH {len(got)} != {want}"
    return {"metric": f"rfilter_host_n{n_nodes}_c{n_codes}",
            "wall_s": round(dt, 1), "rss_mb": round(rss_mb()),
            "n_kept": int(len(got))}


def main():
    results = []
    with tempfile.TemporaryDirectory(dir="/tmp") as tmp:
        for lq in (25, 27):
            r = grep_soak(tmp, lq)
            results.append(r)
            print(json.dumps(r), flush=True)
        for n_nodes, n_codes in ((500_000, 2_000_000),
                                 (2_500_000, 10_000_000)):
            r = rfilter_soak(tmp, n_nodes, n_codes)
            results.append(r)
            print(json.dumps(r), flush=True)
    # pathological-scaling check: 4x data must cost < 4x * 4 wall
    g = {r["metric"]: r["wall_s"] for r in results}
    gs = [v for k, v in g.items() if k.startswith("grep")]
    rf = [v for k, v in g.items() if k.startswith("rfilter")]
    assert gs[1] < max(gs[0], 0.5) * 16, "grep scaling pathological"
    assert rf[1] < max(rf[0], 0.5) * 20, "rfilter scaling pathological"
    print("SOAK OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
