"""Distributed orchestration: host partitioning + end-to-end sharded count."""

import os

import numpy as np

from unikmer_tpu.models.count import CountConfig, count_packed
from unikmer_tpu.io.fastx import pack_files
from unikmer_tpu.parallel.mesh import make_mesh
from unikmer_tpu.pipeline import distributed
from tests.conftest import random_dna


def test_partition_files():
    files = [f"f{i}" for i in range(10)]
    parts = [distributed.partition_files(files, 3, h) for h in range(3)]
    assert sorted(sum(parts, [])) == sorted(files)
    assert parts[0] == ["f0", "f3", "f6", "f9"]


def test_partition_bases(rng):
    bases = np.arange(1000, dtype=np.uint8)
    k = 11
    seen = []
    for h in range(4):
        sl, own = distributed.partition_bases(bases, 4, h, k)
        seen.append((sl, own))
    # each host owns a disjoint cover of the array
    total = sum(own for _, own in seen)
    assert total == 1000


def test_sharded_count_distinct_end_to_end(tmp_path, rng):
    seq = random_dna(rng, 6000).decode()
    p = tmp_path / "g.fa"
    p.write_text(f">g\n{seq}\n")
    mesh = make_mesh(8)
    cfg = CountConfig(k=13, canonical=True)
    out, counts, dropped, _sent = distributed.sharded_count_distinct(
        [str(p)], cfg, mesh, capacity=2048
    )
    assert int(np.asarray(dropped)[0]) == 0
    got = np.concatenate(
        [np.asarray(out[i])[: int(np.asarray(counts)[i])] for i in range(8)]
    )
    want = count_packed(pack_files([str(p)], 13), cfg)
    np.testing.assert_array_equal(got, want)


def test_two_process_distributed_count(tmp_path, rng):
    """Real 2-process jax.distributed run (CPU, localhost coordinator):
    host-sharded ingest + cross-process all_to_all + psum; the merged
    shards must equal the single-host brute-force distinct set."""
    import json
    import subprocess
    import sys

    from tests.conftest import random_dna
    from tests.test_count import brute_kmers
    from unikmer_tpu.ops import codec

    seqs = []
    paths = []
    for i in range(2):
        seq = random_dna(rng, 2500).decode()
        p = tmp_path / f"g{i}.fa"
        p.write_text(f">g{i}\n{seq}\n")
        seqs.append(seq)
        paths.append(str(p))

    port = 20000 + int(rng.integers(0, 20000))
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port)] + paths,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    shards = {}
    for o in outs:
        lines = [l for l in o.splitlines() if l.startswith("RESULT ")]
        assert lines, o[-2000:]
        r = json.loads(lines[0][len("RESULT "):])
        assert r["dropped"] == 0
        shards.update({int(k): v for k, v in r["shards"].items()})
    assert set(shards) == {0, 1, 2, 3}
    got = []
    for i in range(4):
        got.extend(shards[i])
    want = sorted({codec.encode_kmer(s)
                   for s in brute_kmers(seqs, 11, canonical=True)})
    assert got == want

    # taxid arm: cross-process packed-key all_to_all + LCA collapse
    # (RESULT2) vs a host lca_reduce oracle over the same synthetic data
    shards2, tshards2 = {}, {}
    for o in outs:
        lines = [l for l in o.splitlines() if l.startswith("RESULT2 ")]
        assert lines, o[-2000:]
        r = json.loads(lines[0][len("RESULT2 "):])
        assert r["dropped"] == 0
        shards2.update({int(k): v for k, v in r["shards"].items()})
        tshards2.update({int(k): v for k, v in r["taxids"].items()})
    got_c = np.array(sum((shards2[i] for i in range(4)), []), np.uint64)
    got_t = np.array(sum((tshards2[i] for i in range(4)), []), np.uint32)
    from unikmer_tpu.models.count import CountConfig, linear_codes_all
    from unikmer_tpu.taxonomy.taxdump import Taxonomy

    tax = Taxonomy(
        parent=np.array([0, 1, 1, 1, 2, 2], np.uint32),
        depth=np.array([-1, 0, 1, 1, 2, 2], np.int16),
        rank_ids=np.full(6, -1, np.int16), ranks=[],
    )
    r2 = np.random.default_rng(99)
    tb = r2.integers(0, 4, 3000).astype(np.uint8)
    ptax = r2.integers(1, 6, 3000).astype(np.uint32)
    codes, pos = linear_codes_all(tb, CountConfig(k=11, canonical=True))
    want_c, want_t = tax.lca_reduce(codes, ptax[pos])
    np.testing.assert_array_equal(got_c, want_c)
    np.testing.assert_array_equal(got_t, want_t)
