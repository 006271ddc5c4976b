"""Sharded (multi-device) pipeline tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from unikmer_tpu.models.count import CountConfig
from unikmer_tpu.ops import codec
from unikmer_tpu.parallel.mesh import SHARD_AXIS, make_mesh
from unikmer_tpu.parallel.sharded import (
    SENT,
    build_sharded_distinct,
    pack_host_shards,
    sharded_union_counts,
)
from tests.conftest import random_dna


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 cpu devices"
    return make_mesh(8)


def _brute_distinct(seq: bytes, k: int, canonical: bool):
    from tests.test_count import brute_kmers

    return sorted(
        {codec.encode_kmer(s) for s in brute_kmers([seq.decode()], k, canonical)}
    )


@pytest.mark.parametrize("canonical", [False, True])
def test_sharded_distinct_matches_bruteforce(rng, mesh, canonical):
    k = 11
    seq = random_dna(rng, 5000, p_invalid=0.01)
    bases = codec.BASE_LUT[np.frombuffer(seq, np.uint8)]
    rows = pack_host_shards(bases, 8, k)
    cfg = CountConfig(k=k, canonical=canonical)
    capacity = 2048
    step = build_sharded_distinct(mesh, cfg, capacity)
    out, counts, dropped, _sent = step(rows)
    out = np.asarray(out)
    counts = np.asarray(counts)
    assert int(np.asarray(dropped)[0]) == 0
    got = []
    for i in range(8):
        shard = out[i][: counts[i]]
        assert (np.diff(shard.astype(np.uint64)) > 0).all()  # sorted distinct
        got.extend(shard.tolist())
    want = _brute_distinct(seq, k, canonical)
    assert got == want  # range partition => concatenation already sorted


def test_sharded_distinct_hashed(rng, mesh):
    k = 31
    seq = random_dna(rng, 4000)
    bases = codec.BASE_LUT[np.frombuffer(seq, np.uint8)]
    rows = pack_host_shards(bases, 8, k)
    cfg = CountConfig(k=k, canonical=True, hashed=True)
    step = build_sharded_distinct(mesh, cfg, 2048)
    out, counts, dropped, _sent = step(rows)
    assert int(np.asarray(dropped)[0]) == 0
    # compare against single-device count
    from unikmer_tpu.models.count import count_packed
    from unikmer_tpu.io.fastx import Record, pack_records

    want = count_packed(
        pack_records([Record(b"s", b"s", seq)], k), cfg
    )
    got = np.concatenate(
        [np.asarray(out[i])[: np.asarray(counts)[i]] for i in range(8)]
    )
    np.testing.assert_array_equal(got, want)


def test_capacity_overflow_detected(rng, mesh):
    k = 11
    seq = random_dna(rng, 5000)
    bases = codec.BASE_LUT[np.frombuffer(seq, np.uint8)]
    rows = pack_host_shards(bases, 8, k)
    step = build_sharded_distinct(mesh, CountConfig(k=k), 16)  # tiny capacity
    out, counts, dropped, _sent = step(rows)
    assert int(np.asarray(dropped)[0]) > 0


def test_sharded_union(rng, mesh):
    cap = 512
    a = np.full((8, cap), SENT, dtype=np.uint64)
    b = np.full((8, cap), SENT, dtype=np.uint64)
    # shard i owns range [i,i+1) * 2^61 for k=11... use arbitrary aligned values
    all_vals = set()
    for i in range(8):
        va = np.sort(rng.choice(1000, 100, replace=False)).astype(np.uint64)
        vb = np.sort(rng.choice(1000, 100, replace=False)).astype(np.uint64)
        base = np.uint64(i) << np.uint64(61)
        a[i, :100] = base + va
        b[i, :100] = base + vb
        all_vals |= {int(base + x) for x in va} | {int(base + x) for x in vb}
    fn = sharded_union_counts(mesh)
    out, n, total = fn(a, b)
    assert int(np.asarray(total)[0]) == len(all_vals)


def test_sharded_set_ops_match_numpy(rng, mesh):
    from unikmer_tpu.parallel.sharded import (
        partition_host_set, sharded_set_op, sharded_common,
    )

    D = mesh.shape[SHARD_AXIS]
    cap = 512
    a = np.unique(rng.integers(0, 1 << 62, 1500, dtype=np.uint64))
    b = np.unique(rng.integers(0, 1 << 62, 1500, dtype=np.uint64))
    b[: len(a) // 3] = a[: len(a) // 3]  # force overlap
    b = np.unique(b)
    sa = partition_host_set(a, D, cap, code_bits=62)
    sb = partition_host_set(b, D, cap, code_bits=62)
    want = {
        "union": np.union1d(a, b),
        "inter": np.intersect1d(a, b),
        "diff": np.setdiff1d(a, b),
    }
    for op, w in want.items():
        fn = sharded_set_op(mesh, op)
        out, n, total = fn(sa, sb)
        assert int(np.asarray(total)[0]) == len(w)
        got = []
        out = np.asarray(out)
        for i in range(D):
            got.append(out[i][: int(np.asarray(n)[i])])
        np.testing.assert_array_equal(np.concatenate(got), w)

    # common over 4 stacked sets, threshold 2
    sets = [np.unique(rng.integers(0, 1 << 62, 800, dtype=np.uint64))
            for _ in range(4)]
    sets[1][:200] = sets[0][:200]
    sets[1] = np.unique(sets[1])
    stacked = np.stack([partition_host_set(s, D, cap, code_bits=62) for s in sets], axis=1)
    fn = sharded_common(mesh, 2)
    out, n, total = fn(stacked)
    from collections import Counter

    cnt = Counter()
    for s in sets:
        cnt.update(set(s.tolist()))
    w = np.array(sorted(c for c, m in cnt.items() if m >= 2), np.uint64)
    assert int(np.asarray(total)[0]) == len(w)


def test_sharded_union_taxids_lca(rng, mesh):
    import os

    from unikmer_tpu.parallel.sharded import (
        partition_host_set, sharded_union_taxids,
    )
    from unikmer_tpu.taxonomy.taxdump import load_taxonomy
    from unikmer_tpu.taxonomy.lca import device_tables

    taxdb = load_taxonomy(os.path.join(os.path.dirname(__file__), "data", "taxdump"))
    parent, depth, max_depth = device_tables(taxdb)
    D = mesh.shape[SHARD_AXIS]
    a = np.unique(rng.integers(0, 1 << 62, 600, dtype=np.uint64))
    b = a.copy()  # full overlap: every code LCA-merges
    ta = np.full(len(a), 511145, np.uint32)
    tb = np.full(len(b), 585057, np.uint32)
    sa, sta = partition_host_set(a, D, 256, code_bits=62, taxids=ta)
    sb, stb = partition_host_set(b, D, 256, code_bits=62, taxids=tb)
    fn = sharded_union_taxids(mesh, int(max_depth))
    c, t, n, total = fn(sa, sta, sb, stb, parent, depth)
    assert int(np.asarray(total)[0]) == len(a)
    c, t, n = np.asarray(c), np.asarray(t), np.asarray(n)
    got_c, got_t = [], []
    for i in range(D):
        got_c.append(c[i][: n[i]])
        got_t.append(t[i][: n[i]])
    np.testing.assert_array_equal(np.concatenate(got_c), a)
    assert (np.concatenate(got_t) == 562).all()  # strains -> species LCA
