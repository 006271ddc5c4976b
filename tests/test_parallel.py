"""Sharded (multi-device) pipeline tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from unikmer_tpu.models.count import CountConfig
from unikmer_tpu.ops import codec
from unikmer_tpu.parallel.mesh import make_mesh
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
    out, counts, dropped = step(rows)
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
    out, counts, dropped = step(rows)
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
    out, counts, dropped = step(rows)
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
