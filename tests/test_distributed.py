"""Distributed orchestration: host partitioning + end-to-end sharded count."""

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
    out, counts, dropped = distributed.sharded_count_distinct(
        [str(p)], cfg, mesh, capacity=2048
    )
    assert int(np.asarray(dropped)[0]) == 0
    got = np.concatenate(
        [np.asarray(out[i])[: int(np.asarray(counts)[i])] for i in range(8)]
    )
    want = count_packed(pack_files([str(p)], 13), cfg)
    np.testing.assert_array_equal(got, want)
