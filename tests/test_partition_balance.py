"""Balanced mesh partition boundaries (round 5, VERDICT round-4 next
#5): equal-range bucketing loaded shard 0 with 2-1/D of the canonical
code mass (density 2(1-x)) and sent EVERY scaled-sketch hash to shard 0
(kept hashes all lie in [0, 2^64/scale)).  partition_boundaries models
both distributions; these tests pin the balance and exactness."""

import numpy as np
import pytest

from unikmer_tpu.models.count import CountConfig
from unikmer_tpu.parallel.sharded import partition_boundaries


def test_boundaries_canonical_cdf():
    cfg = CountConfig(k=23, canonical=True)
    b = partition_boundaries(4, cfg, 46)
    # F^-1(j/4) = 1 - sqrt(1 - j/4) of the 2^46 space
    space = 2.0 ** 46
    want = (1 - np.sqrt(1 - np.arange(4) / 4)) * space
    np.testing.assert_allclose(b.astype(np.float64), want, rtol=1e-9)
    # simulated canonical codes: near-equal shard loads
    rng = np.random.default_rng(7)
    u = rng.integers(0, 1 << 46, 1 << 18, dtype=np.uint64)
    v = rng.integers(0, 1 << 46, 1 << 18, dtype=np.uint64)
    canon = np.minimum(u, v)
    loads = np.bincount(np.searchsorted(b, canon, side="right") - 1,
                        minlength=4)
    assert loads.max() / loads.mean() < 1.02, loads


def test_boundaries_scaled_covers_kept_range():
    from unikmer_tpu.ops.nthash import scaled_max_hash

    cfg = CountConfig(k=31, canonical=True, hashed=True, scale=15)
    b = partition_boundaries(4, cfg, 64)
    mh = scaled_max_hash(15)
    # equal-range over 2^64 put everything below 2^62 -> shard 0; the
    # balanced bounds split [0, max_hash]
    assert b[-1] > 0 and b[-1] <= np.uint64(mh)
    rng = np.random.default_rng(8)
    kept = rng.integers(0, int(mh) + 1, 1 << 18, dtype=np.uint64)
    loads = np.bincount(np.searchsorted(b, kept, side="right") - 1,
                        minlength=4)
    assert loads.max() / loads.mean() < 1.02, loads


@pytest.mark.parametrize("cfg", [
    CountConfig(k=23, canonical=True),
    CountConfig(k=31, canonical=True, hashed=True, scale=15),
    CountConfig(k=17, canonical=False),
])
def test_mesh_balanced_and_exact(rng, cfg):
    """mesh_count_distinct with balanced boundaries: byte-identical to
    the single-device count AND per-shard loads within 2x of mean
    (scaled configs were 100%-on-shard-0 before)."""
    from unikmer_tpu.io.fastx import PackedSeqs
    from unikmer_tpu.models.count import count_packed
    from unikmer_tpu.parallel.mesh import make_mesh
    from unikmer_tpu.parallel.sharded import (
        build_sharded_distinct, pack_host_shards, _default_capacity,
        SHARD_AXIS,
    )
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    bases = rng.integers(0, 4, size=1 << 16, dtype=np.uint8)
    packed = PackedSeqs(bases, np.zeros(1, np.int64),
                        np.asarray([len(bases)], np.int64))
    want = count_packed(packed, cfg)
    d = 4
    mesh = make_mesh(d)
    windows = len(bases) - cfg.k + 1
    cap = _default_capacity(windows, d)
    rows = pack_host_shards(bases, d, cfg.k)
    dev = jax.device_put(rows, NamedSharding(mesh, P(SHARD_AXIS, None)))
    step = build_sharded_distinct(mesh, cfg, cap)
    out, counts, dropped, _sent = step(dev)
    assert int(np.asarray(dropped)[0]) == 0
    counts = np.asarray(counts)
    got = np.concatenate([
        np.asarray(out[i][: counts[i]]) for i in range(d)
    ])
    np.testing.assert_array_equal(got, want)
    assert counts.max() <= 2 * max(counts.mean(), 1), counts
