"""Device sorted-set algebra vs numpy set semantics."""

import numpy as np
import pytest

from unikmer_tpu.ops import device_sets as ds


def padded(vals, cap):
    out = np.full(cap, ds.SENT, dtype=np.uint64)
    v = np.sort(np.asarray(vals, np.uint64))
    out[: len(v)] = v
    return out


@pytest.fixture()
def ab(rng):
    a = rng.choice(10000, 300, replace=False)
    b = rng.choice(10000, 400, replace=False)
    return a, b


def unpack(res):
    codes, n = res
    return np.asarray(codes)[: int(n)].tolist()


def test_union(ab):
    a, b = ab
    got = unpack(ds.union(padded(a, 512), padded(b, 512)))
    assert got == sorted(set(a) | set(b))


def test_intersect(ab):
    a, b = ab
    got = unpack(ds.intersect(padded(a, 512), padded(b, 512)))
    assert got == sorted(set(a) & set(b))


def test_subtract(ab):
    a, b = ab
    got = unpack(ds.subtract(padded(a, 512), padded(b, 512)))
    assert got == sorted(set(a) - set(b))


def test_common(rng):
    sets_np = [rng.choice(1000, 200, replace=False) for _ in range(4)]
    stacked = np.stack([padded(s, 256) for s in sets_np])
    got = unpack(ds.common(stacked, 3))
    from collections import Counter

    counts = Counter(x for s in sets_np for x in set(s))
    assert got == sorted(c for c, n in counts.items() if n >= 3)


def test_empty_sets():
    e = padded([], 64)
    assert unpack(ds.union(e, e)) == []
    assert unpack(ds.intersect(e, padded([1, 2], 64))) == []
    assert unpack(ds.subtract(padded([1, 2], 64), e)) == [1, 2]


def test_union_with_taxids_lca(rng):
    import os

    from unikmer_tpu.taxonomy.taxdump import load_taxonomy
    from unikmer_tpu.taxonomy.lca import device_tables

    taxdb = load_taxonomy(
        os.path.join(os.path.dirname(__file__), "data", "taxdump")
    )
    parent, depth, max_depth = device_tables(taxdb)
    a = padded([10, 20, 30], 16)
    b = padded([20, 30, 40], 16)
    ta = np.zeros(16, np.uint32); ta[:3] = [511145, 511145, 562]
    tb = np.zeros(16, np.uint32); tb[:3] = [585057, 349741, 349741]
    codes, taxids, n = ds.union_with_taxids(
        a, ta, b, tb, parent, depth, max_depth, rounds=2
    )
    n = int(n)
    got = {int(c): int(t) for c, t in zip(np.asarray(codes)[:n], np.asarray(taxids)[:n])}
    assert got == {10: 511145, 20: 562, 30: 2, 40: 349741}
