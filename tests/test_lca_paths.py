"""Large-vocabulary path-matrix LCA tier (taxonomy/lca.path_tables +
lca_collapse_paths): the device taxid routes past the 4,096-taxid
closure-table cap (VERDICT round-2 next #2; reference loads the full
~2.4M-node NCBI dump, unikmer/cmd/util.go:119-171)."""

import os

import numpy as np
import pytest

from unikmer_tpu.taxonomy.lca import (
    closure_for_vocab,
    compact_ids,
    device_lca_plan,
    lca_closure,
    path_tables,
)
from unikmer_tpu.taxonomy.taxdump import Taxonomy, load_taxonomy

TAXDUMP = os.path.join(os.path.dirname(__file__), "data", "taxdump")


def synth_taxonomy(rng, n_nodes: int, chain: int = 0) -> Taxonomy:
    """Random single-rooted tree over taxids 1..n_nodes (parent of t is
    uniform in [1, t), so depth ~ O(log n)); ``chain`` optionally grafts
    a linear chain at the end to force depth."""
    parent = np.zeros(n_nodes + 1, np.uint32)
    depth = np.full(n_nodes + 1, -1, np.int64)
    parent[1], depth[1] = 1, 0
    if n_nodes > 1:
        p = rng.integers(1, np.arange(2, n_nodes + 1 - chain))
        parent[2 : n_nodes + 1 - chain] = p
        for t in range(2, n_nodes + 1 - chain):
            depth[t] = depth[parent[t]] + 1
    for t in range(n_nodes + 1 - chain, n_nodes + 1):
        parent[t] = t - 1
        depth[t] = depth[t - 1] + 1
    return Taxonomy(
        parent=parent,
        depth=depth.astype(np.int16),
        rank_ids=np.full(n_nodes + 1, -1, np.int16),
        ranks=[],
    )


def _paths_lca(anc, tab, a, b):
    """Host reference of the device meet: deepest common entry."""
    ia, ib = compact_ids(anc, [a, b])
    pa, pb = tab[ia], tab[ib]
    eq = (pa == pb) & (pa >= 0)
    pref = np.cumprod(eq)
    if pref.sum() == 0:
        if pa[0] < 0:
            return int(anc[pb[max((pb >= 0).sum() - 1, 0)]]) if (pb >= 0).any() else 0
        if pb[0] < 0:
            return int(anc[pa[max((pa >= 0).sum() - 1, 0)]]) if (pa >= 0).any() else 0
        return 0
    return int(anc[pa[pref.sum() - 1]])


def test_path_tables_pairwise_random_tree(rng):
    taxdb = synth_taxonomy(rng, 5000, chain=30)
    vocab = np.unique(rng.integers(1, 5001, 800)).astype(np.uint32)
    anc, tab = path_tables(taxdb, vocab)
    assert anc[0] == 0 and tab.shape[0] == len(anc)
    # every vocab member is in the closure, and its path ends at itself
    ids = compact_ids(anc, vocab)
    for i in (0, len(vocab) // 2, len(vocab) - 1):
        row = tab[ids[i]]
        assert anc[row[(row >= 0).sum() - 1]] == vocab[i]
    # pairwise meet via deepest-common-entry == host tree LCA
    sample = rng.choice(vocab, 60)
    got = np.array(
        [_paths_lca(anc, tab, a, b) for a in sample[:12] for b in sample[:12]]
    )
    aa = np.repeat(sample[:12], 12)
    bb = np.tile(sample[:12], 12)
    want = taxdb.lca_pairs(aa, bb)
    np.testing.assert_array_equal(got, want)
    # identity: meet with taxid 0 (empty path)
    for a in sample[:5]:
        assert _paths_lca(anc, tab, 0, a) == a
        assert _paths_lca(anc, tab, a, 0) == a


def test_path_tables_matches_closure_table():
    """On a small vocabulary both tiers exist; their closures and all
    pairwise LCAs must be identical."""
    taxdb = load_taxonomy(TAXDUMP)
    vocab = np.array([511145, 585057, 349741, 562], np.uint32)
    closure, ctab = lca_closure(taxdb, vocab)
    anc, ptab = path_tables(taxdb, vocab)
    np.testing.assert_array_equal(anc, closure)
    for i in range(len(anc)):
        for j in range(len(anc)):
            want = closure[ctab[i, j]]
            got = _paths_lca(anc, ptab, int(anc[i]), int(anc[j]))
            assert got == want, (anc[i], anc[j])


def test_collapse_paths_equals_collapse_compact(rng, monkeypatch):
    """Same inputs through both device collapses -> identical taxids."""
    import jax.numpy as jnp

    from unikmer_tpu.taxonomy.lca import (
        lca_collapse_compact, lca_collapse_paths,
    )

    taxdb = load_taxonomy(TAXDUMP)
    vocab = np.array([0, 511145, 585057, 349741, 562, 561], np.uint32)
    closure, ctab = lca_closure(taxdb, vocab)
    anc, ptab = path_tables(taxdb, vocab)
    np.testing.assert_array_equal(anc, closure)
    n = 256
    codes = rng.integers(0, 40, n).astype(np.uint64)
    tax = vocab[rng.integers(0, len(vocab), n)]
    valid = rng.random(n) < 0.9
    ids = jnp.asarray(compact_ids(closure, tax))
    c = jnp.asarray(codes)
    v = jnp.asarray(valid)
    rounds = 8
    # code_bits=64 takes the two-operand sort; 8 packs (code, valid,
    # id) into one u64 key (lca._collapse_sort); the last arm forces
    # the experimental u64-free (u32,u32,i32) fallback (read at trace
    # time; code_bits=63 is unpackable so it routes there) — all agree
    ref = None
    for cb, sort_env in ((64, ""), (8, ""), (63, "split3")):
        if sort_env:
            monkeypatch.setenv("UNIKMER_TPU_TAXID_SORT", sort_env)
        else:
            monkeypatch.delenv("UNIKMER_TPU_TAXID_SORT", raising=False)
        cc, tc, kc, vc = lca_collapse_compact(
            c, ids, v, jnp.asarray(ctab), rounds, cb)
        cp, tp, kp, vp = lca_collapse_paths(
            c, ids, v, jnp.asarray(ptab), rounds, cb)
        np.testing.assert_array_equal(np.asarray(kc), np.asarray(kp))
        keep = np.asarray(kc)
        np.testing.assert_array_equal(
            np.asarray(cc)[keep], np.asarray(cp)[keep])
        np.testing.assert_array_equal(
            closure[np.asarray(tc)[keep]], anc[np.asarray(tp)[keep]]
        )
        got = (np.asarray(cc)[keep], closure[np.asarray(tc)[keep]])
        if ref is None:
            ref = got
        else:
            np.testing.assert_array_equal(ref[0], got[0])
            np.testing.assert_array_equal(ref[1], got[1])


def test_device_lca_plan_tiers(monkeypatch, rng):
    taxdb = load_taxonomy(TAXDUMP)
    plan = device_lca_plan(taxdb, np.array([511145, 585057], np.uint32))
    assert plan is not None and plan[0] == "table"
    # force the paths tier with a zero table cap
    monkeypatch.setenv("UNIKMER_TPU_TAXID_VOCAB_MAX", "0")
    plan = device_lca_plan(taxdb, np.array([511145, 585057], np.uint32))
    assert plan is not None and plan[0] == "paths"
    # unknown nonzero taxid: no device route in any tier
    assert device_lca_plan(taxdb, np.array([99999999], np.uint32)) is None
    # depth cap declines
    monkeypatch.setenv("UNIKMER_TPU_TAXID_PATH_DEPTH_MAX", "1")
    assert device_lca_plan(taxdb, np.array([511145, 562], np.uint32)) is None


def test_count_taxids_paths_tier_matches_host(rng, monkeypatch):
    """count -T through the forced paths tier == host engine exactly."""
    import re

    from tests.conftest import random_dna
    from unikmer_tpu.io.fastx import Record
    from unikmer_tpu.models.count import CountConfig, count_packed_taxids

    taxdb = load_taxonomy(TAXDUMP)
    shared = random_dna(rng, 400).decode()
    recs = []
    for i, t in enumerate((511145, 585057, 349741, 562, 511145)):
        seq = shared + random_dna(rng, 300 + 41 * i).decode()
        recs.append(Record(b"r%d taxid|%d" % (i, t), b"", seq.encode()))
    re_taxid = re.compile(rb"taxid\|(\d+)")
    for cfg in (
        CountConfig(k=15, canonical=True),
        CountConfig(k=15, canonical=True, mode="unique"),
        CountConfig(k=15, hashed=True, scale=3),
    ):
        monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "0")
        want_c, want_t = count_packed_taxids(iter(recs), cfg, re_taxid, taxdb)
        monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "auto")
        monkeypatch.setenv("UNIKMER_TPU_TAXID_VOCAB_MAX", "0")
        got_c, got_t = count_packed_taxids(iter(recs), cfg, re_taxid, taxdb)
        np.testing.assert_array_equal(got_c, want_c, err_msg=str(cfg))
        np.testing.assert_array_equal(got_t, want_t, err_msg=str(cfg))


def test_device_collapse_admissible_tpu_gate(monkeypatch):
    """Round-5 contract: on tpu, packable configs are always admitted;
    UNPACKABLE ones (k>=24 2-bit big vocab, full hashes) are admitted
    iff the staged split3 3-buffer route will serve them (chip-proven
    EXACT, scripts/chip_round5.sh) — and decline to the host tiers when
    that route is opted out (the monolithic 2-op graph still
    compile-starves this backend, BENCH_NOTES round-3)."""
    import jax

    from unikmer_tpu.taxonomy.lca import device_collapse_admissible

    assert device_collapse_admissible(46, 100)       # k=23: packed
    assert device_collapse_admissible(64, 100)       # cpu: anything
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert device_collapse_admissible(46, 100)
    assert device_collapse_admissible(58, 8)         # k=29, tiny vocab
    # unpackable: admitted by default (staged split3, round 5)
    assert device_collapse_admissible(62, 100)       # k=31 big vocab
    assert device_collapse_admissible(64, 100)       # hashes
    # opting the staged split3 route out declines the device again
    monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGED", "0")
    assert not device_collapse_admissible(64, 100)
    assert device_collapse_admissible(46, 100)       # packable unaffected
    monkeypatch.setenv("UNIKMER_TPU_TAXID_2OP", "1")
    assert device_collapse_admissible(64, 100)       # explicit override


def test_count_taxids_stream_device_matches_host(rng, monkeypatch):
    """The streamed device -T tier (inputs beyond the single-program
    bucket) must match the host reduction exactly for every mode and
    both LCA tiers."""
    import re

    from tests.conftest import random_dna
    from unikmer_tpu.io.fastx import Record
    from unikmer_tpu.models.count import (
        CountConfig, count_taxids_from_packed, count_taxids_stream_device,
        parse_taxid_records,
    )

    taxdb = load_taxonomy(TAXDUMP)
    shared = random_dna(rng, 300).decode()
    recs = []
    for i, t in enumerate((511145, 585057, 349741, 562, 511145, 561)):
        seq = shared + random_dna(rng, 250 + 37 * i).decode()
        recs.append(Record(b"r%d taxid|%d" % (i, t), b"", seq.encode()))
    re_taxid = re.compile(rb"taxid\|(\d+)")
    for vocab_cap in (None, "0"):
        if vocab_cap is not None:
            monkeypatch.setenv("UNIKMER_TPU_TAXID_VOCAB_MAX", vocab_cap)
        for mode in ("distinct", "unique", "repeated"):
            cfg = CountConfig(k=15, canonical=True, mode=mode)
            packed, rec_taxids = parse_taxid_records(iter(recs), cfg,
                                                     re_taxid)
            monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "0")
            want = count_taxids_from_packed(packed, rec_taxids, cfg, taxdb)
            monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "auto")
            plan = device_lca_plan(taxdb, rec_taxids)
            assert plan is not None
            got = count_taxids_stream_device(
                packed, rec_taxids, cfg, plan, taxdb, chunk_bases=500)
            np.testing.assert_array_equal(got[0], want[0],
                                          err_msg=f"{mode} {vocab_cap}")
            np.testing.assert_array_equal(got[1], want[1],
                                          err_msg=f"{mode} {vocab_cap}")


def test_union_100k_taxid_vocabulary(rng, monkeypatch):
    """The VERDICT done-condition: device taxid union exact on a
    synthetic 100k-taxid vocabulary (CPU backend), closure tier still
    taken for small vocabularies."""
    from unikmer_tpu.ops.device_sets import union_taxids_device

    taxdb = synth_taxonomy(rng, 300_000, chain=35)
    vocab = np.unique(rng.integers(1, 300_001, 130_000)).astype(np.uint32)
    assert len(vocab) >= 100_000
    plan = device_lca_plan(taxdb, vocab)
    assert plan is not None and plan[0] == "paths"
    assert len(plan[1]) > 0xFFFF  # u32 egress ids exercised
    n = 120_000
    codes = rng.integers(0, 60_000, n).astype(np.uint64)
    taxids = vocab[rng.integers(0, len(vocab), n)]
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", "1")
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_INGRESS", "1")
    got = union_taxids_device([codes], [taxids], taxdb)
    assert got is not None
    want_c, want_t = taxdb.lca_reduce(codes, taxids)
    np.testing.assert_array_equal(got[0], want_c)
    np.testing.assert_array_equal(got[1], want_t)
