"""Staged device taxid programs (UNIKMER_TPU_TAXID_STAGED): the
3-program split (sort -> merge rounds -> compact/egress) must be
byte-identical to the monolithic graphs for every tier, egress mode,
and multiplicity predicate.  Motivation: the monolith starves the
remote AOT compile helper at 2^23+ on the tpu backend
(docs/BENCH_NOTES.md round-3); reference semantics unchanged
(unikmer/cmd/union.go:195-202, count.go:377-410)."""

import os
import re

import numpy as np
import pytest

from tests.test_lca_paths import synth_taxonomy
from unikmer_tpu.taxonomy.taxdump import load_taxonomy

TAXDUMP = os.path.join(os.path.dirname(__file__), "data", "taxdump")


def _union_both_ways(monkeypatch, codes_list, tax_list, taxdb, code_bits,
                     compress: str):
    from unikmer_tpu.ops.device_sets import union_taxids_device

    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", compress)
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_INGRESS", compress)
    out = {}
    for staged in ("0", "1"):
        monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGED", staged)
        out[staged] = union_taxids_device(
            codes_list, tax_list, taxdb, code_bits=code_bits)
    return out["0"], out["1"]


@pytest.mark.parametrize("compress", ["0", "1"])
def test_union_staged_matches_monolith_table_tier(rng, monkeypatch,
                                                  compress):
    taxdb = load_taxonomy(TAXDUMP)
    vocab = np.array([511145, 585057, 349741, 562, 561], np.uint32)
    a = np.unique(rng.integers(0, 50_000, 4000).astype(np.uint64))
    b = np.unique(rng.integers(0, 50_000, 4000).astype(np.uint64))
    ta = vocab[rng.integers(0, len(vocab), len(a))]
    tb = vocab[rng.integers(0, len(vocab), len(b))]
    mono, staged = _union_both_ways(
        monkeypatch, [a, b], [ta, tb], taxdb, 46, compress)
    assert mono is not None and staged is not None
    np.testing.assert_array_equal(staged[0], mono[0])
    np.testing.assert_array_equal(staged[1], mono[1])
    # and both equal the host oracle
    want_c, want_t = taxdb.lca_reduce(
        np.concatenate([a, b]), np.concatenate([ta, tb]))
    np.testing.assert_array_equal(staged[0], want_c)
    np.testing.assert_array_equal(staged[1], want_t)


def test_union_staged_matches_monolith_paths_tier(rng, monkeypatch):
    """Forced paths tier, wide (u32) egress ids, compressed transfers."""
    taxdb = synth_taxonomy(rng, 300_000, chain=35)
    vocab = np.unique(rng.integers(1, 300_001, 130_000)).astype(np.uint32)
    monkeypatch.setenv("UNIKMER_TPU_TAXID_VOCAB_MAX", "0")
    n = 60_000
    codes = rng.integers(0, 40_000, n).astype(np.uint64)
    taxids = vocab[rng.integers(0, len(vocab), n)]
    mono, staged = _union_both_ways(
        monkeypatch, [codes], [taxids], taxdb, 46, "1")
    assert mono is not None and staged is not None
    np.testing.assert_array_equal(staged[0], mono[0])
    np.testing.assert_array_equal(staged[1], mono[1])
    want_c, want_t = taxdb.lca_reduce(codes, taxids)
    np.testing.assert_array_equal(staged[0], want_c)
    np.testing.assert_array_equal(staged[1], want_t)


def test_union_staged_unpackable_split3(rng, monkeypatch):
    """code_bits=64 can't pack the id beside the code: the staged gate
    now routes through the 3-buffer split3 handoff (round 5, VERDICT
    round-4 next #2) — byte-identical to the monolith and the host
    oracle; UNIKMER_TPU_TAXID_SPLIT3_STAGED=0 restores the monolithic
    fallback, also byte-identical."""
    taxdb = load_taxonomy(TAXDUMP)
    codes = np.unique(rng.integers(0, 1 << 63, 3000).astype(np.uint64))
    taxids = np.full(len(codes), 511145, np.uint32)
    mono, staged = _union_both_ways(
        monkeypatch, [codes], [taxids], taxdb, 64, "0")
    assert mono is not None and staged is not None
    np.testing.assert_array_equal(staged[0], mono[0])
    np.testing.assert_array_equal(staged[1], mono[1])
    monkeypatch.setenv("UNIKMER_TPU_TAXID_SPLIT3_STAGED", "0")
    mono2, staged_off = _union_both_ways(
        monkeypatch, [codes], [taxids], taxdb, 64, "0")
    np.testing.assert_array_equal(staged_off[0], mono[0])
    np.testing.assert_array_equal(staged_off[1], mono[1])


@pytest.mark.parametrize("compress", ["0", "1"])
def test_union_staged_split3_multiset(rng, monkeypatch, compress):
    """Split3 staged union over full-range hashed codes with real
    collisions + a mixed vocabulary, vs the host LCA oracle, both
    egress modes; also pins that stage 1 really took the split3 sort
    (spy on _staged_sort_raw_split3 / _staged_sort_ingress_split3)."""
    import unikmer_tpu.ops.device_sets as ds

    taxdb = load_taxonomy(TAXDUMP)
    vocab = np.array([511145, 585057, 349741, 562, 561], np.uint32)
    a = rng.integers(0, 1 << 63, 4000, dtype=np.uint64)
    a[::5] = a[1]  # heavy collision run
    b = rng.integers(0, 1 << 63, 3000, dtype=np.uint64)
    b[: 500] = a[: 500]  # cross-set merges
    ta = vocab[rng.integers(0, len(vocab), len(a))]
    tb = vocab[rng.integers(0, len(vocab), len(b))]
    monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGED", "1")
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", compress)
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_INGRESS", compress)
    hits = {"n": 0}
    orig_raw, orig_ing = ds._staged_sort_raw_split3, \
        ds._staged_sort_ingress_split3

    def spy_raw(*args):
        hits["n"] += 1
        return orig_raw(*args)

    def spy_ing(*args):
        hits["n"] += 1
        return orig_ing(*args)

    monkeypatch.setattr(ds, "_staged_sort_raw_split3", spy_raw)
    monkeypatch.setattr(ds, "_staged_sort_ingress_split3", spy_ing)
    got = ds.union_taxids_device([a, b], [ta, tb], taxdb, code_bits=64)
    assert got is not None and hits["n"] == 1
    want_c, want_t = taxdb.lca_reduce(
        np.concatenate([a, b]), np.concatenate([ta, tb]))
    np.testing.assert_array_equal(got[0], want_c)
    np.testing.assert_array_equal(got[1], want_t)


@pytest.mark.parametrize("mode", ["distinct", "unique", "repeated"])
def test_count_taxids_hashed_staged_split3(rng, monkeypatch, mode):
    """count -T with ntHash (code_bits=64, UNPACKABLE): the staged
    split3 device route must match the jax-free host oracle for every
    multiplicity mode (reference: count.go:377-410)."""
    import re

    from tests.conftest import random_dna
    from unikmer_tpu.io.fastx import Record
    from unikmer_tpu.models.count import CountConfig, count_packed_taxids

    taxdb = load_taxonomy(TAXDUMP)
    shared = random_dna(rng, 350).decode()
    recs = []
    for i, t in enumerate((511145, 585057, 349741, 562, 585057)):
        seq = shared + random_dna(rng, 280 + 37 * i).decode()
        recs.append(Record(b"r%d taxid|%d" % (i, t), b"", seq.encode()))
    re_taxid = re.compile(rb"taxid\|(\d+)")
    cfg = CountConfig(k=31, canonical=True, hashed=True, mode=mode)
    monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "0")
    want = count_packed_taxids(iter(recs), cfg, re_taxid, taxdb)
    monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "1")
    monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGED", "1")
    for compress in ("0", "1"):
        monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", compress)
        got = count_packed_taxids(iter(recs), cfg, re_taxid, taxdb)
        np.testing.assert_array_equal(got[0], want[0],
                                      err_msg=f"{mode} z={compress}")
        np.testing.assert_array_equal(got[1], want[1],
                                      err_msg=f"{mode} z={compress}")


@pytest.mark.parametrize("mode", ["distinct", "unique", "repeated"])
def test_count_taxids_staged_matches_monolith(rng, monkeypatch, mode):
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
    cfg = CountConfig(k=15, canonical=True,
                      mode=mode if mode != "distinct" else "distinct")
    monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "auto")
    for compress in ("0", "1"):
        monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", compress)
        got = {}
        for staged in ("0", "1"):
            monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGED", staged)
            got[staged] = count_packed_taxids(iter(recs), cfg, re_taxid,
                                              taxdb)
        np.testing.assert_array_equal(got["1"][0], got["0"][0],
                                      err_msg=f"{mode} z={compress}")
        np.testing.assert_array_equal(got["1"][1], got["0"][1],
                                      err_msg=f"{mode} z={compress}")
    # and the host oracle agrees
    monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "0")
    want = count_packed_taxids(iter(recs), cfg, re_taxid, taxdb)
    np.testing.assert_array_equal(got["1"][0], want[0])
    np.testing.assert_array_equal(got["1"][1], want[1])


def test_count_taxids_staged_paths_tier(rng, monkeypatch):
    """Staged + forced paths tier through the full count -T engine."""
    from tests.conftest import random_dna
    from unikmer_tpu.io.fastx import Record
    from unikmer_tpu.models.count import CountConfig, count_packed_taxids

    taxdb = load_taxonomy(TAXDUMP)
    shared = random_dna(rng, 300).decode()
    recs = []
    for i, t in enumerate((511145, 585057, 349741, 562)):
        seq = shared + random_dna(rng, 260 + 31 * i).decode()
        recs.append(Record(b"r%d taxid|%d" % (i, t), b"", seq.encode()))
    re_taxid = re.compile(rb"taxid\|(\d+)")
    cfg = CountConfig(k=15, canonical=True)
    monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "0")
    want = count_packed_taxids(iter(recs), cfg, re_taxid, taxdb)
    monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "auto")
    monkeypatch.setenv("UNIKMER_TPU_TAXID_VOCAB_MAX", "0")
    monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGED", "1")
    got = count_packed_taxids(iter(recs), cfg, re_taxid, taxdb)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_mesh_setop_staged_matches_unstaged(rng, monkeypatch):
    """mesh_set_op_taxids through the 3-program staged per-shard
    collapse == the monolithic shard program, all four ops."""
    from unikmer_tpu.parallel.sharded import mesh_set_op_taxids

    taxdb = load_taxonomy(TAXDUMP)
    vocab = np.array([511145, 585057, 349741, 562, 561], np.uint32)
    sets, taxs = [], []
    for _ in range(3):
        c = np.unique(rng.integers(0, 30_000, 2500).astype(np.uint64))
        sets.append(c)
        taxs.append(vocab[rng.integers(0, len(vocab), len(c))])
    for op, thr in (("union", None), ("inter", None), ("diff", None),
                    ("common", 2)):
        got = {}
        for staged in ("0", "1"):
            monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGED", staged)
            got[staged] = mesh_set_op_taxids(
                op, sets, taxs, taxdb, n_devices=4, code_bits=38,
                threshold=thr)
        assert got["0"] is not None and got["1"] is not None
        np.testing.assert_array_equal(got["1"][0], got["0"][0],
                                      err_msg=op)
        np.testing.assert_array_equal(got["1"][1], got["0"][1],
                                      err_msg=op)


@pytest.mark.parametrize("mode", ["distinct", "unique"])
def test_mesh_count_taxids_staged_matches_unstaged(rng, monkeypatch, mode):
    from tests.conftest import random_dna
    from unikmer_tpu.io.fastx import Record
    from unikmer_tpu.models.count import CountConfig, parse_taxid_records
    from unikmer_tpu.parallel.sharded import mesh_count_taxids

    taxdb = load_taxonomy(TAXDUMP)
    shared = random_dna(rng, 500).decode()
    recs = []
    for i, t in enumerate((511145, 585057, 349741, 562)):
        seq = shared + random_dna(rng, 400 + 53 * i).decode()
        recs.append(Record(b"r%d taxid|%d" % (i, t), b"", seq.encode()))
    cfg = CountConfig(k=15, canonical=True, mode=mode)
    packed, rec_taxids = parse_taxid_records(
        iter(recs), cfg, re.compile(rb"taxid\|(\d+)"))
    got = {}
    for staged in ("0", "1"):
        monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGED", staged)
        got[staged] = mesh_count_taxids(packed, rec_taxids, taxdb, cfg,
                                        n_devices=4)
    assert got["0"] is not None and got["1"] is not None
    np.testing.assert_array_equal(got["1"][0], got["0"][0])
    np.testing.assert_array_equal(got["1"][1], got["0"][1])


def test_staged_overflow_fallback_reruns_stage3_only(rng, monkeypatch):
    """Exception-list overflow on the compressed egress must re-run
    ONLY stage 3 (raw egress over the device-resident stage-2 outputs),
    never the monolithic collapse — and stay exact."""
    import unikmer_tpu.models.count as count_mod
    from unikmer_tpu.ops.device_sets import union_taxids_device

    taxdb = load_taxonomy(TAXDUMP)
    vocab = np.array([511145, 585057, 349741], np.uint32)
    codes = np.unique(rng.integers(0, 50_000, 3000).astype(np.uint64))
    taxids = vocab[rng.integers(0, len(vocab), len(codes))]
    monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGED", "1")
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", "1")
    # any n_exc now "overflows": fetch_taxid_result takes raw_fn.
    # Patch the FETCH-time limit only — patching _MAX_EXC itself breaks
    # re-tracing (shape (-1,)) whenever the suite's VMA guard has
    # cleared the jit caches before this test runs.
    monkeypatch.setattr(count_mod, "_exc_overflow_limit", lambda: -1)

    def boom(*a, **k):  # the monolith must NOT be dispatched
        raise AssertionError("monolithic collapse dispatched from "
                             "the staged overflow fallback")

    import unikmer_tpu.ops.device_sets as ds
    monkeypatch.setattr(ds, "union_taxids_compact", boom)
    got = union_taxids_device([codes], [taxids], taxdb, code_bits=46)
    assert got is not None
    want_c, want_t = taxdb.lca_reduce(codes, taxids)
    np.testing.assert_array_equal(got[0], want_c)
    np.testing.assert_array_equal(got[1], want_t)


def test_stage2_split_matches_fused(rng, monkeypatch):
    """UNIKMER_TPU_TAXID_STAGE2_SPLIT=1 (the 4-program compile bisect
    mode) must be byte-identical to the fused stage-2 program."""
    import numpy as np

    from unikmer_tpu.ops.device_sets import union_taxids_device
    from unikmer_tpu.taxonomy.taxdump import load_taxonomy

    taxdb = load_taxonomy(TAXDUMP)
    codes = rng.integers(0, 1 << 40, 3000, dtype=np.uint64)
    codes[::7] = codes[0]  # collisions to merge
    taxids = rng.choice(np.asarray([511145, 585057, 562, 349741],
                                   np.uint32), 3000)
    monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGED", "1")
    monkeypatch.delenv("UNIKMER_TPU_TAXID_STAGE2_SPLIT", raising=False)
    want = union_taxids_device([codes], [taxids], taxdb, code_bits=40)
    monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGE2_SPLIT", "1")
    got = union_taxids_device([codes], [taxids], taxdb, code_bits=40)
    np.testing.assert_array_equal(want[0], got[0])
    np.testing.assert_array_equal(want[1], got[1])


def test_unpackable_admission_flip(monkeypatch):
    """Round-5 admission flip: on tpu, unpackable configs (code_bits=64)
    are admitted iff the staged split3 route will serve them
    (chip-proven EXACT, scripts/chip_round5.sh 2026-08-21)."""
    import unikmer_tpu.taxonomy.lca as lca_mod

    monkeypatch.setattr(lca_mod.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("UNIKMER_TPU_TAXID_SORT", raising=False)
    monkeypatch.delenv("UNIKMER_TPU_TAXID_STAGED", raising=False)
    monkeypatch.delenv("UNIKMER_TPU_TAXID_SPLIT3_STAGED", raising=False)
    # default ("auto" staged is on for non-cpu): admitted
    assert lca_mod.device_collapse_admissible(64, 5)
    # packable stays admitted regardless
    assert lca_mod.device_collapse_admissible(46, 5)
    # explicit opt-outs decline the device again
    monkeypatch.setenv("UNIKMER_TPU_TAXID_SPLIT3_STAGED", "0")
    assert not lca_mod.device_collapse_admissible(64, 5)
    monkeypatch.delenv("UNIKMER_TPU_TAXID_SPLIT3_STAGED")
    monkeypatch.setenv("UNIKMER_TPU_TAXID_STAGED", "0")
    assert not lca_mod.device_collapse_admissible(64, 5)
    monkeypatch.delenv("UNIKMER_TPU_TAXID_STAGED")
    monkeypatch.setenv("UNIKMER_TPU_TAXID_SORT", "2op")
    assert not lca_mod.device_collapse_admissible(64, 5)
    # the old experiment override still wins
    monkeypatch.setenv("UNIKMER_TPU_TAXID_2OP", "1")
    assert lca_mod.device_collapse_admissible(64, 5)
