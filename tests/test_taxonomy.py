"""Taxonomy: host loader/LCA + device LCA equivalence."""

import os

import numpy as np
import pytest

from unikmer_tpu.taxonomy.taxdump import load_taxonomy
from unikmer_tpu.taxonomy.lca import (
    device_tables,
    lca_collapse_device,
    lca_pairs_device,
)

TAXDUMP = os.path.join(os.path.dirname(__file__), "data", "taxdump")

KNOWN = [
    (511145, 585057, 562),  # two E. coli strains -> species
    (511145, 511145, 511145),
    (511145, 349741, 2),  # cross-phylum -> Bacteria
    (562, 511145, 562),  # ancestor-descendant
    (1, 562, 1),
    (0, 562, 562),  # 0 is identity
    (562, 0, 562),
    (999999999, 562, 0),  # unknown -> 0
]


@pytest.fixture(scope="module")
def taxdb():
    return load_taxonomy(TAXDUMP)


def test_host_lca_known_pairs(taxdb):
    for a, b, want in KNOWN:
        assert taxdb.lca(a, b) == want, (a, b)


def test_host_lca_vectorized(taxdb, rng):
    a = np.array([p[0] for p in KNOWN], np.uint32)
    b = np.array([p[1] for p in KNOWN], np.uint32)
    want = np.array([p[2] for p in KNOWN], np.uint32)
    np.testing.assert_array_equal(taxdb.lca_pairs(a, b), want)


def test_device_lca_matches_host(taxdb, rng):
    parent, depth, max_depth = device_tables(taxdb)
    ids = np.array(
        [1, 2, 562, 561, 543, 511145, 585057, 349741, 239935, 83333], np.uint32
    )
    a = rng.choice(ids, 200).astype(np.uint32)
    b = rng.choice(ids, 200).astype(np.uint32)
    got = np.asarray(lca_pairs_device(a, b, parent, depth, max_depth))
    want = taxdb.lca_pairs(a, b)
    np.testing.assert_array_equal(got, want)


def test_device_lca_collapse(taxdb, rng):
    parent, depth, max_depth = device_tables(taxdb)
    # three entries of one code from different strains + singletons
    codes = np.array([5, 5, 5, 9, 12, 12, 99], np.uint64)
    tax = np.array([511145, 585057, 511145, 349741, 562, 83333, 7], np.uint32)
    valid = np.array([1, 1, 1, 1, 1, 1, 0], bool)
    s_codes, s_tax, keep = map(
        np.asarray,
        lca_collapse_device(codes, tax, valid, parent, depth, max_depth, 3),
    )
    out = {int(c): int(t) for c, t, k in zip(s_codes, s_tax, keep) if k}
    assert out == {5: 562, 9: 349741, 12: 562}


def test_lca_reduce_host(taxdb):
    codes = np.array([5, 5, 9, 12, 12], np.uint64)
    tax = np.array([511145, 585057, 349741, 562, 83333], np.uint32)
    u, m = taxdb.lca_reduce(codes, tax)
    assert u.tolist() == [5, 9, 12]
    assert m.tolist() == [562, 349741, 562]


@pytest.mark.parametrize("trial", range(5))
def test_lca_reduce_random_vs_bruteforce(taxdb, rng, trial):
    """Random run lengths (incl. singletons, long runs and taxid 0,
    unsorted input) against an elementwise LCA fold.  Unknown taxids
    are excluded: they map to 0 which then acts as the identity, making
    the fold order-dependent (the reference's map-iteration fold is
    equally order-dependent there)."""
    pool = np.array([0, 1, 2, 562, 511145, 585057, 349741, 83333],
                    np.uint32)
    n_runs = int(rng.integers(1, 60))
    keys, taxes = [], []
    for _ in range(n_runs):
        ln = int(rng.choice([1, 1, 1, 2, 3, 7, 19]))
        k = int(rng.integers(0, 1 << 40))
        keys += [k] * ln
        taxes += rng.choice(pool, size=ln).tolist()
    keys = np.array(keys, np.uint64)
    taxes = np.array(taxes, np.uint32)
    if trial % 2 == 0:
        perm = rng.permutation(len(keys))  # unsorted-caller contract
        keys, taxes = keys[perm], taxes[perm]
    got_k, got_t = taxdb.lca_reduce(keys, taxes)
    # brute force
    want = {}
    for k, t in zip(keys.tolist(), taxes.tolist()):
        want[k] = t if k not in want else taxdb.lca(want[k], t)
    assert got_k.tolist() == sorted(want)
    assert got_t.tolist() == [want[k] for k in sorted(want)]


def test_merged_remap(tmp_path, taxdb):
    # merged.dmp remapping
    d = tmp_path / "td"
    d.mkdir()
    (d / "nodes.dmp").write_text("1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tsuperkingdom\t|\n")
    (d / "merged.dmp").write_text("666\t|\t2\t|\n")
    db = load_taxonomy(str(d))
    out = db.remap_merged(np.array([666, 2, 1], np.uint32))
    np.testing.assert_array_equal(out, [2, 2, 1])


def test_rank(taxdb):
    assert taxdb.rank(562) == "species"
    assert taxdb.rank(561) == "genus"
    assert taxdb.rank(123456789) == ""


def test_lca_closure_and_compact_table():
    from unikmer_tpu.taxonomy.lca import compact_ids, lca_closure
    from tests.test_cli_taxid import TAXDUMP  # noqa: F401
    from unikmer_tpu.taxonomy.taxdump import load_taxonomy
    import os

    taxdb = load_taxonomy(
        os.path.join(os.path.dirname(__file__), "data", "taxdump")
    )
    vocab = np.array([511145, 585057, 349741], np.uint32)
    closure, tab = lca_closure(taxdb, vocab)
    assert closure[0] == 0
    # closure is closed under meet: every table entry indexes closure
    assert tab.min() >= 0 and tab.max() < len(closure)
    ids = compact_ids(closure, vocab)
    # pairwise merges through the table == host lca_pairs
    for i, a in enumerate(vocab):
        for j, b in enumerate(vocab):
            got = closure[tab[ids[i], ids[j]]]
            want = int(taxdb.lca_pairs(np.array([a]), np.array([b]))[0])
            assert int(got) == want, (a, b)
    # identity row/col: LCA(0, x) = x
    for i in range(len(closure)):
        assert closure[tab[0, i]] == closure[i]
        assert closure[tab[i, 0]] == closure[i]


def test_count_taxids_device_matches_host_reduce(rng, monkeypatch):
    """count -T's on-device compact-table LCA collapse must match the
    host lca_reduce path byte-for-byte for every mode."""
    import os

    from unikmer_tpu.io.fastx import Record
    from unikmer_tpu.models.count import CountConfig, count_packed_taxids
    from unikmer_tpu.taxonomy.taxdump import load_taxonomy
    import re

    taxdb = load_taxonomy(
        os.path.join(os.path.dirname(__file__), "data", "taxdump")
    )
    from tests.conftest import random_dna

    shared = random_dna(rng, 400).decode()
    recs = []
    for i, t in enumerate((511145, 585057, 349741, 562, 511145)):
        seq = shared + random_dna(rng, 300 + 41 * i).decode()
        recs.append(Record(
            b"r%d taxid|%d" % (i, t), b"", seq.encode()
        ))
    re_taxid = re.compile(rb"taxid\|(\d+)")
    cfgs = [
        CountConfig(k=15, canonical=True, mode=mode, hashed=scale > 1,
                    scale=scale)
        for mode in ("distinct", "unique", "repeated")
        for scale in (1, 3)
    ]
    # sketch + scaled: the device step must apply the scaled filter to
    # the EMITTED sketch stream (count.go:373-375)
    cfgs.append(CountConfig(k=15, minimizer_w=5, scale=3))
    cfgs.append(CountConfig(k=15, syncmer_s=8, scale=3))
    for cfg in cfgs:
        monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "0")
        want_c, want_t = count_packed_taxids(
            iter(recs), cfg, re_taxid, taxdb)
        monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "auto")
        got_c, got_t = count_packed_taxids(
            iter(recs), cfg, re_taxid, taxdb)
        np.testing.assert_array_equal(got_c, want_c, err_msg=str(cfg))
        np.testing.assert_array_equal(got_t, want_t, err_msg=str(cfg))


def test_count_taxids_unknown_vocab_falls_back(rng, monkeypatch):
    # unknown nonzero taxids: order-dependent host rule -> device route
    # must decline (result equals the host engine exactly)
    import os
    import re

    from unikmer_tpu.io.fastx import Record
    from unikmer_tpu.models.count import (
        CountConfig, _device_taxid_route, count_packed_taxids,
    )
    from unikmer_tpu.io.fastx import pack_records
    from unikmer_tpu.taxonomy.taxdump import load_taxonomy
    from tests.conftest import random_dna

    taxdb = load_taxonomy(
        os.path.join(os.path.dirname(__file__), "data", "taxdump")
    )
    recs = [Record(b"r0 taxid|99999999", b"", random_dna(rng, 300))]
    packed = pack_records(recs, 15)
    assert _device_taxid_route(
        packed, np.array([99999999], np.uint32), taxdb) is None


def test_compressed_taxid_fetch_matches_raw(rng, monkeypatch):
    """The compressed taxid egress (u32-delta codes + u16 compact ids)
    must be byte-identical to the raw fetch for count -T and the device
    taxid union (UNIKMER_TPU_COMPRESS_TAXID_FETCH forces the programs
    on CPU)."""
    import os
    import re

    from unikmer_tpu.io.fastx import Record
    from unikmer_tpu.models.count import CountConfig, count_packed_taxids
    from unikmer_tpu.ops.device_sets import union_taxids_device
    from unikmer_tpu.taxonomy.taxdump import load_taxonomy
    from tests.conftest import random_dna

    taxdb = load_taxonomy(
        os.path.join(os.path.dirname(__file__), "data", "taxdump")
    )
    shared = random_dna(rng, 400).decode()
    recs = []
    for i, t in enumerate((511145, 585057, 349741, 562)):
        seq = shared + random_dna(rng, 250 + 31 * i).decode()
        recs.append(Record(b"r%d taxid|%d" % (i, t), b"", seq.encode()))
    re_taxid = re.compile(rb"taxid\|(\d+)")
    monkeypatch.setenv("UNIKMER_TPU_DEVICE_TAXID", "auto")
    for cfg in (CountConfig(k=15, canonical=True),
                CountConfig(k=15, canonical=True, mode="repeated"),
                CountConfig(k=15, canonical=True, hashed=True)):
        monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", "0")
        want_c, want_t = count_packed_taxids(iter(recs), cfg, re_taxid, taxdb)
        monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", "1")
        got_c, got_t = count_packed_taxids(iter(recs), cfg, re_taxid, taxdb)
        np.testing.assert_array_equal(got_c, want_c, err_msg=str(cfg))
        np.testing.assert_array_equal(got_t, want_t, err_msg=str(cfg))

    # device taxid union: hashed codes overflow the u32-delta exception
    # list on tiny sets? no — exceptions cover up to 2^16 big deltas and
    # the raw re-run fallback owns the rest; compare both engines
    ca = np.unique(rng.integers(0, 1 << 30, 4000, dtype=np.uint64))
    cb = np.unique(rng.integers(0, 1 << 30, 4000, dtype=np.uint64))
    ta = np.full(len(ca), 511145, np.uint32)
    tb = np.full(len(cb), 585057, np.uint32)
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", "0")
    want = union_taxids_device([ca, cb], [ta, tb], taxdb)
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", "1")
    got = union_taxids_device([ca, cb], [ta, tb], taxdb)
    assert want is not None and got is not None
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])

    # exception-overflow fallback: sparse 63-bit codes make every delta
    # big; with _MAX_EXC patched tiny the z-path must re-run raw and
    # still match
    import unikmer_tpu.models.count as mc

    monkeypatch.setattr(mc, "_MAX_EXC", 4)
    sparse = np.unique(rng.integers(0, 1 << 62, 300, dtype=np.uint64))
    ts = np.full(len(sparse), 562, np.uint32)
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", "0")
    want = union_taxids_device([sparse], [ts], taxdb)
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", "1")
    got = union_taxids_device([sparse], [ts], taxdb)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_compressed_taxid_ingress_matches_raw(rng, monkeypatch):
    """The compressed host->device ingress (u32-delta codes + sparse
    step exceptions + u16 compact ids) must be byte-identical to the raw
    upload for the device taxid union, in both egress modes."""
    import os

    import jax.numpy as jnp

    from unikmer_tpu.ops.device_sets import (
        SENT, _decode_u64_ingress, _encode_u64_ingress, union_taxids_device,
    )
    from unikmer_tpu.taxonomy.taxdump import load_taxonomy

    # roundtrip property across delta regimes (dense sorted, sparse
    # all-exception, sentinel padding tail)
    dense = np.sort(rng.integers(0, 1 << 30, 5000, dtype=np.uint64))
    sparse = np.sort(rng.integers(0, 1 << 62, 300, dtype=np.uint64))
    padded = np.full(8192, np.uint64(SENT), np.uint64)
    padded[:5000] = dense
    for arr in (dense, sparse, padded):
        enc = _encode_u64_ingress(arr)
        assert enc is not None
        got = np.asarray(
            _decode_u64_ingress(*(jnp.asarray(x) for x in enc))
        ).astype(np.uint64)
        np.testing.assert_array_equal(got, arr)

    # decliner: unsorted wide-space data has ~every delta >= 2^32
    wild = rng.integers(0, 1 << 63, 70000, dtype=np.uint64)
    assert _encode_u64_ingress(wild) is None

    # end-to-end: forced ingress vs raw upload, both egress modes
    taxdb = load_taxonomy(
        os.path.join(os.path.dirname(__file__), "data", "taxdump")
    )
    ca = np.unique(rng.integers(0, 1 << 30, 4000, dtype=np.uint64))
    cb = np.unique(rng.integers(0, 1 << 30, 4000, dtype=np.uint64))
    ta = np.full(len(ca), 511145, np.uint32)
    tb = np.full(len(cb), 585057, np.uint32)
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_INGRESS", "0")
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", "0")
    want = union_taxids_device([ca, cb], [ta, tb], taxdb)
    assert want is not None
    monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_INGRESS", "1")
    for fetch in ("0", "1"):
        monkeypatch.setenv("UNIKMER_TPU_COMPRESS_TAXID_FETCH", fetch)
        got = union_taxids_device([ca, cb], [ta, tb], taxdb)
        assert got is not None
        np.testing.assert_array_equal(got[0], want[0], err_msg=fetch)
        np.testing.assert_array_equal(got[1], want[1], err_msg=fetch)
