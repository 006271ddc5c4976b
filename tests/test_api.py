"""KmerSet device-resident library API (unikmer_tpu/api.py)."""

import os

import numpy as np
import pytest

from unikmer_tpu.api import KmerSet
from unikmer_tpu.taxonomy.taxdump import load_taxonomy

TAXDUMP = os.path.join(os.path.dirname(__file__), "data", "taxdump")


@pytest.fixture(scope="module")
def taxdb():
    return load_taxonomy(TAXDUMP)


def _mk(codes, **kw):
    return KmerSet.from_codes(np.asarray(codes, np.uint64), k=23,
                              canonical=True, **kw)


def test_from_codes_sorts_and_dedups():
    s = _mk([7, 3, 3, 99, 7, 1])
    assert len(s) == 4
    np.testing.assert_array_equal(s.to_numpy(), [1, 3, 7, 99])


def test_set_algebra_matches_python_sets(rng):
    a_np = rng.integers(0, 5000, 3000, dtype=np.uint64)
    b_np = rng.integers(0, 5000, 3000, dtype=np.uint64)
    a, b = _mk(a_np), _mk(b_np)
    sa, sb = set(a_np.tolist()), set(b_np.tolist())
    np.testing.assert_array_equal((a | b).to_numpy(), sorted(sa | sb))
    np.testing.assert_array_equal((a & b).to_numpy(), sorted(sa & sb))
    np.testing.assert_array_equal((a - b).to_numpy(), sorted(sa - sb))


def test_chaining_stays_on_device(rng):
    xs = [_mk(rng.integers(0, 999, 500, dtype=np.uint64)) for _ in range(4)]
    acc = xs[0]
    want = set(xs[0].to_numpy().tolist())
    for x in xs[1:]:
        acc = (acc | x) - _mk([5, 6])
        want = (want | set(x.to_numpy().tolist())) - {5, 6}
    np.testing.assert_array_equal(acc.to_numpy(), sorted(want))
    # intermediate results are device arrays, not numpy
    import jax

    assert isinstance(acc._codes, jax.Array)


def test_compat_check():
    a = KmerSet.from_codes(np.arange(4, dtype=np.uint64), k=23)
    b = KmerSet.from_codes(np.arange(4, dtype=np.uint64), k=25)
    with pytest.raises(ValueError, match="k differs"):
        _ = a | b
    c = KmerSet.from_codes(np.arange(4, dtype=np.uint64), k=23, hashed=True)
    with pytest.raises(ValueError, match="hashed differs"):
        _ = a & c


def test_contains(rng):
    members = rng.choice(10_000, 500, replace=False).astype(np.uint64)
    s = _mk(members)
    queries = np.arange(10_000, dtype=np.uint64)
    got = s.contains(queries)
    want = np.isin(queries, members)
    np.testing.assert_array_equal(got, want)


def test_common_threshold(rng):
    sets_np = [rng.integers(0, 300, 200, dtype=np.uint64) for _ in range(5)]
    sets = [_mk(x) for x in sets_np]
    got = KmerSet.common(sets, 3).to_numpy()
    from collections import Counter

    cnt = Counter()
    for x in sets_np:
        cnt.update(set(x.tolist()))
    want = sorted(c for c, n in cnt.items() if n >= 3)
    np.testing.assert_array_equal(got, want)


def test_save_load_roundtrip(tmp_path, rng):
    codes = np.unique(rng.integers(0, 2**46, 2000, dtype=np.uint64))
    s = KmerSet.from_codes(codes, k=23, canonical=True)
    path = str(tmp_path / "x.unik")
    s.save(path)
    r = KmerSet.from_unik(path)
    assert r.k == 23 and r.canonical and not r.hashed
    np.testing.assert_array_equal(r.to_numpy(), codes)


def test_taxid_union_lca(taxdb, tmp_path):
    # two E. coli strains LCA to species 562 on shared codes
    a = KmerSet.from_codes([10, 20, 30], k=23, canonical=True,
                           taxids=[511145, 511145, 511145], taxdb=taxdb)
    b = KmerSet.from_codes([20, 30, 40], k=23, canonical=True,
                           taxids=[585057, 585057, 585057], taxdb=taxdb)
    u = a | b
    np.testing.assert_array_equal(u.to_numpy(), [10, 20, 30, 40])
    np.testing.assert_array_equal(
        u.taxids_to_numpy(), [511145, 562, 562, 585057]
    )
    # round-trips through .unik with the taxid column
    path = str(tmp_path / "t.unik")
    u.save(path)
    r = KmerSet.from_unik(path, taxdb=taxdb)
    np.testing.assert_array_equal(r.taxids_to_numpy(), [511145, 562, 562, 585057])


def test_from_fasta_matches_cli_fixture():
    # A. muciniphila k=23 canonical distinct = 2,630,905 (README fixture);
    # the smallest genome keeps CPU-test runtime reasonable
    path = "/root/reference/testdata/old/A.muciniphila-ATCC_BAA-835.fasta.gz"
    s = KmerSet.from_fasta(path, k=23, canonical=True)
    assert len(s) == 2_630_905
    # spot membership: first k-mer of the genome
    from unikmer_tpu.io.fastx import pack_files
    from unikmer_tpu.ops import codec

    packed = pack_files([path], 23, False)
    first = packed.bases[:23]
    code = 0
    for b in first:
        code = (code << 2) | int(b)
    canon = codec.canonical_np(np.array([code], np.uint64), 23)
    assert s.contains(canon)[0]


def test_empty_set_ops():
    e = KmerSet.from_codes(np.zeros(0, np.uint64), k=23)
    a = _mk([1, 2, 3])
    e2 = KmerSet.from_codes(np.zeros(0, np.uint64), k=23, canonical=True)
    assert len(e) == 0
    np.testing.assert_array_equal((a | e2).to_numpy(), [1, 2, 3])
    np.testing.assert_array_equal((e2 & a).to_numpy(), [])
    np.testing.assert_array_equal((a - e2).to_numpy(), [1, 2, 3])


def test_head_sample_filter(rng):
    codes = np.unique(rng.integers(0, 1 << 46, 500, dtype=np.uint64))
    s = KmerSet.from_codes(codes, k=23, canonical=True)
    np.testing.assert_array_equal(s.head(10).to_numpy(), codes[:10])
    samp = s.sample(3, 7)
    np.testing.assert_array_equal(samp.to_numpy(), codes[3::7])
    # poly-A k-mer is low complexity; a random one is (usually) not
    from unikmer_tpu.ops.filter import low_complexity_mask

    f = s.filter_low_complexity()
    want = codes[~low_complexity_mask(codes, 23)]
    np.testing.assert_array_equal(f.to_numpy(), want)
    inv = s.filter_low_complexity(invert=True)
    assert len(f) + len(inv) == len(s)
    polyA = KmerSet.from_codes(np.array([0], np.uint64), k=23)
    assert len(polyA.filter_low_complexity()) == 0


def test_sentinel_code_rejected():
    with pytest.raises(ValueError, match="all-ones"):
        KmerSet.from_codes(np.array([(1 << 64) - 1], np.uint64), k=32,
                           hashed=True)


def test_intersect_subtract_keep_taxids(taxdb):
    a = KmerSet.from_codes([10, 20, 30], k=23, canonical=True,
                           taxids=[511145, 511145, 511145], taxdb=taxdb)
    b = KmerSet.from_codes([20, 30, 40], k=23, canonical=True,
                           taxids=[585057, 585057, 585057], taxdb=taxdb)
    i = a & b
    np.testing.assert_array_equal(i.to_numpy(), [20, 30])
    np.testing.assert_array_equal(i.taxids_to_numpy(), [562, 562])  # LCA
    d = a - b
    np.testing.assert_array_equal(d.to_numpy(), [10])
    np.testing.assert_array_equal(d.taxids_to_numpy(), [511145])
    # mix: only one side carries taxids -> passes through on matches
    c = KmerSet.from_codes([20, 30, 40], k=23, canonical=True)
    m = a & c
    np.testing.assert_array_equal(m.taxids_to_numpy(), [511145, 511145])
    m2 = c & a
    np.testing.assert_array_equal(m2.taxids_to_numpy(), [511145, 511145])


def test_union_all(rng, taxdb):
    xs_np = [rng.integers(0, 4000, 800, dtype=np.uint64) for _ in range(5)]
    xs = [_mk(x) for x in xs_np]
    got = KmerSet.union_all(xs).to_numpy()
    want = sorted(set().union(*[set(x.tolist()) for x in xs_np]))
    np.testing.assert_array_equal(got, want)
    # taxid path chains pairwise LCA unions
    a = KmerSet.from_codes([1, 2], k=23, canonical=True,
                           taxids=[511145, 511145], taxdb=taxdb)
    b = KmerSet.from_codes([2, 3], k=23, canonical=True,
                           taxids=[585057, 585057], taxdb=taxdb)
    c = KmerSet.from_codes([3, 4], k=23, canonical=True,
                           taxids=[562, 562], taxdb=taxdb)
    u = KmerSet.union_all([a, b, c])
    np.testing.assert_array_equal(u.to_numpy(), [1, 2, 3, 4])
    np.testing.assert_array_equal(u.taxids_to_numpy(), [511145, 562, 562, 562])


def test_from_fasta_mesh_matches_single(tmp_path, rng):
    from tests.conftest import random_dna
    from unikmer_tpu.api import KmerSet

    p = tmp_path / "g.fa"
    p.write_text(f">s\n{random_dna(rng, 4000).decode()}\n")
    a = KmerSet.from_fasta(str(p), 17, canonical=True)
    b = KmerSet.from_fasta(str(p), 17, canonical=True, mesh=4)
    np.testing.assert_array_equal(a.to_numpy(), b.to_numpy())


def test_from_fasta_chunked_matches_single_shot(tmp_path, rng, monkeypatch):
    """Oversized FASTA builds are chunked into bounded device programs;
    the merged set is identical to the one-shot build for every mode."""
    import unikmer_tpu.api as api

    seq = "".join("ACGT"[j] for j in rng.integers(0, 4, 30_000))
    # a duplicated block so unique/repeated modes have real collisions
    seq = seq + seq[:5_000]
    p = tmp_path / "g.fa"
    p.write_bytes(f">g\n{seq}\n".encode())
    for mode in ("distinct", "unique", "repeated"):
        want = KmerSet.from_fasta(str(p), 15, canonical=True,
                                  mode=mode).to_numpy()
        monkeypatch.setattr(api, "_stream_chunk_bases", lambda: 4096)
        got = KmerSet.from_fasta(str(p), 15, canonical=True,
                                 mode=mode).to_numpy()
        monkeypatch.undo()
        np.testing.assert_array_equal(got, want)
    # when even the union concat exceeds the program-size cap, pieces
    # are merged exactly on host and re-uploaded
    want = KmerSet.from_fasta(str(p), 15, canonical=True).to_numpy()
    monkeypatch.setattr(api, "_stream_chunk_bases", lambda: 4096)
    monkeypatch.setattr(api, "_max_device_elems", lambda: 4096)
    got = KmerSet.from_fasta(str(p), 15, canonical=True)
    monkeypatch.undo()
    np.testing.assert_array_equal(got.to_numpy(), want)
    assert len(got) == len(want)


def test_host_fallback_algebra_matches_device(rng, taxdb, monkeypatch):
    """Past the program-size cap, algebra transparently runs on the host
    engine with identical results (incl. taxid LCA / mix semantics)."""
    import unikmer_tpu.api as api

    a_np = rng.integers(0, 6000, 2500, dtype=np.uint64)
    b_np = rng.integers(0, 6000, 2500, dtype=np.uint64)
    a, b = _mk(a_np), _mk(b_np)
    at = _mk(np.unique(a_np), taxids=[511145] * len(np.unique(a_np)),
             taxdb=taxdb)
    bt = _mk(np.unique(b_np), taxids=[585057] * len(np.unique(b_np)),
             taxdb=taxdb)
    dev = {
        "u": (a | b).to_numpy(), "i": (a & b).to_numpy(),
        "d": (a - b).to_numpy(),
        "ut": (at | bt).to_numpy(), "utt": (at | bt).taxids_to_numpy(),
        "it": (at & bt).to_numpy(), "itt": (at & bt).taxids_to_numpy(),
        "mix": (at & b).taxids_to_numpy(), "mix2": (b & at).taxids_to_numpy(),
        "dt": (at - b).taxids_to_numpy(),
        "ua": KmerSet.union_all([a, b, a]).to_numpy(),
        "c2": KmerSet.common([a, b], 2).to_numpy(),
    }
    monkeypatch.setattr(api, "_max_device_elems", lambda: 1)
    np.testing.assert_array_equal((a | b).to_numpy(), dev["u"])
    np.testing.assert_array_equal((a & b).to_numpy(), dev["i"])
    np.testing.assert_array_equal((a - b).to_numpy(), dev["d"])
    np.testing.assert_array_equal((at | bt).to_numpy(), dev["ut"])
    np.testing.assert_array_equal((at | bt).taxids_to_numpy(), dev["utt"])
    np.testing.assert_array_equal((at & bt).to_numpy(), dev["it"])
    np.testing.assert_array_equal((at & bt).taxids_to_numpy(), dev["itt"])
    np.testing.assert_array_equal((at & b).taxids_to_numpy(), dev["mix"])
    np.testing.assert_array_equal((b & at).taxids_to_numpy(), dev["mix2"])
    np.testing.assert_array_equal((at - b).taxids_to_numpy(), dev["dt"])
    np.testing.assert_array_equal(
        KmerSet.union_all([a, b, a]).to_numpy(), dev["ua"])
    np.testing.assert_array_equal(
        KmerSet.common([a, b], 2).to_numpy(), dev["c2"])


def test_oversized_sets_stay_host_resident(rng, tmp_path, monkeypatch):
    """A result past the device program-size cap must never be uploaded
    as an over-cap device buffer (contains/save would then dispatch the
    exact program size documented to hang the backend)."""
    import unikmer_tpu.api as api

    monkeypatch.setattr(api, "_max_device_elems", lambda: 4096)
    codes = np.unique(rng.integers(0, 1 << 40, 9000, dtype=np.uint64))
    s = _mk(codes, assume_sorted_unique=True)
    assert isinstance(s._codes, np.ndarray)
    assert s.capacity == len(codes)  # unpadded, and compact() no-ops
    assert s.compact() is s
    np.testing.assert_array_equal(s.to_numpy(), codes)
    # membership via numpy searchsorted
    q = np.concatenate([codes[:5], np.array([1, 2, 3], np.uint64)])
    want = np.isin(q, codes)
    np.testing.assert_array_equal(s.contains(q), want)
    # unsorted ingress dedups on host
    s2 = _mk(np.concatenate([codes, codes[:100]]))
    assert isinstance(s2._codes, np.ndarray)
    np.testing.assert_array_equal(s2.to_numpy(), codes)
    # algebra with a device-resident set routes through the host engine
    d = _mk(codes[:10], assume_sorted_unique=True)
    np.testing.assert_array_equal((s & d).to_numpy(), codes[:10])
    np.testing.assert_array_equal((s - d).to_numpy(), codes[10:])
    # save round-trips
    p = tmp_path / "big.unik"
    s.save(str(p))
    np.testing.assert_array_equal(
        KmerSet.from_unik(str(p)).to_numpy(), codes)


def test_common_threshold_zero_means_all_files(rng, monkeypatch):
    """threshold <= 0 means "present in ALL files" in the host engine;
    the device path must agree, not degenerate to a union."""
    import unikmer_tpu.api as api

    a_np = np.unique(rng.integers(0, 3000, 1500, dtype=np.uint64))
    b_np = np.unique(rng.integers(0, 3000, 1500, dtype=np.uint64))
    a, b = _mk(a_np), _mk(b_np)
    want = np.intersect1d(a_np, b_np)
    for th in (0, -1):
        np.testing.assert_array_equal(
            KmerSet.common([a, b], th).to_numpy(), want)
        monkeypatch.setattr(api, "_max_device_elems", lambda: 1)
        np.testing.assert_array_equal(
            KmerSet.common([a, b], th).to_numpy(), want)
        monkeypatch.undo()


def test_union_one_sided_taxids(taxdb):
    # regression: (taxid-set | plain-set) silently dropped the taxid
    # column; now one-sided union passes taxids through (missing side =
    # taxid 0 identity), mirroring intersect's one-sided semantics
    a = _mk([10, 20, 30], taxids=[511145, 562, 511145], taxdb=taxdb)
    b = _mk([20, 40])
    for u in (a | b, b | a):
        np.testing.assert_array_equal(u.to_numpy(), [10, 20, 30, 40])
        assert u.has_taxids
        np.testing.assert_array_equal(
            u.taxids_to_numpy(), [511145, 562, 511145, 0]
        )


def test_from_unik_sorted_flag_with_duplicates(tmp_path, rng, taxdb):
    # regression: SORTED .unik files may carry duplicates (sort without
    # -u, concat -s); from_unik trusted the flag and skipped dedup
    from unikmer_tpu.io.unik import CANONICAL, SORTED, UnikWriter

    codes = np.unique(rng.integers(0, 1 << 40, size=300, dtype=np.uint64))
    dup = np.sort(np.concatenate([codes, codes[:50]]))
    p = str(tmp_path / "d.unik")
    with UnikWriter(p, k=23, flag=CANONICAL | SORTED) as w:
        w.write_codes(dup)
    s = KmerSet.from_unik(p)
    assert len(s) == len(codes)
    np.testing.assert_array_equal(s.to_numpy(), codes)
    # taxid-carrying duplicates LCA-merge (needs taxdb)
    pt = str(tmp_path / "dt.unik")
    from unikmer_tpu.io.unik import INCLUDE_TAXID

    with UnikWriter(pt, k=23, flag=CANONICAL | SORTED | INCLUDE_TAXID,
                    max_taxid=600000) as w:
        w.write_codes(np.array([5, 5, 9], np.uint64),
                      np.array([511145, 585057, 562], np.uint32))
    st = KmerSet.from_unik(pt, taxdb=taxdb)
    np.testing.assert_array_equal(st.to_numpy(), [5, 9])
    np.testing.assert_array_equal(st.taxids_to_numpy(), [562, 562])


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_kmerset_chains(rng, taxdb, trial):
    """Randomized KmerSet algebra chains with mixed taxid presence vs a
    python-dict oracle (LCA of two E. coli strains = 562; the 0 taxid
    is the no-taxid identity)."""
    LCA = {}
    strains = [511145, 585057]
    for a in strains + [562, 0]:
        for b in strains + [562, 0]:
            if a == 0:
                LCA[(a, b)] = b
            elif b == 0 or a == b:
                LCA[(a, b)] = a
            else:
                LCA[(a, b)] = 562

    def mk():
        codes = np.unique(rng.integers(0, 200, size=rng.integers(1, 60),
                                       dtype=np.uint64))
        with_t = rng.random() < 0.6
        t = int(rng.choice(strains)) if with_t else 0
        s = KmerSet.from_codes(
            codes, k=23, canonical=True,
            taxids=np.full(len(codes), t, np.uint32) if with_t else None,
            taxdb=taxdb)
        return s, {int(c): t for c in codes}

    s1, o1 = mk()
    for _ in range(4):
        s2, o2 = mk()
        op = rng.choice(["|", "&", "-"])
        if op == "|":
            s1 = s1 | s2
            o1 = {c: LCA[(o1.get(c, 0), o2.get(c, 0))]
                  for c in set(o1) | set(o2)}
        elif op == "&":
            s1 = s1 & s2
            o1 = {c: LCA[(o1[c], o2[c])] for c in set(o1) & set(o2)}
        else:
            s1 = s1 - s2
            o1 = {c: o1[c] for c in set(o1) - set(o2)}
        assert s1.to_numpy().tolist() == sorted(o1), op
        got_t = s1.taxids_to_numpy()
        want_t = [o1[c] for c in sorted(o1)]
        if got_t is None:
            assert not any(want_t), op
        else:
            assert got_t.tolist() == want_t, op
