"""Device-side (jnp) LCA: taxonomy tables in HBM, vectorized lifting.

The host Taxonomy (taxdump.py) flattens NCBI nodes.dmp into dense
parent/depth arrays; uploaded once, LCA of whole taxid arrays becomes
pure gather math inside jitted programs (SURVEY.md §7.1), replacing the
reference's per-pair map lookups (`taxondb.LCA(a,b)`).

All loops are static-bounded by the tree depth (NCBI ~<=42), expressed
as masked fori_loops — no data-dependent control flow.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def device_tables(taxdb):
    """(parent int32, depth int32, max_depth) device-ready tables."""
    parent = jnp.asarray(taxdb.parent.astype(np.int32))
    depth = jnp.asarray(taxdb.depth.astype(np.int32))
    max_depth = int(taxdb.depth.max())
    return parent, depth, max_depth


@partial(jax.jit, static_argnames=("max_depth",))
def lca_pairs_device(a, b, parent, depth, max_depth: int):
    """Elementwise LCA with 0 as identity; unknown taxids -> 0.

    ``a``/``b`` uint32 arrays; parent/depth from device_tables.
    """
    n_tax = parent.shape[0]
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    in_range_a = (a > 0) & (a < n_tax)
    in_range_b = (b > 0) & (b < n_tax)
    da = jnp.where(in_range_a, depth[jnp.clip(a, 0, n_tax - 1)], -1)
    db = jnp.where(in_range_b, depth[jnp.clip(b, 0, n_tax - 1)], -1)
    known_a = da >= 0
    known_b = db >= 0

    x = jnp.where(known_a, a, 0)
    y = jnp.where(known_b, b, 0)

    def lift_deeper(_, carry):
        x, y, dx, dy = carry
        mx = dx > dy
        my = dy > dx
        x = jnp.where(mx, parent[x], x)
        dx = jnp.where(mx, dx - 1, dx)
        y = jnp.where(my, parent[y], y)
        dy = jnp.where(my, dy - 1, dy)
        return x, y, dx, dy

    x, y, _, _ = jax.lax.fori_loop(
        0, max_depth, lift_deeper, (x, y, jnp.maximum(da, 0), jnp.maximum(db, 0))
    )

    def walk_up(_, carry):
        x, y = carry
        m = x != y
        return jnp.where(m, parent[x], x), jnp.where(m, parent[y], y)

    x, y = jax.lax.fori_loop(0, max_depth, walk_up, (x, y))

    both = known_a & known_b
    res = jnp.where(both, x, 0)
    res = jnp.where(known_a & (b == 0), a, res)
    res = jnp.where(known_b & (a == 0), b, res)
    return res.astype(jnp.uint32)


@partial(jax.jit, static_argnames=("max_depth", "rounds"))
def lca_collapse_device(codes, taxids, valid, parent, depth,
                        max_depth: int, rounds: int):
    """Sorted distinct collapse with LCA-merged taxid column, on device.

    ``rounds`` bounds the segmented reduction: ceil(log2(max number of
    entries sharing one code)) — e.g. number of input files for a union.
    Returns (codes, taxids, keep_mask) aligned to the sorted order.
    """
    invalid = (~valid).astype(jnp.uint8)
    from ..ops.sort import _sort_stable

    s_codes, s_inv, s_tax = jax.lax.sort(
        (codes, invalid, taxids.astype(jnp.uint32)), num_keys=2,
        is_stable=_sort_stable(),
    )
    s_valid = s_inv == 0
    n = codes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), s_codes[1:] != s_codes[:-1]])
    # run start per element (cummax of masked index)
    start = jax.lax.cummax(jnp.where(first, idx, 0))
    tax = jnp.where(s_valid, s_tax, 0)
    for r in range(rounds):
        d = 1 << r
        shifted = jnp.concatenate(
            [tax[d:], jnp.zeros((d,), tax.dtype)]
        )
        same_run = jnp.concatenate(
            [start[d:] == start[:-d] if d < n else jnp.zeros((0,), bool),
             jnp.zeros((min(d, n),), bool)]
        )
        merged = lca_pairs_device(tax, shifted, parent, depth, max_depth)
        tax = jnp.where(same_run, merged, tax)
    keep = first & s_valid
    return s_codes, tax, keep


# ---------------------------------------------------------------------
# Compact-vocabulary LCA: the TPU-fit representation
# ---------------------------------------------------------------------
#
# Tree-walking LCA (above) costs 2*max_depth dependent gathers per
# merge round — fine on CPU meshes, pathological on this TPU backend
# (random gather ~85M elem/s).  But a batch's taxid VOCABULARY is tiny
# (<= #records), and the meet-closure of V nodes in a tree has at most
# 2V-1 members (the LCA of any set equals the LCA of one PAIR of its
# extremal members, so the all-pairs meet set is closed under meet).
# Precompute the closure's all-pairs LCA table on host once; every
# device merge round is then ONE gather into a (C, C) table instead of
# 2*max_depth tree steps.  Reference analog: the mt[code]=LCA(...) map
# loops (count.go:405-410, union.go:195-202).


def lca_closure(taxdb, taxids):
    """(closure uint32 sorted (0 first), lca_tab int32 (C, C)) for the
    taxid vocabulary ``taxids``.  lca_tab[i, j] = compact id of
    LCA(closure[i], closure[j]) with the host identity/unknown
    semantics (0 identity; unknown -> 0)."""
    vocab = np.unique(
        np.concatenate([np.asarray(taxids, np.uint32).reshape(-1),
                        np.zeros(1, np.uint32)])
    )
    ii, jj = np.meshgrid(vocab, vocab, indexing="ij")
    pair_lca = taxdb.lca_pairs(ii.reshape(-1), jj.reshape(-1))
    closure = np.unique(np.concatenate([vocab, pair_lca]))
    ci, cj = np.meshgrid(closure, closure, indexing="ij")
    tab = taxdb.lca_pairs(ci.reshape(-1), cj.reshape(-1))
    ids = np.searchsorted(closure, tab).astype(np.int32)
    return closure, ids.reshape(len(closure), len(closure))


def compact_ids(closure: np.ndarray, taxids: np.ndarray) -> np.ndarray:
    """Map taxids (all members of the vocabulary) to compact ids."""
    return np.searchsorted(closure, np.asarray(taxids, np.uint32)).astype(
        np.int32
    )


@jax.jit
def lca_pairs_compact(ca, cb, lca_tab):
    """Elementwise LCA over COMPACT ids: one gather."""
    c = lca_tab.shape[0]
    return lca_tab.reshape(-1)[ca.astype(jnp.int32) * c + cb.astype(jnp.int32)]


_VALID_BIT = 1 << 30  # packed alongside compact ids (closure << 2^23)


def _id_bits(n_ids: int) -> int:
    return max((max(n_ids, 2) - 1).bit_length(), 1)


def collapse_sort_packable(code_bits: int, n_ids: int) -> bool:
    """Can (code, valid, compact id) pack into one u64 sort key?"""
    return 0 < code_bits and code_bits + _id_bits(n_ids) + 1 <= 63


def staged_split3_wanted() -> bool:
    """Should UNPACKABLE configs ride the staged split3 3-buffer
    programs (collapse_sort_split3 -> lca_rounds_staged_split3 ->
    egress)?  Default on wherever the staged programs are in use;
    UNIKMER_TPU_TAXID_SPLIT3_STAGED=0 restores the monolithic
    fused-collapse fallback for experiments."""
    import os

    return os.environ.get("UNIKMER_TPU_TAXID_SPLIT3_STAGED", "1") != "0"


def device_collapse_admissible(code_bits: int, n_ids: int) -> bool:
    """Is a device taxid collapse safe on this backend?  The 2-operand
    (u64, i32) fallback sort COMPILE-STARVES on the tunnel TPU backend
    at 2^24 (docs/BENCH_NOTES.md round-3) — on tpu only packed
    single-operand collapses are admissible (k <= ~23 for 2-bit codes,
    vocabulary-dependent); other backends take either path.
    UNIKMER_TPU_TAXID_2OP=1 overrides for experiments."""
    import os

    if collapse_sort_packable(code_bits, n_ids):
        return True
    if os.environ.get("UNIKMER_TPU_TAXID_2OP") == "1":
        return True
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        return True
    if not on_tpu:
        return True
    # tpu + unpackable (full hashes / k>=24 big vocab): ADMITTED when
    # the staged split3 3-buffer route will serve it — chip-proven
    # EXACT end-to-end in round 5 (session P2 2026-08-21: hashed k=31
    # `count -T` at the 2^23 AND 2^24 program shapes, md5 == the
    # jax-free host oracle; scripts/chip_round5.sh).  Without the
    # staged programs the monolithic unpackable graph compile-starves
    # this backend, so those configs still decline to the host tiers.
    from ..ops.device_sets import use_staged_taxid_programs

    if os.environ.get("UNIKMER_TPU_TAXID_SORT", "split3") == "2op":
        return False
    return use_staged_taxid_programs() and staged_split3_wanted()


def collapse_sort_key(codes, ctax, valid, ib: int, code_bits: int):
    """Packed single-operand collapse sort key: (code << (ib+1)) |
    valid bit | compact id, invalid slots all-ones (tail run).  The
    sorted key is the ONLY buffer the staged stage-1 program hands to
    stage 2 — one u64 array, no multi-operand sort anywhere."""
    from ..ops.sort import _sort_u64

    sh = jnp.uint64(ib + 1)
    key = jnp.where(
        valid,
        (codes << sh)
        | (jnp.uint64(1) << jnp.uint64(ib))
        | ctax.astype(jnp.uint64),
        jnp.uint64(0xFFFFFFFFFFFFFFFF),
    )
    return _sort_u64(key, code_bits=code_bits + ib + 1)


def unpack_collapse_key(skey, ib: int):
    """(sorted codes, compact ids, valid) from a sorted packed key."""
    sh = jnp.uint64(ib + 1)
    s_codes = skey >> sh
    s_valid = ((skey >> jnp.uint64(ib)) & jnp.uint64(1)).astype(bool) & (
        skey != jnp.uint64(0xFFFFFFFFFFFFFFFF)
    )
    tax = jnp.where(
        s_valid,
        (skey & ((jnp.uint64(1) << jnp.uint64(ib)) - 1)).astype(jnp.int32),
        0,
    )
    return s_codes, tax, s_valid


@jax.jit
def collapse_sort_split3(codes, ctax, valid):
    """Stage-1 sort for UNPACKABLE configs (full 64-bit hashes, or
    2-bit codes whose code_bits + id bits + 1 > 63): the u64-OPERAND
    sorts are what compile-starve this backend (BENCH_NOTES round-3),
    so the key is split into (u32 hi, u32 lo) with the i32 payload as
    a carried operand — num_keys=2, no u64 operand anywhere.  Chip-
    proven shape (session C 2026-08-21, exp_split3_probe at 2^23).
    Invalid slots key to all-ones so they tail-collect.  Returns the
    sorted (h, l, payload) triple — the 3-buffer staged handoff."""
    payload = jnp.where(
        valid, ctax.astype(jnp.int32) | jnp.int32(_VALID_BIT), jnp.int32(0)
    )
    hi = jnp.where(valid, (codes >> jnp.uint64(32)).astype(jnp.uint32),
                   jnp.uint32(0xFFFFFFFF))
    lo = jnp.where(valid, codes.astype(jnp.uint32),
                   jnp.uint32(0xFFFFFFFF))
    from ..ops.sort import _sort_stable

    return jax.lax.sort((hi, lo, payload), num_keys=2,
                        is_stable=_sort_stable())


def unpack_split3(h, l, s_pay):
    """(sorted codes, compact ids, valid) from a sorted split3 triple
    (inside jit; mirror of unpack_collapse_key for the packed route).
    Note all-ones CODES from invalid slots are masked by the payload's
    valid bit, so a REAL all-ones code in a valid slot survives."""
    s_valid = s_pay >= jnp.int32(_VALID_BIT)
    s_codes = (h.astype(jnp.uint64) << jnp.uint64(32)) | l.astype(jnp.uint64)
    tax = jnp.where(s_valid, s_pay & jnp.int32(_VALID_BIT - 1), 0)
    return s_codes, tax, s_valid


def _collapse_sort(codes, ctax, valid, n_ids: int, code_bits: int):
    """The collapse's sort stage: (sorted codes, compact ids, valid)
    aligned to the sorted order.

    Preferred form packs (code, valid bit, compact id) into ONE u64 key
    — a single-operand sort is the only shape this TPU backend compiles
    fast at 2^23+ (CLAUDE.md: a 2-operand u64 sort is a multi-minute
    AOT compile, 3-operand never returned), and it rides the split
    2-key optimization of ops/sort._sort_u64.  Invalid slots key to
    all-ones so they collect in one tail run (their merged taxid is the
    identity 0 and 'keep' counts run-valid members, so results are
    byte-identical to sorting them in place).  Falls back to the
    (codes, payload) two-operand sort when code_bits + id bits + 1 > 63
    (full 64-bit hashes)."""
    n = codes.shape[0]
    ib = _id_bits(n_ids)
    if 0 < code_bits and code_bits + ib + 1 <= 63:
        skey = collapse_sort_key(codes, ctax, valid, ib, code_bits)
        return unpack_collapse_key(skey, ib)
    import os

    if os.environ.get("UNIKMER_TPU_TAXID_SORT", "split3") != "2op":
        # DEFAULT u64-free fallback (round 4): the split3 sort —
        # UNIKMER_TPU_TAXID_SORT=2op restores the old (u64, i32)
        # num_keys=1 form for experiments.
        h, l, s_pay = collapse_sort_split3(codes, ctax, valid)
        return unpack_split3(h, l, s_pay)
    payload = jnp.where(
        valid, ctax.astype(jnp.int32) | jnp.int32(_VALID_BIT), jnp.int32(0)
    )
    from ..ops.sort import _sort_stable

    s_codes, s_pay = jax.lax.sort((codes, payload), num_keys=1,
                                  is_stable=_sort_stable())
    s_valid = s_pay >= jnp.int32(_VALID_BIT)
    tax = jnp.where(s_valid, s_pay & jnp.int32(_VALID_BIT - 1), 0)
    return s_codes, tax, s_valid


@partial(jax.jit, static_argnames=("rounds", "code_bits"))
def lca_collapse_compact(codes, ctax, valid, lca_tab, rounds: int,
                         code_bits: int = 64):
    """Device sorted-distinct collapse with LCA-merged COMPACT-id taxid
    column: the TPU-fit twin of lca_collapse_device (one table gather
    per doubling round; rounds = ceil(log2(n)) is always convergent).

    The sort stage is single-operand whenever the static ``code_bits``
    hint lets the compact id + valid bit pack beside the code
    (_collapse_sort); a run's first slot may be an invalid entry, so
    'keep' tests run-has-any-valid instead of first-slot validity.

    Returns (sorted codes, merged compact ids, keep mask, valid mask)
    aligned to the sorted order.
    """
    s_codes, tax, s_valid = _collapse_sort(
        codes, ctax, valid, lca_tab.shape[0], code_bits
    )
    tax, first, run_valid = _collapse_from_sorted(
        s_codes, tax, s_valid, lca_tab, rounds, "table"
    )
    keep = first & (run_valid > 0)
    return s_codes, tax, keep, s_valid


def _sorted_run_starts(s_codes):
    """(idx, first mask, run-start scan) for a sorted code array."""
    n = s_codes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones((1,), bool), s_codes[1:] != s_codes[:-1]])
    # cummax, NOT associative_scan: see ops/sort._run_bounds comment
    start = jax.lax.cummax(jnp.where(first, idx, 0))
    return idx, first, start


def _run_valid_counts(s_codes, s_valid, idx, first, start):
    """Valid-members-per-run via cumsum over run bounds."""
    n = s_codes.shape[0]
    v = s_valid.astype(jnp.int32)
    csum = jnp.cumsum(v)
    last = jnp.concatenate([s_codes[1:] != s_codes[:-1], jnp.ones((1,), bool)])
    end = jax.lax.cummin(jnp.where(last, idx + 1, n), reverse=True)
    return csum[end - 1] - csum[start] + v[start]


def _collapse_from_sorted(s_codes, tax, s_valid, tab, rounds: int,
                          kind: str):
    """Merge rounds + run accounting over an ALREADY-SORTED collapse:
    the shared back half of lca_collapse_compact / lca_collapse_paths
    and the body of the staged stage-2 program (lca_rounds_staged).
    Returns (merged ids, first mask, valid-members-per-run)."""
    idx, first, start = _sorted_run_starts(s_codes)
    out = _merge_rounds(s_codes, tax, idx, start, tab, rounds, kind)
    run_valid = _run_valid_counts(s_codes, s_valid, idx, first, start)
    return out, first, run_valid


def _merge_rounds(s_codes, tax, idx, start, tab, rounds: int, kind: str):
    """The doubling LCA merge rounds alone (no run accounting)."""
    n = s_codes.shape[0]
    eff_rounds = min(rounds, max(n.bit_length() - 1, 1))

    # fori_loop with a TRACED doubling distance, not a Python-unrolled
    # loop: 20+ unrolled gather/scan rounds blow the remote compile
    # helper's memory (SIGKILLed at 2^23/2^24, BENCH_NOTES round-3);
    # one loop body compiles like any other small graph.  i32 loop
    # carry only (Mosaic i64 guard, CLAUDE.md).  The shift-by-d reads
    # (tax[i+d], start[i+d]) are CONTIGUOUS dynamic_slices of padded
    # buffers, not gathers with traced index vectors — big-array
    # gathers inside a While body are a prime compile-starvation
    # suspect on this backend's AOT pipeline.
    start2 = jnp.concatenate([start, jnp.full((n,), jnp.int32(-1))])

    def shifted_start(d):
        # start[i+d], -1 past the end (never equal to a real start)
        return jax.lax.dynamic_slice(start2, (d,), (n,))

    if kind == "table":
        c = tab.shape[0]
        flat = tab.reshape(-1)

        def round_body(r, tax):
            d = jnp.int32(1) << r
            padded = jnp.concatenate([tax, jnp.zeros((n,), tax.dtype)])
            shifted = jax.lax.dynamic_slice(padded, (d,), (n,))
            same_run = shifted_start(d) == start
            merged = flat[tax * c + shifted]
            return jnp.where(same_run, merged, tax)

        out = jax.lax.fori_loop(jnp.int32(0), jnp.int32(eff_rounds),
                                round_body, tax)
    else:
        P = tab[tax]  # (n, Dp) — the only table gather

        def round_body(r, P):
            d = jnp.int32(1) << r
            padded = jnp.concatenate(
                [P, jnp.full((n, P.shape[1]), jnp.int32(-1))])
            Pq = jax.lax.dynamic_slice(padded, (d, jnp.int32(0)),
                                       (n, P.shape[1]))
            same_run = shifted_start(d) == start
            # meet = common prefix; empty path (taxid 0) is the identity
            diverged = jnp.cumsum((P != Pq).astype(jnp.int32), axis=1) > 0
            merged = jnp.where(diverged, jnp.int32(-1), P)
            merged = jnp.where(P[:, :1] < 0, Pq, merged)
            merged = jnp.where(Pq[:, :1] < 0, P, merged)
            return jnp.where(same_run[:, None], merged, P)

        P = jax.lax.fori_loop(jnp.int32(0), jnp.int32(eff_rounds),
                              round_body, P)
        depth_cnt = jnp.sum((P >= 0).astype(jnp.int32), axis=1)
        out = jnp.where(
            depth_cnt > 0,
            P[idx, jnp.maximum(depth_cnt - 1, 0)],
            jnp.int32(0),
        )
    return out


@partial(jax.jit, static_argnames=("rounds", "ib", "kind"))
def lca_merge_rounds_only(skey, tab, rounds: int, ib: int, kind: str):
    """Stage 2a of the 4-program taxid collapse
    (UNIKMER_TPU_TAXID_STAGE2_SPLIT): ONLY the doubling merge rounds.
    Exists to bisect a stage-2 compile starvation on the chip — if the
    fused rounds+accounting program starves, running 2a and 2b as
    separate programs names the half the AOT helper chokes on."""
    s_codes, tax, _ = unpack_collapse_key(skey, ib)
    idx, _, start = _sorted_run_starts(s_codes)
    return _merge_rounds(s_codes, tax, idx, start, tab, rounds, kind)


@partial(jax.jit, static_argnames=("ib", "mode", "threshold"))
def lca_keep_mask_only(skey, ib: int, mode: str = "all",
                       threshold: int = 1):
    """Stage 2b of the 4-program taxid collapse: run accounting +
    multiplicity/threshold predicates (no table, no fori_loop)."""
    s_codes, _, s_valid = unpack_collapse_key(skey, ib)
    idx, first, start = _sorted_run_starts(s_codes)
    run_valid = _run_valid_counts(s_codes, s_valid, idx, first, start)
    keep = first & (run_valid > 0)
    if mode == "unique":
        keep = keep & (run_valid == 1)
    elif mode == "repeated":
        keep = keep & (run_valid > 1)
    if threshold > 1:
        keep = keep & (run_valid >= threshold)
    return s_codes, keep


@partial(jax.jit, static_argnames=("rounds", "ib", "kind", "mode",
                                   "threshold"))
def lca_rounds_staged(skey, tab, rounds: int, ib: int, kind: str,
                      mode: str = "all", threshold: int = 1):
    """Stage 2/3 of the STAGED taxid collapse: sorted packed key ->
    (sorted codes, merged ids, keep).

    The monolithic collapse programs (sort + rounds + egress in one
    graph) starve the remote AOT compile helper at 2^23+ even after the
    fori_loop shrink (BENCH_NOTES round-3); splitting at the sorted-key
    boundary gives three programs the size of count_step, each a
    proven-compilable shape, with device-resident handoff.  ``mode``
    folds the multiplicity predicates of count -T ("unique"/"repeated",
    count.go:377-410) and ``threshold`` the set-op one
    (common.go:262-267) into this stage so stage 3 is a bare
    compact+egress."""
    s_codes, tax, s_valid = unpack_collapse_key(skey, ib)
    return _staged_rounds_tail(s_codes, tax, s_valid, tab, rounds, kind,
                               mode, threshold)


def _staged_rounds_tail(s_codes, tax, s_valid, tab, rounds: int,
                        kind: str, mode: str, threshold: int):
    """Shared stage-2 body (inside jit): merge rounds + keep
    predicates over already-sorted-and-unpacked buffers."""
    out, first, run_valid = _collapse_from_sorted(
        s_codes, tax, s_valid, tab, rounds, kind
    )
    keep = first & (run_valid > 0)
    if mode == "unique":
        keep = keep & (run_valid == 1)
    elif mode == "repeated":
        keep = keep & (run_valid > 1)
    # threshold composes with (not replaces) the multiplicity mode: a
    # caller passing mode='unique' AND threshold>1 gets both predicates
    if threshold > 1:
        keep = keep & (run_valid >= threshold)
    return s_codes, out, keep


@partial(jax.jit, static_argnames=("rounds", "kind", "mode", "threshold"))
def lca_rounds_staged_split3(h, l, pay, tab, rounds: int, kind: str,
                             mode: str = "all", threshold: int = 1):
    """Stage 2/3 of the staged collapse over the UNPACKABLE 3-buffer
    handoff (sorted split3 triple from collapse_sort_split3): same
    rounds+keep body as lca_rounds_staged, reached without any u64
    sort operand.  Opens the staged device route to full hashes and
    k>=24 big-vocabulary -T configs (VERDICT round-4 next #2;
    reference: count.go:377-410 — ntHash -T is the metagenomics
    norm)."""
    s_codes, tax, s_valid = unpack_split3(h, l, pay)
    return _staged_rounds_tail(s_codes, tax, s_valid, tab, rounds, kind,
                               mode, threshold)


def closure_for_vocab(taxdb, taxids):
    """(closure, lca_tab) for a taxid vocabulary, or None when the
    compact representation cannot own the semantics: unknown NONZERO
    taxids (the host engine's unknown-merge rule is order-dependent,
    taxdump.lca_pairs), or a vocabulary/meet-closure beyond
    UNIKMER_TPU_TAXID_VOCAB_MAX (default 4096 / 2x for the closure).
    The small-vocabulary tier of :func:`device_lca_plan`."""
    import os

    vocab = np.unique(np.asarray(taxids, np.uint32).reshape(-1))
    if not np.all(taxdb.has(vocab) | (vocab == 0)):
        return None
    cap = int(os.environ.get("UNIKMER_TPU_TAXID_VOCAB_MAX", "4096"))
    if len(vocab) > cap:
        return None
    closure, lca_tab = lca_closure(taxdb, vocab)
    if len(closure) > 2 * cap:
        return None
    return closure, lca_tab


# ---------------------------------------------------------------------
# Path-matrix LCA: the LARGE-vocabulary tier
# ---------------------------------------------------------------------
#
# The (C, C) closure table is O(C^2) memory AND O(V^2) host pair-LCAs to
# build, so it caps out around 4k taxids — real metagenomic -T workloads
# carry 10^4..10^6 (the reference loads the full NCBI dump,
# unikmer/cmd/util.go:119-171).  This tier scales: each meet-closure
# member gets its root-down path of CLOSURE ancestors, depth-aligned by
# closure-depth; LCA of two nodes = deepest common entry of their paths
# — a pure elementwise compare + prefix-AND over a (n, D) block, no
# gathers inside the merge rounds at all (ONE row-gather total to fetch
# each element's path).  Host prep is O(V * tree_depth) via the sorted-
# path adjacency closure (the meet-closure of a vocabulary = vocabulary
# plus the LCAs of lexicographically ADJACENT root-paths), never O(V^2).


def _root_paths(taxdb, vocab):
    """(V, Dfull) int64 matrix of root-down ancestor taxids (-1 pad)
    for KNOWN nonzero ``vocab`` entries (depths are contiguous in
    taxdump: depth(parent) = depth(node) - 1)."""
    v = np.asarray(vocab, np.int64)
    if len(v) == 0:
        return np.full((0, 1), -1, np.int64)
    depth = taxdb.depth.astype(np.int64)
    parent = taxdb.parent.astype(np.int64)
    D = int(depth[v].max()) + 1
    paths = np.full((len(v), D), -1, np.int64)
    rows = np.arange(len(v))
    cur = v.copy()
    for _ in range(D):
        d = depth[cur]
        ok = (cur > 0) & (d >= 0)
        paths[rows[ok], d[ok]] = cur[ok]
        nxt = parent[cur]
        cur = np.where(ok & (nxt != cur), nxt, 0)
    return paths


def path_tables(taxdb, taxids):
    """(anc uint32 sorted (0 first), path_tab (C, Dp) int32) for an
    arbitrarily large KNOWN taxid vocabulary.

    ``anc`` is the vocabulary's meet-closure (every possible LCA of any
    subset of the vocabulary, plus 0); ``path_tab[i]`` is closure member
    i's closure-ancestors root-down as indices into ``anc`` (including
    itself last; -1 pad; row 0 = taxid 0 = all -1).  LCA(anc[i], anc[j])
    = anc[deepest common entry of path_tab[i], path_tab[j]].
    """
    vocab = np.unique(
        np.concatenate([np.asarray(taxids, np.uint32).reshape(-1),
                        np.zeros(1, np.uint32)])
    )
    vz = vocab[vocab != 0]
    if len(vz) == 0:
        return vocab, np.full((1, 1), -1, np.int32)
    fp = _root_paths(taxdb, vz)
    # sorted-path adjacency closure: DFS (lexicographic root-path) order
    # makes every pairwise LCA the LCA of some ADJACENT pair, and that
    # is just the common-prefix tail of adjacent path rows
    order = np.lexsort(fp.T[::-1])
    sfp = fp[order]
    if len(sfp) > 1:
        eq = sfp[1:] == sfp[:-1]
        cpd = np.cumprod(eq, axis=1).sum(axis=1)  # common-prefix depth
        good = cpd > 0  # 0 only for forest inputs; root meet then
        adj = sfp[np.flatnonzero(good), cpd[good] - 1]
    else:
        adj = np.zeros(0, np.int64)
    closure = np.unique(np.concatenate([vz.astype(np.int64), adj]))
    anc = np.concatenate([np.zeros(1, np.int64), closure]).astype(np.uint64)
    anc = np.unique(anc).astype(np.uint32)  # 0 first (sorted)
    # prune each closure member's full path to closure-only entries,
    # left-packed: entry j = its closure-ancestor of closure-depth j
    afp = _root_paths(taxdb, closure)
    member = np.isin(afp, closure)
    Dp = max(int(member.sum(axis=1).max()), 1)
    tab = np.full((len(anc), Dp), -1, np.int32)
    rws, cls = np.nonzero(member)
    pos = (np.cumsum(member, axis=1) - 1)[rws, cls]
    ids = np.searchsorted(anc, afp[rws, cls]).astype(np.int32)
    # closure row r is anc row r+1 (anc[0] is taxid 0)
    tab[rws + 1, pos] = ids
    return anc, tab


@partial(jax.jit, static_argnames=("rounds", "code_bits"))
def lca_collapse_paths(codes, cids, valid, path_tab, rounds: int,
                       code_bits: int = 64):
    """Sorted-distinct collapse with LCA-merged taxids for LARGE
    vocabularies: the path-matrix twin of lca_collapse_compact.

    ``cids`` are indices into the ``anc`` array of path_tables (0 =
    taxid 0); the returned taxid column is likewise anc indices.  Merge
    rounds run on the (n, Dp) path block with pure elementwise
    compare/prefix ops (VPU-shaped; zero gathers after the single
    initial row gather).  Same single-operand sort discipline as the
    compact collapse (_collapse_sort).
    """
    s_codes, ids, s_valid = _collapse_sort(
        codes, cids, valid, path_tab.shape[0], code_bits
    )
    out, first, run_valid = _collapse_from_sorted(
        s_codes, ids, s_valid, path_tab, rounds, "paths"
    )
    keep = first & (run_valid > 0)
    return s_codes, out, keep, s_valid


def device_lca_plan(taxdb, taxids):
    """Tiered admission for the device taxid routes: ('table',
    closure, lca_tab) for small vocabularies (one (C, C)-table gather
    per merge round — cheapest), ('paths', anc, path_tab) for large
    ones (O(V*depth) host prep, gather-free merge rounds), or None when
    the device cannot own the semantics (unknown NONZERO taxids: their
    merge rule is order-dependent, owned by the host engine) or the
    path block would not fit (UNIKMER_TPU_TAXID_PATH_DEPTH_MAX).
    """
    import os

    vocab = np.unique(np.asarray(taxids, np.uint32).reshape(-1))
    if not np.all(taxdb.has(vocab) | (vocab == 0)):
        return None
    cap = int(os.environ.get("UNIKMER_TPU_TAXID_VOCAB_MAX", "4096"))
    if len(vocab) <= cap:
        closure, lca_tab = lca_closure(taxdb, vocab)
        if len(closure) <= 2 * cap:
            return ("table", closure, lca_tab)
    anc, path_tab = path_tables(taxdb, vocab)
    if len(anc) >= _VALID_BIT:  # ids must fit beside the packed bit
        return None
    dcap = int(os.environ.get("UNIKMER_TPU_TAXID_PATH_DEPTH_MAX", "48"))
    if path_tab.shape[1] > dcap:
        return None
    return ("paths", anc, path_tab)
