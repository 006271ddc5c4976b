"""Device (jitted) sorted-set algebra on padded uint64 arrays.

The host engine (ops/sets.py) runs the CLI; this module is the
HBM-resident equivalent used by the sharded/parallel paths and by
pipelines that chain many set operations without host round-trips
(SURVEY.md §7.1 "unikit.sets").

Representation: a set is (codes, n) — a sorted uint64 array whose first
n slots are the members and whose tail is CODE_SENTINEL padding.  All
ops are static-shape; results use the combined capacity.

Membership tests are vectorized binary searches (jnp.searchsorted —
merge-path joins); sentinel-valued members are not supported here (the
sharded pipelines already reserve the sentinel, see parallel/sharded).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .codec import CODE_SENTINEL

SENT = np.uint64(CODE_SENTINEL)


def _compact_mask(values: jnp.ndarray, keep: jnp.ndarray,
                  code_bits: int = 64):
    """Compact kept entries of an ascending sentinel-padded code array
    (sort-based on TPU: the scatter form costs seconds at 2^25 —
    ops/sort.use_sort_compact)."""
    from .sort import compact_sorted

    return (compact_sorted(values, keep, SENT, code_bits=code_bits),
            jnp.sum(keep, dtype=jnp.int64))


@partial(jax.jit, static_argnames=("code_bits",))
def union(a: jnp.ndarray, b: jnp.ndarray, code_bits: int = 64):
    """Union of two padded sorted sets -> (codes, n) with capacity
    len(a)+len(b).  ``code_bits`` bounds real member values (sentinel
    padding aside) so the sort can pick its narrow split width."""
    from .sort import _sort_u64

    merged = _sort_u64(jnp.concatenate([a, b]), code_bits=code_bits)
    first = jnp.concatenate([jnp.ones((1,), bool), merged[1:] != merged[:-1]])
    keep = first & (merged != SENT)
    return _compact_mask(merged, keep, code_bits=code_bits)


@jax.jit
def intersect(a: jnp.ndarray, b: jnp.ndarray):
    """Intersection -> (codes, n) with capacity len(a)."""
    idx = jnp.clip(jnp.searchsorted(b, a), 0, b.shape[0] - 1)
    keep = (b[idx] == a) & (a != SENT)
    return _compact_mask(a, keep)


@jax.jit
def subtract(a: jnp.ndarray, b: jnp.ndarray):
    """a - b -> (codes, n) with capacity len(a)."""
    idx = jnp.clip(jnp.searchsorted(b, a), 0, b.shape[0] - 1)
    keep = (b[idx] != a) & (a != SENT)
    return _compact_mask(a, keep)


@partial(jax.jit, static_argnames=("threshold", "code_bits"))
def common(sets: jnp.ndarray, threshold: int, code_bits: int = 64):
    """Codes appearing in >= threshold of the stacked padded sets
    (sets: (F, C)) -> (codes, n) with capacity F*C."""
    from .sort import _sort_u64

    merged = _sort_u64(sets.reshape(-1), code_bits=code_bits)
    first = jnp.concatenate([jnp.ones((1,), bool), merged[1:] != merged[:-1]])
    idx = jnp.arange(merged.shape[0], dtype=jnp.int64)
    start = jax.lax.cummax(jnp.where(first, idx, 0))
    last = jnp.concatenate([merged[1:] != merged[:-1], jnp.ones((1,), bool)])
    end = jax.lax.cummin(jnp.where(last, idx + 1, merged.shape[0]),
                         reverse=True)
    count = end - start
    keep = first & (merged != SENT) & (count >= threshold)
    return _compact_mask(merged, keep, code_bits=code_bits)


@jax.jit
def member_bits(query, codes):
    """Bit-packed membership of a codes block in a device-resident
    sorted query set (SENT padding excluded on host): one vectorized
    binary search + 8x-compressed egress.  The device tier behind
    grep's lookup loop (grep.go:617-676) for very large query sets."""
    idx = jnp.clip(jnp.searchsorted(query, codes), 0, query.shape[0] - 1)
    ok = (query[idx] == codes) & (codes != SENT) & (query[idx] != SENT)
    return jnp.packbits(ok, bitorder="little")


class DeviceMembership:
    """Host driver for the grep device tier: upload the sorted query
    set once, answer per-block membership with bit-packed fetches.
    The all-ones sentinel's membership is resolved on host exactly."""

    def __init__(self, query_set: np.ndarray):
        from ..models.count import _padded_len, _warm_device_session

        self.sent_in = bool(len(query_set)) and query_set[-1] == SENT
        q = query_set[:-1] if self.sent_in else query_set
        nn = _padded_len(max(len(q), 1))
        pad = np.full(nn, SENT, np.uint64)
        pad[: len(q)] = q
        _warm_device_session()
        self.dev_q = jnp.asarray(pad)
        self._padded_len = _padded_len

    def lookup(self, look: np.ndarray) -> np.ndarray:
        n = len(look)
        if n == 0:
            return np.zeros(0, bool)
        nn = self._padded_len(n)
        pad = np.full(nn, SENT, np.uint64)
        pad[:n] = look
        bits = np.asarray(member_bits(self.dev_q, jnp.asarray(pad)))
        ok = np.unpackbits(bits, bitorder="little")[:n].astype(bool)
        if self.sent_in:
            ok |= look == SENT
        return ok


def grep_device_route(n_query: int) -> bool:
    """Should grep route membership through the device?

    DEMOTED to opt-in (round-4 chip measurement, VERDICT round-3 next
    #4): on the tunnel-attached chip the tier LOSES to the host
    searchsorted loop at both probed sizes — query 2^23: 110.4 s vs
    15.5 s host (7.1x); query 2^25: 179.4 s vs 41.4 s (4.3x) over a
    2^24-code lookup stream (scripts/exp_grep_chip.py, 2026-08-21).
    The u64 lookup-block ingress dominates; a PCIe-attached production
    host may invert this, but there is no evidence yet, so auto = off.
    UNIKMER_TPU_GREP_DEVICE=1 forces the tier (also used by CPU parity
    tests); =0 disables explicitly."""
    knob = os.environ.get("UNIKMER_TPU_GREP_DEVICE", "auto")
    return knob == "1"


def _compact_mask_with(values, aux, keep, aux_fill, code_bits: int = 64):
    """Compact (values, aux) rows where keep; returns (vals, aux, n).
    Codes compact via one more sort, the aux column via a (u32 key,
    aux) payload sort — no 2^25-source scatters (round-5 micro4)."""
    from .sort import compact_aux, compact_sorted

    out_v = compact_sorted(values, keep, SENT, code_bits=code_bits)
    out_a = compact_aux(keep, aux, aux_fill)
    return out_v, out_a, jnp.sum(keep, dtype=jnp.int64)


@partial(jax.jit, static_argnames=("max_depth",))
def intersect_with_taxids(a, ta, b, tb, parent, depth, max_depth: int):
    """Intersection with LCA-merged taxids (reference inter.go:228-249:
    matching codes merge the two taxids by LCA; 0 acts as identity, so a
    taxid-less side passes the other side's taxid through)."""
    from ..taxonomy.lca import lca_pairs_device

    idx = jnp.clip(jnp.searchsorted(b, a), 0, b.shape[0] - 1)
    hit = (b[idx] == a) & (a != SENT)
    t_other = jnp.where(hit, tb[idx], 0).astype(jnp.uint32)
    merged = lca_pairs_device(ta.astype(jnp.uint32), t_other, parent, depth,
                              max_depth)
    return _compact_mask_with(a, merged, hit, jnp.uint32(0))


@jax.jit
def intersect_one_sided_taxids(a, ta, b, tb):
    """Intersection when only one input carries taxids (the reference's
    --mix-taxid semantics, inter.go:158-169): exactly one of ta/tb is a
    zero column, so merged = ta | tb needs no LCA tables."""
    idx = jnp.clip(jnp.searchsorted(b, a), 0, b.shape[0] - 1)
    hit = (b[idx] == a) & (a != SENT)
    merged = (ta.astype(jnp.uint32)
              | jnp.where(hit, tb[idx], 0).astype(jnp.uint32))
    return _compact_mask_with(a, merged, hit, jnp.uint32(0))


@jax.jit
def subtract_with_taxids(a, ta, b):
    """a - b keeping a's taxid column (reference diff keeps the query's
    taxids, diff.go:379-454)."""
    idx = jnp.clip(jnp.searchsorted(b, a), 0, b.shape[0] - 1)
    keep = (b[idx] != a) & (a != SENT)
    return _compact_mask_with(a, ta.astype(jnp.uint32), keep, jnp.uint32(0))


@partial(jax.jit, static_argnames=("max_depth", "rounds"))
def union_with_taxids(a, ta, b, tb, parent, depth, max_depth: int, rounds: int):
    """Union with LCA-merged taxid column, fully on device
    (the device analog of ops/sets.union + taxdb.lca_reduce).

    a/b: padded sorted code arrays; ta/tb: uint32 taxids (0 on padding).
    parent/depth/max_depth from taxonomy.lca.device_tables; rounds >=
    ceil(log2(max multiplicity per code)) — 1 suffices for two deduped
    inputs.  Returns (codes, taxids, n) compacted to a dense prefix.
    """
    from ..taxonomy.lca import lca_collapse_device

    codes = jnp.concatenate([a, b])
    taxids = jnp.concatenate([ta, tb]).astype(jnp.uint32)
    valid = codes != SENT
    s_codes, s_tax, keep = lca_collapse_device(
        codes, taxids, valid, parent, depth, max_depth, rounds
    )
    out_c, n = _compact_mask(s_codes, keep)
    from .sort import compact_aux

    out_t = compact_aux(keep, s_tax.astype(jnp.uint32), jnp.uint32(0))
    return out_c, out_t, n


@partial(jax.jit, static_argnames=("rounds", "kind", "threshold",
                                   "code_bits"))
def setop_taxids_compact(codes, ctax, lca_tab, rounds: int,
                         kind: str = "table", threshold: int = 1,
                         code_bits: int = 64):
    """Threshold set algebra with LCA-merged COMPACT-id taxid column in
    ONE program: feed the concatenation of all (per-input deduped)
    inputs (SENT padding, ctax 0 on padding); the collapse sorts,
    merges each code run through the vocabulary LCA structure, and
    keeps runs with >= threshold valid members — threshold 1 = union,
    F = intersection, n = `common -n` (inter.go:228-249,
    common.go:262-267).  ``kind`` picks the merge representation:
    "table" = (C, C) closure table (one gather per doubling round,
    small vocabularies) or "paths" = (C, Dp) path matrix (gather-free
    rounds, large vocabularies) — taxonomy/lca.py.
    Returns (codes, compact ids, n)."""
    from ..taxonomy.lca import lca_collapse_compact, lca_collapse_paths

    valid = codes != SENT
    collapse = lca_collapse_compact if kind == "table" else lca_collapse_paths
    s_codes, tax, keep, s_valid = collapse(
        codes, ctax, valid, lca_tab, rounds, code_bits
    )
    if threshold > 1:
        from .sort import _run_bounds

        first, start, end = _run_bounds(s_codes)
        v = s_valid.astype(jnp.int64)
        csum = jnp.cumsum(v)
        count = csum[end - 1] - csum[start] + v[start]
        keep = keep & (count >= threshold)
    out_c, out_t, n = _compact_mask_with(s_codes, tax, keep, jnp.int32(0),
                                         code_bits=code_bits)
    return out_c, out_t, n


def union_taxids_compact(codes, ctax, lca_tab, rounds: int,
                         kind: str = "table", code_bits: int = 64):
    """N-way LCA union (threshold 1) — device analog of ops/sets.union
    + taxdb.lca_reduce (union.go:195-202) in TPU-fit form."""
    return setop_taxids_compact(codes, ctax, lca_tab, rounds, kind, 1,
                                code_bits)


_INGRESS_EXC = 1 << 16


def use_staged_taxid_programs() -> bool:
    """Run the device taxid collapse as THREE small programs (sort ->
    merge rounds -> compact/egress) with device-resident handoff
    instead of one monolithic graph.  The monolith starves the remote
    AOT compile helper at 2^23+ (>20 min, vs ~40 s for each
    count_step-sized piece — BENCH_NOTES round-3); the three stages
    individually mirror programs proven to compile on this backend.
    Costs two extra dispatches (~25 ms each on the dev tunnel, ~0 on
    PCIe hosts) — noise next to the compile-reliability win.
    UNIKMER_TPU_TAXID_STAGED=0/1 forces (1 lets CPU tests exercise the
    staged programs); auto = on for non-cpu backends."""
    knob = os.environ.get("UNIKMER_TPU_TAXID_STAGED", "auto")
    if knob == "0":
        return False
    if knob == "1":
        return True
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


@partial(jax.jit, static_argnames=("ib", "code_bits"))
def _staged_sort_raw(pad_c, pad_t, ib: int, code_bits: int):
    """Staged stage 1/3 (raw ingress): padded codes + compact ids ->
    sorted packed key (the ONLY inter-stage buffer)."""
    from ..taxonomy.lca import collapse_sort_key

    valid = pad_c != SENT
    return collapse_sort_key(pad_c, pad_t.astype(jnp.int32), valid, ib,
                             code_bits)


@partial(jax.jit, static_argnames=("ib", "code_bits"))
def _staged_sort_ingress(small, exc_idx, exc_step, tin, ib: int,
                         code_bits: int):
    """Staged stage 1/3 with compressed u32-delta code ingress."""
    from ..taxonomy.lca import collapse_sort_key

    codes = _decode_u64_ingress(small, exc_idx, exc_step)
    valid = codes != SENT
    return collapse_sort_key(codes, tin.astype(jnp.int32), valid, ib,
                             code_bits)


@jax.jit
def _staged_sort_raw_split3(pad_c, pad_t):
    """Staged stage 1/3 for UNPACKABLE configs: padded codes + compact
    ids -> sorted (hi, lo, payload) split3 triple (the 3-buffer
    inter-stage handoff; no u64 sort operand)."""
    from ..taxonomy.lca import collapse_sort_split3

    valid = pad_c != SENT
    return collapse_sort_split3(pad_c, pad_t.astype(jnp.int32), valid)


@jax.jit
def _staged_sort_ingress_split3(small, exc_idx, exc_step, tin):
    """Split3 stage 1/3 with compressed u32-delta code ingress."""
    from ..taxonomy.lca import collapse_sort_split3

    codes = _decode_u64_ingress(small, exc_idx, exc_step)
    valid = codes != SENT
    return collapse_sort_split3(codes, tin.astype(jnp.int32), valid)


@partial(jax.jit, static_argnames=("wide",))
def _taxid_compress_stage(out_c, out_t, n, wide: bool):
    """Compressed-egress program over a device-resident compacted taxid
    result (split off _staged_egress: the fused compact+compress
    composition hits the same XLA fusion pathology as the count egress
    — see models/count._split_egress)."""
    from ..models.count import _compress_result

    small, exc_idx, exc_val, n_exc, n = _compress_result(out_c, n)
    return (small, exc_idx, exc_val, n_exc, n,
            out_t.astype(jnp.uint32 if wide else jnp.uint16))


@partial(jax.jit, static_argnames=("z_out", "wide", "code_bits"))
def _staged_egress_fused(s_codes, tax, keep, z_out: bool, wide: bool,
                         code_bits: int = 64):
    out_c, out_t, n = _compact_mask_with(s_codes, tax, keep, jnp.int32(0),
                                         code_bits=code_bits)
    if not z_out:
        return out_c, out_t, n
    from ..models.count import _compress_result

    small, exc_idx, exc_val, n_exc, n = _compress_result(out_c, n)
    return (small, exc_idx, exc_val, n_exc, n,
            out_t.astype(jnp.uint32 if wide else jnp.uint16))


def _staged_egress(s_codes, tax, keep, z_out: bool, wide: bool,
                   code_bits: int = 64):
    """Staged stage 3/3: compact the kept rows; optionally compress the
    egress (u32-delta codes + u16/u32 compact ids) for the slow
    device->host tunnel.  The compress runs as its own program by
    default (UNIKMER_TPU_SPLIT_EGRESS; round-5 fusion pathology);
    ``code_bits`` lets the compaction sort use the narrow split."""
    from ..models.count import _split_egress

    if not z_out or not _split_egress():
        return _staged_egress_fused(s_codes, tax, keep, z_out, wide,
                                    code_bits=code_bits)
    out_c, out_t, n = _staged_egress_fused(s_codes, tax, keep, False,
                                           wide, code_bits=code_bits)
    return _taxid_compress_stage(out_c, out_t, n, wide)


def run_staged_taxid_collapse(skey, lca_tab, rounds: int, ib: int,
                              kind: str, z_out: bool, wide: bool,
                              mode: str = "all", threshold: int = 1,
                              phase: str = "taxid", code_bits: int = 64):
    """Stages 2+3 over a stage-1 sorted key (shared by the union and
    count -T staged drivers); each dispatch under its own phase
    watchdog so a chip log shows WHICH stage starves.

    Returns (result, raw_fn): ``raw_fn`` re-runs ONLY stage 3 with
    z_out=False over the still-device-resident stage-2 outputs — the
    exception-overflow fallback must never dispatch the monolithic
    collapse graph the staging exists to avoid (it compile-starves on
    tpu).

    ``skey`` is either the sorted packed u64 key (packable configs) or
    the sorted (hi, lo, payload) split3 TRIPLE — the 3-buffer handoff
    for unpackable configs (full hashes / k>=24 big vocab), which runs
    the same rounds+egress without a u64 sort operand anywhere."""
    from ..models.count import phase_watchdog
    from ..taxonomy.lca import (
        lca_keep_mask_only, lca_merge_rounds_only, lca_rounds_staged,
        lca_rounds_staged_split3,
    )

    if isinstance(skey, tuple):
        h, l, pay = skey
        with phase_watchdog(f"{phase} staged split3 rounds (stage 2/3)"):
            s_codes, tax, keep = lca_rounds_staged_split3(
                h, l, pay, lca_tab, rounds, kind, mode, threshold)
        with phase_watchdog(f"{phase} staged egress (stage 3/3)"):
            res = _staged_egress(s_codes, tax, keep, z_out, wide,
                                 code_bits=code_bits)

        def raw_fn_split3():
            with phase_watchdog(f"{phase} staged raw re-egress"):
                return _staged_egress(s_codes, tax, keep, False, wide,
                                      code_bits=code_bits)

        return res, raw_fn_split3

    if os.environ.get("UNIKMER_TPU_TAXID_STAGE2_SPLIT") == "1":
        # 4-program bisect mode: if the fused stage-2 program starves
        # the AOT compiler, these two watchdogs name the guilty half
        with phase_watchdog(f"{phase} staged merge rounds (stage 2a)"):
            tax = lca_merge_rounds_only(skey, lca_tab, rounds, ib, kind)
        with phase_watchdog(f"{phase} staged keep mask (stage 2b)"):
            s_codes, keep = lca_keep_mask_only(skey, ib, mode, threshold)
    else:
        with phase_watchdog(f"{phase} staged rounds (stage 2/3)"):
            s_codes, tax, keep = lca_rounds_staged(
                skey, lca_tab, rounds, ib, kind, mode, threshold)
    with phase_watchdog(f"{phase} staged egress (stage 3/3)"):
        res = _staged_egress(s_codes, tax, keep, z_out, wide,
                             code_bits=code_bits)

    def raw_fn():
        with phase_watchdog(f"{phase} staged raw re-egress"):
            return _staged_egress(s_codes, tax, keep, False, wide,
                                  code_bits=code_bits)

    return res, raw_fn


def use_compressed_taxid_ingress() -> bool:
    """Compressed host->device ingress pays on tunnel-attached backends
    (~35 MB/s up); the encoder itself declines (returns None) when the
    data doesn't delta-compress.  UNIKMER_TPU_COMPRESS_TAXID_INGRESS=0/1
    forces (1 lets CPU tests exercise the ingress programs)."""
    knob = os.environ.get("UNIKMER_TPU_COMPRESS_TAXID_INGRESS", "auto")
    if knob == "0":
        return False
    if knob == "1":
        return True
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _encode_u64_ingress(pad_c: np.ndarray):
    """Host-side u32-delta encoding of an arbitrary u64 array for cheap
    host->device transfer: (small u32, exc_idx i64, exc_step u64) where
    exceptions carry absolute resets as a step function (mod-2^64 exact;
    the mirror of models/count._decode_packed_result).  Returns None
    when the exception list would overflow (e.g. sparse hashed codes) —
    caller uploads raw."""
    nn = len(pad_c)
    with np.errstate(over="ignore"):
        delta = np.diff(pad_c, prepend=pad_c[:1] * 0)
    big = np.flatnonzero(delta >= (1 << 32))
    if len(big) > _INGRESS_EXC:
        return None
    small = delta.copy()
    small[big] = 0
    small = small.astype(np.uint32)
    with np.errstate(over="ignore"):
        base = np.cumsum(small, dtype=np.uint64)
        corr = pad_c[big] - base[big]
        step = corr - np.concatenate([np.zeros(1, np.uint64), corr[:-1]])
    exc_idx = np.full(_INGRESS_EXC, nn, np.int64)
    exc_idx[: len(big)] = big
    exc_step = np.zeros(_INGRESS_EXC, np.uint64)
    exc_step[: len(big)] = step
    return small, exc_idx, exc_step


def _decode_u64_ingress(small, exc_idx, exc_step):
    """Device twin of _encode_u64_ingress (runs inside the jitted
    program: one u64 cumsum + one sparse scatter-add + one more cumsum)."""
    base = jnp.cumsum(small.astype(jnp.uint64))
    step = jnp.zeros_like(base).at[exc_idx].add(exc_step, mode="drop")
    return base + jnp.cumsum(step)


@partial(jax.jit, static_argnames=("rounds", "z_out", "kind", "code_bits"))
def _union_taxids_ingress_z(small, exc_idx, exc_step, tin, lca_tab,
                            rounds: int, z_out: bool,
                            kind: str = "table", code_bits: int = 64):
    """One program: compressed-ingress decode -> N-way LCA union ->
    (optionally) compressed egress.  Ingress: u32-delta codes + sparse
    step exceptions + u16/u32 compact ids (~2x less host->device than
    the raw u64+i32 upload over the 35 MB/s dev tunnel)."""
    codes = _decode_u64_ingress(small, exc_idx, exc_step)
    ctax = tin.astype(jnp.int32)
    if z_out:
        return _union_taxids_compact_z(codes, ctax, lca_tab, rounds, kind,
                                       code_bits)
    return union_taxids_compact(codes, ctax, lca_tab, rounds, kind,
                                code_bits)


@partial(jax.jit, static_argnames=("rounds", "kind", "code_bits"))
def _union_taxids_compact_z(codes, ctax, lca_tab, rounds: int,
                            kind: str = "table", code_bits: int = 64):
    """union_taxids_compact + compressed egress (u32-delta codes, u16
    compact ids — u32 when the vocabulary structure outgrows u16): a
    raw fetch of the padded 2^24 u64+i32 buffers is 30-60 min over the
    ~6 MB/s dev tunnel."""
    out_c, out_t, n = union_taxids_compact(codes, ctax, lca_tab, rounds,
                                           kind, code_bits)
    from ..models.count import _compress_result

    small, exc_idx, exc_val, n_exc, n = _compress_result(out_c, n)
    wide = lca_tab.shape[0] > 0xFFFF
    return (small, exc_idx, exc_val, n_exc, n,
            out_t.astype(jnp.uint32 if wide else jnp.uint16))


def union_taxids_device(code_arrays, taxid_arrays, taxdb,
                        code_bits: int = 64):
    """Host driver for the device taxid union: returns (codes, taxids)
    or None when the tiered admission declines (unknown nonzero taxids
    — their merge rule is order-dependent and owned by the host engine
    — or a path matrix too deep; taxonomy/lca.device_lca_plan).

    ``code_bits`` is the HEADER-derived static bound on code values
    (2k for 2-bit codes, 64 for hashes) — it keys the jitted programs,
    so it must not be data-derived."""
    from ..taxonomy.lca import (
        compact_ids, device_collapse_admissible, device_lca_plan,
    )

    all_tax = np.concatenate(
        [np.asarray(t, np.uint32) for t in taxid_arrays]
    ) if taxid_arrays else np.zeros(0, np.uint32)
    route = device_lca_plan(taxdb, all_tax)
    if route is None:
        return None
    kind, closure, lca_tab = route
    if not device_collapse_admissible(code_bits, len(closure)):
        return None  # 2-operand fallback sort compile-starves on tpu
    codes = np.concatenate(
        [np.asarray(c, np.uint64) for c in code_arrays]
    ) if code_arrays else np.zeros(0, np.uint64)
    if len(codes) and codes.max() == SENT:
        # a REAL all-ones code is indistinguishable from padding in the
        # device program (sentinel-only masking is forbidden to lose
        # codes — CLAUDE.md invariant): the host engine owns this case
        return None
    ctax = compact_ids(closure, all_tax)
    # pad to the pipeline's pow-2 program quanta (bounded recompiles)
    from ..models.count import _padded_len

    nn = _padded_len(max(len(codes), 1))
    if nn > (1 << 25):
        return None  # beyond the validated bucket (2^26 hangs, CLAUDE.md)
    pad_c = np.full(nn, np.uint64(SENT), np.uint64)
    pad_c[: len(codes)] = codes
    pad_t = np.zeros(nn, np.int32)
    pad_t[: len(ctax)] = ctax
    rounds = max(nn.bit_length() - 1, 1)
    from ..models.count import (
        _fetch_scalar_watchdog, _warm_device_session, fetch_taxid_result,
        materialize_staged_taxid_result, use_compressed_taxid_fetch,
    )

    from ..models.count import phase_watchdog

    # watchdogged tiny round-trip before the first big upload: the
    # tunnel drops occasional first dispatches (fetch hangs forever,
    # observed 2026-08-20 on this very route), and without it the
    # CLI freezes with no diagnostic (no-op on cpu)
    _warm_device_session()
    dtab = jnp.asarray(lca_tab)

    space_bits = int(codes.max()).bit_length() if len(codes) else 1

    def raw():
        # lazy upload: only pays the raw u64+i32 transfer when actually
        # taken (direct route or exception-overflow re-run)
        return union_taxids_compact(
            jnp.asarray(pad_c), jnp.asarray(pad_t), dtab, rounds, kind,
            code_bits)

    z_out = use_compressed_taxid_fetch(space_bits, nn, len(closure))
    enc = None
    if use_compressed_taxid_ingress():
        enc = _encode_u64_ingress(pad_c)

    from ..taxonomy.lca import (
        _id_bits, collapse_sort_packable, staged_split3_wanted,
    )

    packable = collapse_sort_packable(code_bits, len(closure))
    if use_staged_taxid_programs() and (packable or staged_split3_wanted()):
        ib = _id_bits(len(closure))
        wide = len(closure) > 0xFFFF
        id_np = np.uint32 if wide else np.uint16
        with phase_watchdog("taxid union staged sort (stage 1/3)"):
            if enc is not None:
                small, exc_idx, exc_step = enc
                args = (jnp.asarray(small), jnp.asarray(exc_idx),
                        jnp.asarray(exc_step),
                        jnp.asarray(pad_t.astype(id_np)))
                skey = (_staged_sort_ingress(*args, ib, code_bits)
                        if packable else
                        _staged_sort_ingress_split3(*args))
            elif packable:
                skey = _staged_sort_raw(
                    jnp.asarray(pad_c), jnp.asarray(pad_t), ib, code_bits)
            else:
                skey = _staged_sort_raw_split3(
                    jnp.asarray(pad_c), jnp.asarray(pad_t))
        res, staged_raw = run_staged_taxid_collapse(
            skey, dtab, rounds, ib, kind, z_out, wide,
            phase="taxid union", code_bits=code_bits)
        return materialize_staged_taxid_result(res, staged_raw, z_out,
                                               closure)

    if enc is not None:
        small, exc_idx, exc_step = enc
        id_np = np.uint16 if len(closure) <= 0xFFFF else np.uint32
        with phase_watchdog("taxid union upload/compile/dispatch"):
            res = _union_taxids_ingress_z(
                jnp.asarray(small), jnp.asarray(exc_idx),
                jnp.asarray(exc_step), jnp.asarray(pad_t.astype(id_np)),
                dtab, rounds, z_out, kind, code_bits)
        if z_out:
            return fetch_taxid_result(res, raw, closure)
        out_c, out_t, n = res
    elif z_out:
        with phase_watchdog("taxid union upload/compile/dispatch"):
            z = _union_taxids_compact_z(
                jnp.asarray(pad_c), jnp.asarray(pad_t), dtab, rounds,
                kind, code_bits)
        return fetch_taxid_result(z, raw, closure)
    else:
        with phase_watchdog("taxid union upload/compile/dispatch"):
            out_c, out_t, n = raw()
    n = _fetch_scalar_watchdog(n)
    return (np.asarray(out_c[:n]),
            closure[np.asarray(out_t[:n]).astype(np.int64)])
