"""Hash-range sharded k-mer sets over a device mesh.

The reference's beyond-RAM mechanism is chunk files on disk merged
through a heap (SURVEY.md §3.2); the TPU-native replacement keeps the
set as a range-partitioned, shard-locally-sorted uint64 array in HBM:

  * build: each shard encodes its slice of the packed genome (halo of
    k-1+1 bases so boundary windows exist exactly once), buckets codes
    by their top bits, and a static-shape ``all_to_all`` repartitions
    buckets so shard i owns code range [i, i+1) * 2^64/D.
  * shard-local sort + collapse makes each shard a sorted distinct set;
    concatenating shards in order yields the global sorted set.
  * set ops (union/inter/diff/common) become embarrassingly parallel
    per-shard merge-joins (same kernels as single-chip) + psum counts.

Capacity handling: all shapes are static; per-destination-bucket
capacity is a build-time constant and overflow is detected exactly
(dropped counts are returned so callers can retry with a bigger
capacity — the analog of the reference's chunk-size flag).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.count import CountConfig, window_codes
from ..ops.codec import CODE_SENTINEL
from .mesh import SHARD_AXIS

SENT = np.uint64(CODE_SENTINEL)


def partition_boundaries(n_shards: int, cfg, code_bits: int) -> np.ndarray:
    """Static LOWER bucket boundaries ((n_shards,) uint64, first 0):
    shard j owns codes in [boundaries[j], boundaries[j+1]).

    Balanced for the code distribution instead of naive equal ranges
    (round 5, VERDICT round-4 next #5 — all_to_all message sizing):

    - canonical 2-bit codes: canonical = min(code, rc-code) of two
      ~uniform values, so the value CDF is F(x) = 2x - x^2; equal-range
      buckets load the first bucket 2 - 1/D heavier (1.75x at D=4),
      which forced 2x capacity slack everywhere.  Boundaries at
      F^-1(j/D) = 1 - sqrt(1 - j/D) equalize expected loads.
    - scaled sketches: kept hashes are <= max_hash = 2^64/scale, so
      equal ranges over 2^64 would send EVERY code to shard 0 (a real
      imbalance bug); boundaries split [0, max_hash] linearly.
    - hashed / non-canonical 2-bit: uniform; equal ranges.

    Real-genome composition bias deviates from these models; capacity
    margins + the drivers' overflow-retry loop absorb it, exactly as
    they absorbed the old canonical skew."""
    space = float(2 ** code_bits)
    fracs = np.arange(n_shards, dtype=np.float64) / n_shards
    hashed = bool(getattr(cfg, "hashed", False))
    canonical = bool(getattr(cfg, "canonical", False))
    scale = int(getattr(cfg, "scale", 1))
    if hashed and scale > 1:
        from ..ops.nthash import scaled_max_hash

        space = float(scaled_max_hash(scale)) + 1.0
        xs = fracs
    elif canonical and not hashed:
        xs = 1.0 - np.sqrt(1.0 - fracs)
    else:
        xs = fracs
    b = np.minimum(xs * space, space - 1).astype(np.uint64)
    b[0] = 0
    return np.maximum.accumulate(b)  # monotone even at float resolution


def _local_pack_buckets(codes, valid, n_shards, capacity, code_bits,
                        boundaries: np.ndarray | None = None):
    """Sort local codes into a (n_shards, capacity) send buffer (sentinel
    padded, each bucket sorted) + dropped count.

    Buckets are value ranges — by default bucket = code >>
    (code_bits - log2(D)); with ``boundaries`` (a static lower-boundary
    array from :func:`partition_boundaries`) the ranges are balanced
    for the code distribution.  Either way the receiving shard owns a
    contiguous slice of code space and the global set stays
    range-partitioned.  The sentinel value 2^64-1 is reserved (a real
    hash equal to it is dropped from the sharded path; probability
    2^-64 per k-mer, and impossible for 2-bit codes or scaled
    sketches).
    """
    n = codes.shape[0]
    keyed = jnp.where(valid, codes, SENT)
    from ..ops.sort import _sort_u64

    s = _sort_u64(keyed, code_bits=code_bits)
    n_valid = jnp.sum(valid & (codes != SENT), dtype=jnp.int64)
    idx = jnp.arange(n, dtype=jnp.int64)
    is_real = idx < n_valid
    if boundaries is not None:
        bnd = jnp.asarray(np.asarray(boundaries, np.uint64))
        b = (jnp.searchsorted(bnd, s, side="right") - 1).astype(jnp.int64)
        b = jnp.clip(b, 0, n_shards - 1)
        starts = jnp.searchsorted(s, bnd, side="left")
    else:
        log_d = int(np.ceil(np.log2(n_shards))) if n_shards > 1 else 0
        # non-power-of-two meshes clamp the top buckets into the last
        # shard (uneven load, still exact)
        shift = jnp.uint64(max(code_bits - log_d, 0))
        b = jnp.minimum((s >> shift).astype(jnp.int64), n_shards - 1)
        bnd = jnp.arange(n_shards, dtype=jnp.uint64) << shift
        starts = jnp.searchsorted(s, bnd, side="left")
    within = idx - starts[b]
    ok = is_real & (within < capacity)
    flat = jnp.where(ok, b * capacity + within, n_shards * capacity)
    buf = jnp.full((n_shards * capacity,), SENT, dtype=jnp.uint64)
    buf = buf.at[flat].set(s, mode="drop")
    dropped = jnp.sum(is_real & (within >= capacity), dtype=jnp.int32)
    return buf.reshape(n_shards, capacity), dropped


def shard_halos(cfg: CountConfig) -> tuple[int, int]:
    """(front, back) base halo a shard row needs so every window/sketch
    emission is computed exactly and owned once.

    bare k-mers / syncmers decide per position from the k bases ahead:
    back = k-1.  The minimizer stream (ops/sketch.minimizer_windows)
    looks FORWARD over w k-mer groups (back = w+k-2) and compares each
    group's pick against the PREVIOUS group to emit reign starts (front
    = 1) — so cross-shard reigns emit exactly once and even
    unique/repeated multiplicities match the linear stream."""
    if cfg.minimizer_w > 0:
        return 1, cfg.minimizer_w + cfg.k - 2
    return 0, cfg.k - 1


def build_sharded_distinct(mesh: Mesh, cfg: CountConfig, capacity: int):
    """Returns a jitted step: (sharded bases (D, L) uint8) ->
    (owned codes (D, capacity*D) sentinel-padded sorted, per-shard count,
    dropped count).  Boundary windows are handled by the caller packing
    each row with its own record structure (rows are independent
    records/slices).

    cfg.mode drives the collapse: the all_to_all delivers EVERY
    occurrence of a code to its owner shard (range partition,
    duplicates included), so unique/repeated multiplicity filters are
    exact per shard."""
    n_shards = mesh.shape[SHARD_AXIS]
    code_bits = 64 if cfg.hashed else 2 * cfg.k
    front, back = shard_halos(cfg)
    bnd = partition_boundaries(n_shards, cfg, code_bits)

    def local_step(bases_row):
        row = bases_row[0]
        codes, valid = window_codes(row, cfg)
        if cfg.scale > 1 and (cfg.minimizer_w > 0 or cfg.syncmer_s > 0):
            # sketch branches return before the scaled filter
            # (count_step does the same; count.go:373-375)
            from ..models.count import scaled_max_hash

            valid = valid & (codes <= jnp.uint64(scaled_max_hash(cfg.scale)))
        # rows carry halo bases: windows/emissions STARTING inside a
        # halo belong to a neighbor shard — mask them so each is owned
        # exactly once (pack_host_shards layout)
        pos = jnp.arange(row.shape[0], dtype=jnp.int32)
        own = (pos >= front) & (pos < row.shape[0] - back)
        valid = valid & own
        buf, dropped = _local_pack_buckets(
            codes, valid, n_shards, capacity, code_bits, boundaries=bnd
        )
        # all_to_all: exchange bucket b of every shard to shard b
        recv = jax.lax.all_to_all(
            buf[None], SHARD_AXIS, split_axis=1, concat_axis=1, tiled=False
        )
        mine = recv.reshape(-1)  # n_shards * capacity codes destined here
        # local sorted collapse (sentinel-aware)
        from ..ops.sort import collapse_sorted

        out, n = collapse_sorted(mine, mine != SENT, mode=cfg.mode,
                                 code_bits=cfg.code_bits)
        total_dropped = jax.lax.psum(dropped, SHARD_AXIS)
        # a REAL all-ones code (e.g. poly-T at k=32 non-canonical, or a
        # 2^-64 hash) is indistinguishable from padding in the exchange:
        # count it exactly so the host driver can re-append it (the
        # single-device path's sentinel-collision accounting, ops/sort)
        n_sent = jnp.sum(valid & (codes == SENT), dtype=jnp.int64)
        total_sent = jax.lax.psum(n_sent, SHARD_AXIS)
        return out[None], n[None], total_dropped[None], total_sent[None]

    step = jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=P(SHARD_AXIS, None),
            out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS),
                       P(SHARD_AXIS)),
        )
    )
    return step


def _taxid_exchange(bases_row, ctax_row, cfg: CountConfig, ib: int,
                    n_shards: int, capacity: int, packed_bits: int,
                    front: int, back: int,
                    boundaries: np.ndarray | None = None):
    """Shared front half of the sharded count -T builds (monolithic
    AND staged — parity-critical, keep ONE copy): window encode, halo
    own-mask, packed-key build, all_to_all exchange, unpack.  Returns
    (m_codes, m_ctax, m_valid, dropped)."""
    from ..models.count import scaled_max_hash

    ALL1 = jnp.uint64(0xFFFFFFFFFFFFFFFF)
    row = bases_row[0]
    codes, valid = window_codes(row, cfg)
    if cfg.scale > 1 and (cfg.minimizer_w > 0 or cfg.syncmer_s > 0):
        valid = valid & (codes <= jnp.uint64(scaled_max_hash(cfg.scale)))
    pos = jnp.arange(row.shape[0], dtype=jnp.int32)
    own = (pos >= front) & (pos < row.shape[0] - back)
    valid = valid & own
    sh = jnp.uint64(ib + 1)
    key = jnp.where(
        valid,
        (codes << sh) | (jnp.uint64(1) << jnp.uint64(ib))
        | ctax_row[0].astype(jnp.uint64),
        ALL1,
    )
    buf, dropped = _local_pack_buckets(
        key, key != ALL1, n_shards, capacity, packed_bits,
        boundaries=boundaries,
    )
    recv = jax.lax.all_to_all(
        buf[None], SHARD_AXIS, split_axis=1, concat_axis=1, tiled=False
    )
    mine = recv.reshape(-1)
    m_valid = (mine != ALL1) & (
        ((mine >> jnp.uint64(ib)) & jnp.uint64(1)).astype(bool)
    )
    m_codes = mine >> sh
    m_ctax = jnp.where(
        m_valid,
        (mine & ((jnp.uint64(1) << jnp.uint64(ib)) - 1)).astype(jnp.int32),
        0,
    )
    return m_codes, m_ctax, m_valid, dropped


def build_sharded_taxids(mesh: Mesh, cfg: CountConfig, capacity: int,
                         n_ids: int, code_bits: int, rounds: int,
                         kind: str):
    """Sharded `count -T` build: bases rows + per-position compact
    taxid ids -> per-shard LCA-merged (codes, ids) with cfg.mode
    multiplicity filters, exact (every occurrence reaches its owner
    shard).

    The taxid id and valid bit ride PACKED in the exchanged u64 key
    (code in the high bits), so the all_to_all moves one operand and
    the range partition stays keyed by code — same single-operand
    discipline as taxonomy/lca._collapse_sort; admission requires
    code_bits + id bits + 1 <= 63 (the driver declines k=32 and huge
    vocabularies to the single-device/host tiers)."""
    from ..taxonomy.lca import _id_bits

    n_shards = mesh.shape[SHARD_AXIS]
    ib = _id_bits(n_ids)
    # +2: the local collapse re-packs with an invalid substitute one
    # bit above code_bits (see code_bits + 1 below)
    assert code_bits + ib + 2 <= 63, "packed-key admission violated"
    packed_bits = code_bits + ib + 1
    front, back = shard_halos(cfg)
    # balanced partition in PACKED-key space: the code occupies the top
    # bits, so code-space boundaries shift left by (ib + 1)
    pk_bnd = partition_boundaries(n_shards, cfg, code_bits) << np.uint64(
        ib + 1)

    def local_step(bases_row, ctax_row, tab):
        m_codes, m_ctax, m_valid, dropped = _taxid_exchange(
            bases_row, ctax_row, cfg, ib, n_shards, capacity,
            packed_bits, front, back, boundaries=pk_bnd)
        from ..ops.sort import _run_bounds, compact_aux, compact_sorted
        from ..taxonomy.lca import lca_collapse_compact, lca_collapse_paths

        collapse = (lca_collapse_compact if kind == "table"
                    else lca_collapse_paths)
        # invalid slots -> huge substitute codes (all-ones >> (ib+1))
        # that sort last
        invalid_code = jnp.uint64(0xFFFFFFFFFFFFFFFF) >> jnp.uint64(ib + 1)
        s_codes, tax, keep, s_valid = collapse(
            jnp.where(m_valid, m_codes, invalid_code), m_ctax, m_valid, tab,
            rounds, code_bits + 1,
        )
        if cfg.mode in ("unique", "repeated"):
            first, start, end = _run_bounds(s_codes)
            v = s_valid.astype(jnp.int64)
            csum = jnp.cumsum(v)
            cnt = csum[end - 1] - csum[start] + v[start]
            keep = keep & (cnt == 1 if cfg.mode == "unique" else cnt > 1)
        out_c = compact_sorted(s_codes, keep, jnp.uint64(CODE_SENTINEL),
                               code_bits=code_bits + 1)
        out_t = compact_aux(keep, tax, jnp.int32(0))
        n = jnp.sum(keep, dtype=jnp.int64)
        total_dropped = jax.lax.psum(dropped, SHARD_AXIS)
        return (out_c[None], out_t[None], n[None], total_dropped[None])

    return jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                      P(None, None)),
            out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                       P(SHARD_AXIS), P(SHARD_AXIS)),
        )
    )


def build_sharded_taxids_staged(mesh: Mesh, cfg: CountConfig,
                                capacity: int, n_ids: int,
                                code_bits: int, rounds: int, kind: str,
                                stages23=(None, None)):
    """Staged twin of build_sharded_taxids: stage 1 = encode + packed
    all_to_all exchange + collapse-key sort (returns sorted key rows +
    psum'd drop count for the capacity retry loop); stages 2-3 come
    from sharded_setop_taxids_staged.  Same motivation as the
    single-device staging: the monolithic per-shard graph
    compile-starves real TPUs (BENCH_NOTES round-3)."""
    from ..taxonomy.lca import _id_bits, collapse_sort_key

    n_shards = mesh.shape[SHARD_AXIS]
    ib = _id_bits(n_ids)
    assert code_bits + ib + 2 <= 63, "packed-key admission violated"
    packed_bits = code_bits + ib + 1
    front, back = shard_halos(cfg)
    pk_bnd = partition_boundaries(n_shards, cfg, code_bits) << np.uint64(
        ib + 1)

    def local_sort(bases_row, ctax_row):
        m_codes, m_ctax, m_valid, dropped = _taxid_exchange(
            bases_row, ctax_row, cfg, ib, n_shards, capacity,
            packed_bits, front, back, boundaries=pk_bnd)
        # invalid slots -> huge substitute codes (sort last); the
        # collapse key packs (code, valid, id) exactly like the
        # monolith's _collapse_sort at code_bits + 1
        invalid_code = jnp.uint64(0xFFFFFFFFFFFFFFFF) >> jnp.uint64(ib + 1)
        skey = collapse_sort_key(
            jnp.where(m_valid, m_codes, invalid_code), m_ctax, m_valid,
            ib, code_bits + 1,
        )
        total_dropped = jax.lax.psum(dropped, SHARD_AXIS)
        return skey[None], total_dropped[None]

    sort_fn = jax.jit(
        jax.shard_map(
            local_sort,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                      ),
            out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS)),
        )
    )
    # stages 2-3 do not depend on capacity (only rounds_fn on rounds):
    # capacity-retry callers pass their previous fns via ``stages23`` so
    # only stage 1 re-traces per retry
    reuse_rounds, reuse_egress = stages23
    if reuse_rounds is None or reuse_egress is None:
        _, rounds_fn, egress_fn = sharded_setop_taxids_staged(
            mesh, 1, rounds, kind, code_bits + 1, ib, mode=cfg.mode
        )
    rounds_fn = reuse_rounds if reuse_rounds is not None else rounds_fn
    egress_fn = reuse_egress if reuse_egress is not None else egress_fn
    return sort_fn, rounds_fn, egress_fn


def sharded_union_counts(mesh: Mesh, code_bits: int = 64):
    """Jitted: two aligned sharded sorted sets -> per-shard union counts
    and total (psum).  Demonstrates the per-shard merge + collective
    pattern used by distributed set ops."""

    def local(a_row, b_row):
        from ..ops.sort import collapse_sorted

        a, b = a_row[0], b_row[0]
        merged = jnp.concatenate([a, b])
        out, n = collapse_sorted(merged, merged != SENT, mode="distinct",
                                 code_bits=code_bits)
        total = jax.lax.psum(n, SHARD_AXIS)
        return out[None], n[None], total[None]

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None)),
            out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS)),
        )
    )


def sharded_set_op(mesh: Mesh, op: str, code_bits: int = 64):
    """Jitted per-shard merge-join over two aligned range-partitioned
    sorted sets: op in {'union','inter','diff'}.  Returns
    (per-shard padded result, per-shard count, psum total) — the
    distributed analog of cmd/{union,inter,diff} (SURVEY.md §2.4:
    per-file worker pools -> data-parallel shard processing + psum)."""
    from ..ops import device_sets

    if op not in ("union", "inter", "diff"):
        raise ValueError(f"unknown sharded set op: {op}")

    def local(a_row, b_row):
        a, b = a_row[0], b_row[0]
        if op == "union":
            out, n = device_sets.union(a, b, code_bits=code_bits)
        elif op == "inter":
            out, n = device_sets.intersect(a, b)
        else:
            out, n = device_sets.subtract(a, b)
        total = jax.lax.psum(n, SHARD_AXIS)
        return out[None], n[None], total[None]

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None)),
            out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS)),
        )
    )


def sharded_common(mesh: Mesh, threshold: int, code_bits: int = 64):
    """Jitted: stacked aligned sharded sets (D, F, C) -> per-shard codes
    present in >= threshold of the F sets + psum total (cmd/common)."""
    from ..ops import device_sets

    def local(rows):
        out, n = device_sets.common(rows[0], threshold, code_bits=code_bits)
        total = jax.lax.psum(n, SHARD_AXIS)
        return out[None], n[None], total[None]

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=P(SHARD_AXIS, None, None),
            out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS), P(SHARD_AXIS)),
        )
    )


def sharded_union_taxids(mesh: Mesh, max_depth: int):
    """Jitted LCA-merging union over sharded (codes, taxids) pairs with
    replicated taxonomy tables (taxonomy/lca.device_tables)."""
    from ..ops import device_sets

    def local(a_row, ta_row, b_row, tb_row, parent, depth):
        c, t, n = device_sets.union_with_taxids(
            a_row[0], ta_row[0], b_row[0], tb_row[0],
            parent, depth, max_depth, 1,
        )
        total = jax.lax.psum(n, SHARD_AXIS)
        return c[None], t[None], n[None], total[None]

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                P(None), P(None),
            ),
            out_specs=(
                P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                P(SHARD_AXIS), P(SHARD_AXIS),
            ),
        )
    )


def sharded_setop_taxids(mesh: Mesh, threshold: int, rounds: int,
                         kind: str, code_bits: int = 64):
    """Jitted threshold set algebra over stacked taxid-carrying sharded
    sets: (D, F, C) codes + (D, F, C) i32 compact ids + replicated
    vocabulary LCA structure (closure table or path matrix,
    taxonomy/lca.device_lca_plan) -> per-shard (codes, compact ids,
    count) + psum total.  threshold 1/F/n = union/inter/common with
    exact LCA taxid merging (SURVEY.md §2.4 mapping)."""
    from ..ops import device_sets

    def local(c_rows, t_rows, tab):
        codes = c_rows[0].reshape(-1)
        ids = t_rows[0].reshape(-1).astype(jnp.int32)
        out_c, out_t, n = device_sets.setop_taxids_compact(
            codes, ids, tab, rounds, kind, threshold, code_bits
        )
        total = jax.lax.psum(n, SHARD_AXIS)
        return out_c[None], out_t[None], n[None], total[None]

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS, None, None), P(SHARD_AXIS, None, None),
                      P(None, None)),
            out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                       P(SHARD_AXIS), P(SHARD_AXIS)),
        )
    )


def sharded_setop_taxids_staged(mesh: Mesh, threshold: int, rounds: int,
                                kind: str, code_bits: int, ib: int,
                                mode: str = "all"):
    """Staged twin of sharded_setop_taxids: THREE shard_map programs
    (packed-key sort -> merge rounds -> compact) with sharded
    device-resident handoff, mirroring ops/device_sets'
    single-device staging — the monolithic per-shard collapse graph is
    the same shape that starves the remote AOT compile helper at 2^23+
    on real TPUs (BENCH_NOTES round-3).  Returns (sort_fn, rounds_fn,
    egress_fn) to be applied in sequence."""
    from ..taxonomy.lca import collapse_sort_key, lca_rounds_staged

    def local_sort(c_rows, t_rows):
        codes = c_rows[0].reshape(-1)
        ids = t_rows[0].reshape(-1).astype(jnp.int32)
        valid = codes != SENT
        return collapse_sort_key(codes, ids, valid, ib, code_bits)[None]

    sort_fn = jax.jit(
        jax.shard_map(
            local_sort,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS, None, None), P(SHARD_AXIS, None, None)),
            out_specs=P(SHARD_AXIS, None),
        )
    )

    def local_rounds(k_rows, tab):
        s_codes, tax, keep = lca_rounds_staged(
            k_rows[0], tab, rounds, ib, kind, mode, threshold)
        return s_codes[None], tax[None], keep[None]

    rounds_fn = jax.jit(
        jax.shard_map(
            local_rounds,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS, None), P(None, None)),
            out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                       P(SHARD_AXIS, None)),
        )
    )

    def local_egress(c_rows, t_rows, k_rows):
        from ..ops.device_sets import _compact_mask_with

        out_c, out_t, n = _compact_mask_with(
            c_rows[0], t_rows[0], k_rows[0], jnp.int32(0))
        total = jax.lax.psum(n, SHARD_AXIS)
        return out_c[None], out_t[None], n[None], total[None]

    egress_fn = jax.jit(
        jax.shard_map(
            local_egress,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                      P(SHARD_AXIS, None)),
            out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                       P(SHARD_AXIS), P(SHARD_AXIS)),
        )
    )
    return sort_fn, rounds_fn, egress_fn


def sharded_diff_taxids(mesh: Mesh):
    """Jitted per-shard subtraction keeping the first set's taxids
    (diff.go:379-454; the query's taxid column rides through)."""
    from ..ops import device_sets

    def local(a_row, ta_row, u_row):
        c, t, n = device_sets.subtract_with_taxids(
            a_row[0], ta_row[0], u_row[0]
        )
        total = jax.lax.psum(n, SHARD_AXIS)
        return c[None], t[None], n[None], total[None]

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                      P(SHARD_AXIS, None)),
            out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None),
                       P(SHARD_AXIS), P(SHARD_AXIS)),
        )
    )


def partition_host_set(codes: np.ndarray, n_shards: int, capacity: int,
                       code_bits: int = 64, taxids: np.ndarray | None = None):
    """Range-partition a sorted host set into the (D, capacity) sharded
    layout (sentinel padded) used by the sharded ops.  Raises if any
    shard overflows capacity."""
    log_d = int(np.ceil(np.log2(n_shards))) if n_shards > 1 else 0
    shift = max(code_bits - log_d, 0)
    b = np.minimum(codes >> np.uint64(shift), n_shards - 1).astype(np.int64)
    out = np.full((n_shards, capacity), SENT, dtype=np.uint64)
    out_t = (
        np.zeros((n_shards, capacity), np.uint32) if taxids is not None else None
    )
    for i in range(n_shards):
        mine = codes[b == i]
        if len(mine) > capacity:
            raise ValueError(
                f"shard {i} needs {len(mine)} slots > capacity {capacity}"
            )
        out[i, : len(mine)] = mine
        if out_t is not None:
            out_t[i, : len(mine)] = taxids[b == i]
    if out_t is not None:
        return out, out_t
    return out


def pack_host_rows(values: np.ndarray, n_shards: int, front: int,
                   back: int, fill) -> np.ndarray:
    """Generic row splitter matching pack_host_shards' layout for a
    position-aligned auxiliary column (e.g. per-position taxid ids)."""
    n = len(values)
    per = -(-n // n_shards)
    row_len = front + per + back
    out = np.full((n_shards, row_len), fill, dtype=values.dtype)
    for i in range(n_shards):
        lo = i * per - front
        hi = min(lo + row_len, n)
        src_lo = max(lo, 0)
        if src_lo < n:
            out[i, src_lo - lo : hi - lo] = values[src_lo:hi]
    return out


def pack_host_shards(bases: np.ndarray, n_shards: int, k: int,
                     front: int = 0, back: int | None = None) -> np.ndarray:
    """Split a flat packed base array into n_shards rows of equal length
    with ``front`` halo bases from the previous slice and ``back``
    (default k-1) from the next, so every window/sketch emission of the
    flat array is computed exactly and appears in exactly one row once
    the halo-start positions are masked (build_sharded_distinct's
    ``own`` mask; halos from shard_halos)."""
    from ..ops.codec import INVALID_BASE

    if back is None:
        back = k - 1
    return pack_host_rows(np.asarray(bases, np.uint8), n_shards, front,
                          back, INVALID_BASE)


# ---------------------------------------------------------------------
# Host-facing drivers (the CLI's --mesh entry points)
# ---------------------------------------------------------------------


def _cap_quantum(cap: int, n_shards: int) -> int:
    """Round a per-shard capacity up to a bounded set of bucket sizes so
    real-TPU meshes reuse compiled programs instead of compiling one per
    novel input size (the count pipelines' _pad_quantum discipline: this
    backend has a pathological compile cliff on mid-size ~2^16..2^20
    sorts, and every novel static shape is a fresh multi-minute AOT
    compile).  On TPU the floor is the validated bucket split across the
    mesh; elsewhere a small power-of-two floor keeps tests fast.

    Quantum granularity (UNIKMER_TPU_CAP_QUANTUM): padding costs
    efficiency roughly linearly in the pad factor — pow2's worst-case
    1.9x pad measured 0.845 -> 0.471 scaling efficiency at d=4 on the
    virtual mesh (scripts/exp_mesh_quantum.py, 2026-08-20) — so
    'quarter' steps {1, 1.25, 1.5, 1.75} x 2^i (worst pad 1.25x,
    expected ~1.12x) are the default EVERYWHERE: the 2026-08-21
    session-C probe compiled and ran non-pow2 sorts at
    1.25/1.5/1.75 x 2^23 on the chip, EXACT, in 36-48 s each
    (scripts/exp_nonpow2_probe.py)."""
    import os

    on_tpu = jax.default_backend() == "tpu"
    floor = (1 << 23) // max(n_shards, 1) if on_tpu else 1024
    mode = os.environ.get("UNIKMER_TPU_CAP_QUANTUM", "quarter")
    q = floor
    while q < cap:
        q *= 2
    if mode == "quarter" and q > cap:
        base = q // 2
        if base >= floor:
            for frac in (5, 6, 7):  # 1.25x, 1.5x, 1.75x of the octave
                cand = base * frac // 4
                if cand >= cap:
                    return cand
    elif mode == "half" and q > cap:
        base = q // 2
        if base >= floor and base + base // 2 >= cap:
            return base + base // 2
    return q


def _collect_sharded(out, counts) -> np.ndarray:
    """Fetch a (D, C) sentinel-padded sharded result into one sorted
    host array (range partition => per-shard prefixes concatenate into
    the globally sorted set)."""
    out = np.asarray(out)
    counts = np.asarray(counts)
    return np.concatenate(
        [out[i, : int(counts[i])] for i in range(out.shape[0])]
    ) if out.shape[0] else np.zeros(0, np.uint64)


def _default_capacity(windows: int, d: int) -> int:
    """Per (src shard, dst bucket) send capacity.  Balanced partition
    boundaries (partition_boundaries) put the EXPECTED load at
    windows/d^2 for every modeled config — the old equal-range scheme
    needed 2x slack just for the canonical skew (first bucket carries
    2 - 1/D of uniform).  The margin covers statistical fluctuation and
    real-genome composition bias; overflow is detected exactly and the
    drivers retry with doubled capacity.  On TPU the margin stays 2x:
    a retry is a fresh multi-minute remote AOT compile there, so
    bounded recompiles beat smaller messages until chip evidence says
    otherwise."""
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    margin = 2.0 if on_tpu else 1.35
    return _cap_quantum(int(windows // (d * d) * margin) + 1024, d)


def mesh_count_distinct(bases: np.ndarray, cfg: CountConfig,
                        n_devices: int | None = None,
                        capacity: int | None = None) -> np.ndarray:
    """Host driver for `count --mesh N`: flat packed bases -> sorted
    collapsed codes (cfg.mode) via the all_to_all sharded build.
    Bucket overflow is detected exactly (dropped counter) and retried
    with doubled capacity — the analog of the reference's chunk-size
    retry knob (sort.go -m)."""
    from .mesh import make_mesh

    mesh = make_mesh(n_devices)
    d = mesh.shape[SHARD_AXIS]
    windows = max(len(bases) - cfg.k + 1, 0)
    if windows == 0:
        return np.zeros(0, np.uint64)
    if capacity is None:
        capacity = _default_capacity(windows, d)
    front, back = shard_halos(cfg)
    rows = pack_host_shards(bases, d, cfg.k, front, back)
    while True:
        step = build_sharded_distinct(mesh, cfg, capacity)
        out, counts, dropped, n_sent = step(rows)
        if int(np.asarray(dropped)[0]) == 0:
            res = _collect_sharded(out, counts)
            ns = int(np.asarray(n_sent)[0])
            if ns > 0 and (
                cfg.mode == "distinct"
                or (cfg.mode == "unique" and ns == 1)
                or (cfg.mode == "repeated" and ns > 1)
            ):
                # re-append the real all-ones code (max value: the tail
                # of the globally sorted result)
                res = np.concatenate([res, np.array([SENT], np.uint64)])
            return res
        capacity *= 2


def mesh_count_stream(records, cfg: CountConfig,
                      n_devices: int | None = None,
                      chunk_bases: int | None = None):
    """Streaming `count --mesh`: records are packed into bounded pieces
    (models/count.split_packed), each piece runs the sharded all_to_all
    build, and partial per-piece sets merge through the same
    capped-multiplicity sink as the single-device stream — including
    its beyond-RAM extsort spill (UNIKMER_TPU_COUNT_MEM_MB).  Host RSS
    is O(distinct-or-cap + piece) instead of O(total input), so the
    mesh path counts datasets the single-device spill path handles
    (reference analog: the chunked sort -m engine, sort.go:241-419).

    Returns np.ndarray or models.count.SpilledCount."""
    from ..io.fastx import pack_records
    from ..models.count import _stream_chunk_bases

    if chunk_bases is None:
        chunk_bases = _stream_chunk_bases()

    def packed_iter():
        buf: list = []
        buffered = 0
        for rec in records:
            buf.append(rec)
            buffered += len(rec.seq)
            if buffered >= chunk_bases:
                yield pack_records(buf, cfg.k, cfg.circular)
                buf, buffered = [], 0
        if buf:
            yield pack_records(buf, cfg.k, cfg.circular)

    return mesh_count_stream_packed(packed_iter(), cfg, n_devices,
                                    chunk_bases)


def mesh_count_stream_packed(packed_iter, cfg: CountConfig,
                             n_devices: int | None = None,
                             chunk_bases: int | None = None):
    """mesh_count_stream over already-packed buffers (the native ingest
    path): identical merge semantics, no Python record loop."""
    from ..models.count import (
        _PartialSink, _capped_cfgs, _stream_chunk_bases, split_packed,
    )

    if chunk_bases is None:
        chunk_bases = _stream_chunk_bases()
    distinct_cfg, repeated_cfg = _capped_cfgs(cfg)
    sink = _PartialSink(cfg)
    for packed in packed_iter:
        for piece in split_packed(
            packed, chunk_bases, cfg.k if cfg.segmentable else 0
        ):
            u = mesh_count_distinct(piece.bases, distinct_cfg, n_devices)
            if len(u):
                sink.add(u)
            if repeated_cfg is not None:
                r = mesh_count_distinct(piece.bases, repeated_cfg,
                                        n_devices)
                if len(r):
                    sink.add(r)
    return sink.result()


def mesh_set_op(op: str, code_arrays: list, n_devices: int | None = None,
                code_bits: int = 64,
                threshold: int | None = None) -> np.ndarray:
    """Host driver for `union/inter/diff/common --mesh N` over
    taxid-free inputs: inputs are deduped, range-partitioned across the
    mesh, and reduced per shard (union = present in >= 1 set, inter =
    in all F, common = in >= threshold, diff = first minus union of the
    rest), with psum totals.  Returns the sorted result codes."""
    from .mesh import make_mesh

    if op not in ("union", "inter", "diff", "common"):
        raise ValueError(f"unknown mesh set op: {op}")
    arrs = [np.unique(np.ascontiguousarray(c, np.uint64)) for c in code_arrays]
    if not arrs:
        return np.zeros(0, np.uint64)
    # the all-ones code doubles as the device padding sentinel: strip it,
    # resolve its membership on host exactly, re-append at the tail
    has_sent = [len(a) > 0 and a[-1] == SENT for a in arrs]
    arrs = [a[:-1] if h else a for a, h in zip(arrs, has_sent)]
    if op == "union":
        sent_in = any(has_sent)
    elif op == "inter":
        sent_in = all(has_sent)
    elif op == "common":
        sent_in = sum(has_sent) >= int(threshold)
    else:
        sent_in = has_sent[0] and not any(has_sent[1:])
    if op == "diff" and len(arrs) == 1:
        out = arrs[0]
        return (np.concatenate([out, np.array([SENT], np.uint64)])
                if sent_in else out)
    mesh = make_mesh(n_devices)
    d = mesh.shape[SHARD_AXIS]
    # common static capacity: the max per-shard load over all inputs
    log_d = int(np.ceil(np.log2(d))) if d > 1 else 0
    shift = max(code_bits - log_d, 0)
    cap = 8
    for a in arrs:
        if len(a) == 0:
            continue
        b = np.minimum(a >> np.uint64(shift), d - 1)
        cap = max(cap, int(np.bincount(b.astype(np.int64), minlength=d).max()))
    cap = _cap_quantum(cap, d)
    parts = [partition_host_set(a, d, cap, code_bits) for a in arrs]
    if op == "diff":
        rest = np.stack(parts[1:], axis=1)  # (D, F-1, C)
        u, un, _ = sharded_common(mesh, 1, code_bits)(rest)
        out, n, _ = sharded_set_op(mesh, "diff", code_bits)(
            parts[0], np.asarray(u))
        res = _collect_sharded(out, n)
    else:
        stacked = np.stack(parts, axis=1)  # (D, F, C)
        thr = (1 if op == "union"
               else len(arrs) if op == "inter"
               else int(threshold))
        out, n, _ = sharded_common(mesh, thr, code_bits)(stacked)
        res = _collect_sharded(out, n)
    if sent_in:
        res = np.concatenate([res, np.array([SENT], np.uint64)])
    return res


def _collect_sharded_taxids(out_c, out_t, counts):
    """(codes, compact ids) concatenated from per-shard prefixes."""
    out_c, out_t = np.asarray(out_c), np.asarray(out_t)
    counts = np.asarray(counts)
    if out_c.shape[0] == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    codes = np.concatenate(
        [out_c[i, : int(counts[i])] for i in range(out_c.shape[0])]
    )
    ids = np.concatenate(
        [out_t[i, : int(counts[i])] for i in range(out_c.shape[0])]
    ).astype(np.int64)
    return codes, ids


def mesh_count_taxids(packed, rec_taxids: np.ndarray, taxdb,
                      cfg: CountConfig, n_devices: int | None = None,
                      capacity: int | None = None):
    """Host driver for `count -T --mesh N`: packed records + per-record
    taxids -> LCA-merged sorted (codes, taxids) via the sharded
    packed-key build.  Returns None when the tiered vocabulary
    admission declines or the packed key cannot hold code + id + flag
    bits (k=32 non-canonical, hashed spaces) — callers fall back to the
    single-device/host -T engines."""
    from ..models.count import scaled_max_hash
    from ..taxonomy.lca import _id_bits, compact_ids, device_lca_plan
    from .mesh import make_mesh

    if not cfg.hashed:
        code_bits = 2 * cfg.k
    elif cfg.scale > 1:
        code_bits = int(scaled_max_hash(cfg.scale)).bit_length()
    else:
        code_bits = 64
    if cfg.needs_record_sep:
        # compat syncmer emission is record-scoped (fills depend on the
        # whole record), not halo-shardable
        return None
    plan = device_lca_plan(taxdb, rec_taxids)
    if plan is None:
        return None
    kind, closure, lca_tab = plan
    if code_bits + _id_bits(len(closure)) + 2 > 63:
        return None
    mesh = make_mesh(n_devices)
    d = mesh.shape[SHARD_AXIS]
    bases = np.asarray(packed.bases, np.uint8)
    windows = max(len(bases) - cfg.k + 1, 0)
    if windows == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    rec_ctax = compact_ids(closure, rec_taxids)
    spans = np.diff(np.append(packed.starts, len(bases)))
    pos_ctax = np.repeat(rec_ctax, spans).astype(np.int32)
    front, back = shard_halos(cfg)
    rows = pack_host_shards(bases, d, cfg.k, front, back)
    trows = pack_host_rows(pos_ctax, d, front, back, np.int32(0))
    if capacity is None:
        capacity = _default_capacity(windows, d)
    rounds = max((capacity * d).bit_length(), 1)
    from ..ops.device_sets import use_staged_taxid_programs

    staged = use_staged_taxid_programs()
    prev_rounds, prev_rounds_fn, prev_egress_fn = None, None, None
    while True:
        if staged:
            sort_fn, rounds_fn, egress_fn = build_sharded_taxids_staged(
                mesh, cfg, capacity, len(closure), code_bits, rounds, kind,
                stages23=(
                    prev_rounds_fn if prev_rounds == rounds else None,
                    prev_egress_fn,
                ))
            prev_rounds, prev_rounds_fn = rounds, rounds_fn
            prev_egress_fn = egress_fn
            skey, dropped = sort_fn(rows, trows)
            if int(np.asarray(dropped)[0]) == 0:
                ks_c, ks_t, ks_k = rounds_fn(skey, lca_tab)
                out_c, out_t, n, _ = egress_fn(ks_c, ks_t, ks_k)
                codes, ids = _collect_sharded_taxids(out_c, out_t, n)
                return codes, closure[ids].astype(np.uint32)
        else:
            step = build_sharded_taxids(mesh, cfg, capacity, len(closure),
                                        code_bits, rounds, kind)
            out_c, out_t, n, dropped = step(rows, trows, lca_tab)
            if int(np.asarray(dropped)[0]) == 0:
                codes, ids = _collect_sharded_taxids(out_c, out_t, n)
                return codes, closure[ids].astype(np.uint32)
        capacity *= 2
        rounds = max((capacity * d).bit_length(), 1)


def mesh_set_op_taxids(op: str, code_arrays: list, taxid_arrays: list,
                       taxdb, n_devices: int | None = None,
                       code_bits: int = 64,
                       threshold: int | None = None):
    """Host driver for `union/inter/diff/common --mesh N` over
    TAXID-carrying inputs: per-file LCA dedup on host, range partition
    with the compact-id column, then one threshold collapse per shard
    through the replicated vocabulary LCA structure (closure table or
    path matrix — taxonomy/lca.device_lca_plan).  diff keeps the first
    file's taxids (diff.go:379-454) via a sharded subtract against the
    union of the rest.  Returns (codes, taxids) or None when the tiered
    admission declines (unknown nonzero taxids fall back to the host
    engine, whose deterministic order owns their merge rule)."""
    from ..taxonomy.lca import (
        compact_ids, device_collapse_admissible, device_lca_plan,
    )
    from .mesh import make_mesh

    if op not in ("union", "inter", "diff", "common"):
        raise ValueError(f"unknown mesh taxid set op: {op}")
    all_tax = np.concatenate(
        [np.asarray(t, np.uint32) for t in taxid_arrays]
    ) if taxid_arrays else np.zeros(0, np.uint32)
    plan = device_lca_plan(taxdb, all_tax)
    if plan is None:
        return None
    kind, closure, lca_tab = plan
    if not device_collapse_admissible(code_bits, len(closure)):
        return None  # 2-operand fallback sort compile-starves on tpu
    from ..taxonomy.lca import collapse_sort_packable

    if not collapse_sort_packable(code_bits, len(closure)):
        # the MESH tier has no split3 staged per-shard route yet: on
        # tpu the monolithic per-shard unpackable graph is the
        # compile-starving shape, so decline to the single-device tier
        # (whose staged split3 route is chip-proven) — round-5 review
        try:
            if jax.default_backend() == "tpu":
                return None
        except Exception:
            pass
    # per-file LCA dedup: threshold counts are file-presence counts
    arrs = []
    for c, t in zip(code_arrays, taxid_arrays):
        uc, ut = taxdb.lca_reduce(
            np.asarray(c, np.uint64), np.asarray(t, np.uint32)
        )
        arrs.append((uc, ut))
    if not arrs:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    # the all-ones code doubles as the device padding sentinel: strip
    # it, resolve its membership AND merged taxid on host, re-append
    has_sent = [len(a) > 0 and a[-1] == SENT for a, _ in arrs]
    sent_tax = [t[-1] for (a, t), h in zip(arrs, has_sent) if h]
    arrs = [(a[:-1], t[:-1]) if h else (a, t)
            for (a, t), h in zip(arrs, has_sent)]
    nf = len(arrs)
    if op == "union":
        sent_in = any(has_sent)
    elif op == "inter":
        sent_in = all(has_sent)
    elif op == "common":
        sent_in = sum(has_sent) >= int(threshold)
    else:
        sent_in = has_sent[0] and not any(has_sent[1:])
    if sent_in:
        if op == "diff":
            sent_merged = np.uint32(sent_tax[0])
        else:
            sent_merged = np.uint32(0)
            for t in sent_tax:
                sent_merged = taxdb.lca_pairs(
                    np.array([sent_merged]), np.array([t])
                )[0]
    if op == "diff" and nf == 1:
        res_c, res_t = arrs[0]
        if sent_in:
            res_c = np.concatenate([res_c, np.array([SENT], np.uint64)])
            res_t = np.concatenate([res_t, np.array([sent_merged], np.uint32)])
        return res_c, res_t
    mesh = make_mesh(n_devices)
    d = mesh.shape[SHARD_AXIS]
    log_d = int(np.ceil(np.log2(d))) if d > 1 else 0
    shift = max(code_bits - log_d, 0)
    cap = 8
    for a, _ in arrs:
        if len(a) == 0:
            continue
        b = np.minimum(a >> np.uint64(shift), d - 1)
        cap = max(cap, int(np.bincount(b.astype(np.int64), minlength=d).max()))
    cap = _cap_quantum(cap, d)
    parts = [
        partition_host_set(a, d, cap, code_bits,
                           taxids=compact_ids(closure, t).astype(np.uint32))
        for a, t in arrs
    ]
    rounds = max(nf.bit_length(), 1)
    if op == "diff":
        rest = np.stack([p[0] for p in parts[1:]], axis=1)  # (D, F-1, C)
        u, un, _ = sharded_common(mesh, 1, code_bits)(rest)
        out_c, out_t, n, _ = sharded_diff_taxids(mesh)(
            parts[0][0], parts[0][1], np.asarray(u)
        )
        codes, ids = _collect_sharded_taxids(out_c, out_t, n)
    else:
        thr = (1 if op == "union"
               else nf if op == "inter"
               else int(threshold))
        sc = np.stack([p[0] for p in parts], axis=1)  # (D, F, C)
        st = np.stack([p[1] for p in parts], axis=1).astype(np.int32)
        from ..ops.device_sets import use_staged_taxid_programs
        from ..taxonomy.lca import _id_bits, collapse_sort_packable

        if use_staged_taxid_programs() and collapse_sort_packable(
            code_bits, len(closure)
        ):
            # per-shard staging (sort / rounds / compact as separate
            # programs): the monolithic per-shard graph compile-starves
            # real TPUs at scale, same as the single-device route
            sort_fn, rounds_fn, egress_fn = sharded_setop_taxids_staged(
                mesh, thr, rounds, kind, code_bits, _id_bits(len(closure))
            )
            skey = sort_fn(sc, st)
            ks_c, ks_t, ks_k = rounds_fn(skey, lca_tab)
            out_c, out_t, n, _ = egress_fn(ks_c, ks_t, ks_k)
        else:
            out_c, out_t, n, _ = sharded_setop_taxids(
                mesh, thr, rounds, kind, code_bits
            )(sc, st, lca_tab)
        codes, ids = _collect_sharded_taxids(out_c, out_t, n)
    taxids = closure[ids].astype(np.uint32)
    if sent_in:
        codes = np.concatenate([codes, np.array([SENT], np.uint64)])
        taxids = np.concatenate([taxids, np.array([sent_merged], np.uint32)])
    return codes, taxids
