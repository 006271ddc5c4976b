"""Device sort / dedupe machinery over uint64 code arrays.

The reference accumulates k-mers in a Go hash map and (optionally) runs a
parallel radix sort (unikmer/cmd/count.go:227-264,580-584; SURVEY.md §3.1).
TPU-first replacement: one bulk XLA sort per collapse, with
dedupe/unique/repeated and dense-prefix compaction expressed as scans and
a single scatter — multi-operand sorts are avoided because each extra
sort operand multiplies TPU compile time.

Masking strategy: invalid slots are keyed to CODE_SENTINEL (2^64-1) so a
single-operand sort pushes them to the tail.  A *real* hash equal to the
sentinel is accounted for exactly by counting sentinel-valued valid slots
before the sort (they are indistinguishable after it).

All functions are jit-friendly (static shapes; masks + counts instead of
dynamic sizes).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .codec import CODE_SENTINEL


def _sort_u64_split(codes: jnp.ndarray, width: int) -> jnp.ndarray:
    """Sort u64 values as a 2-key (hi, lo) variadic sort and recombine.

    XLA's TPU sort is HBM-bandwidth-bound (docs/BENCH_NOTES.md round-2
    investigation: ~870 GB/s effective), so narrower sort operands are
    directly faster: (u32, u32) moves the same 8 B/elem but the 2-key
    comparator is cheaper in practice (+5% measured at 2^25); (u16, u32)
    moves 6 B/elem.  width=32 is exact for ALL u64 inputs.  width=16
    truncates hi to 16 bits, so it is exact only when every input is
    either < 2^47 (hi <= 0x7FFF) or the all-ones CODE_SENTINEL (hi
    truncates to 0xFFFF, still the maximum, restored on recombine) —
    callers gate it on code_bits < 48 (2-bit codec, k <= 23)."""
    shift = jnp.uint64(32)
    hi = (codes >> shift).astype(jnp.uint16 if width == 16 else jnp.uint32)
    lo = codes.astype(jnp.uint32)
    h, l = jax.lax.sort((hi, lo), num_keys=2, is_stable=_sort_stable())
    out = (h.astype(jnp.uint64) << shift) | l.astype(jnp.uint64)
    if width == 16:
        sent_img = (jnp.uint64(0xFFFF) << shift) | jnp.uint64(0xFFFFFFFF)
        out = jnp.where(out == sent_img, jnp.uint64(CODE_SENTINEL), out)
    return out



def _sort_stable() -> bool:
    """Stability flag for every pipeline sort (trace-time).  DEFAULT
    UNSTABLE: the round-5 chip micro measured XLA's stable TPU sort
    ~28% slower at 2^25 (split16 137 -> 97.8 ms, u64 150 -> 109 ms;
    scripts/exp_round5_sortstable.py) and no pipeline sort needs
    stability — single/duplex-operand sorts order equal elements
    interchangeably, payload sorts either use unique keys
    (compact_aux) or feed order-independent reductions (LCA merge,
    run accounting; the pallas twin was always tie-unstable).
    UNIKMER_TPU_SORT_STABLE=1 restores stable sorts."""
    return os.environ.get("UNIKMER_TPU_SORT_STABLE", "0") == "1"


def sort_code_bits(k: int, hashed: bool) -> int:
    """Normalized static sort hint for a (k, hashed) config: 2k when
    that enables the narrow u16 split (2k < 48), else 64.  Callers pass
    this (not the raw bit width) as the jit-static ``code_bits`` so
    every config that compiles to the same sort shares one cache entry
    (e.g. non-hashed k=24..32 all resolve to 64/width-32)."""
    bits = 64 if hashed else 2 * k
    return bits if 0 < bits < 48 else 64


def _split_width(code_bits: int, split) -> int:
    """Resolve the split-sort decision: 0 = plain u64 lax.sort, 16/32 =
    variadic split width.  ``split=None`` reads UNIKMER_TPU_SORT_SPLIT
    at trace time: '0' off, '16'/'32' forced (16 demotes to 32 when
    code_bits don't guarantee the u16 domain), 'auto'/unset = split on
    TPU only (CPU's variadic sort is slower)."""
    if split is None:
        env = os.environ.get("UNIKMER_TPU_SORT_SPLIT", "auto")
        if env == "0":
            return 0
        if env in ("16", "32"):
            split = int(env)
        else:
            try:
                on_tpu = jax.default_backend() == "tpu"
            except RuntimeError:  # backend init failure (e.g. no tunnel):
                on_tpu = False    # tracing must still work; sort stays plain
            if not on_tpu:
                return 0
            split = 16
    if split == 16 and not (0 < code_bits < 48):
        split = 32
    return int(split)


def _sort_u64(codes: jnp.ndarray, code_bits: int = 64,
              split=None) -> jnp.ndarray:
    """The device u64 sort primitive.  UNIKMER_TPU_PALLAS_SORT=1 routes
    through the VMEM-blocked bitonic kernel (ops/pallas_sort.py) instead
    of XLA's sort; read at trace time, so set it before first compile.

    Pallas stays OFF by default after the round-2 on-chip race: the best
    kernel (unrolled 2^16 block, sublane-major layout) reaches 48.3 ms
    vs lax.sort's 50.3 ms at 2^23 but LOSES at the 2^25 bench bucket
    (196.8 vs 150.1 ms — cross-block rounds grow) — bitonic comparator
    work is invariant to blocking and XLA's sort already runs its
    network at ~HBM bandwidth.  Full numbers: docs/BENCH_NOTES.md
    round-2 sort investigation.

    The default TPU path is the split 2-key sort (see _sort_u64_split);
    ``code_bits`` (static) tells it when the narrow u16 hi key is safe."""
    if os.environ.get("UNIKMER_TPU_PALLAS_SORT") == "1" and codes.ndim == 1:
        from .pallas_sort import sort_codes_pallas

        blk = int(os.environ.get("UNIKMER_TPU_PALLAS_SORT_BLOCK", 1 << 16))
        lp = os.environ.get("UNIKMER_TPU_PALLAS_SORT_LOOPED") == "1"
        layout = os.environ.get("UNIKMER_TPU_PALLAS_SORT_LAYOUT", "sub")
        # CPU has no Mosaic: interpret mode keeps the routing testable
        interp = jax.default_backend() == "cpu"
        return sort_codes_pallas(codes, block_elems=blk, looped=lp,
                                 layout=layout, interpret=interp)
    width = _split_width(code_bits, split) if codes.ndim == 1 else 0
    if width:
        return _sort_u64_split(codes, width)
    return jax.lax.sort(codes, is_stable=_sort_stable())


def sort_codes(codes: jnp.ndarray) -> jnp.ndarray:
    """Plain ascending sort of uint64 codes."""
    return _sort_u64(codes)


def _run_bounds(s_codes: jnp.ndarray):
    """For a sorted array: (first_mask, run_start_idx, run_end_idx) where
    runs are maximal blocks of equal values; end is exclusive.  Uses
    cumulative scans only (no scatter, no dynamic shapes)."""
    n = s_codes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    first = jnp.concatenate([jnp.ones((1,), bool), s_codes[1:] != s_codes[:-1]])
    last = jnp.concatenate([s_codes[1:] != s_codes[:-1], jnp.ones((1,), bool)])
    # lax.cummax/cummin are single HLO ops; jax.lax.associative_scan
    # hand-builds ~log2(n) unrolled big-tensor slice/concat stages,
    # which starve this backend's remote AOT compiler (BENCH_NOTES
    # round-4 session A: the scan-free sort stage compiled in <2 min
    # while the scan-bearing collapse stage starved >42 min)
    start_idx = jax.lax.cummax(jnp.where(first, idx, 0))
    end_rev = jax.lax.cummin(jnp.where(last, idx + 1, n), reverse=True)
    return first, start_idx, end_rev


def use_sort_compact() -> bool:
    """Compaction form (trace-time, like the _sort_u64 knobs): the
    cumsum+scatter compaction costs ~4.5 s PER CALL at 2^25 on the
    tunnel TPU backend (round-5 micro4, scripts/exp_round5_micro4.py —
    the single largest hidden cost in every code-emitting device
    program; the 156 ms headline bench had it DCE'd because it fetches
    only the count).  A sort-based compaction is ~150 ms there.  On CPU
    the scatter is faster than a second sort, so it stays.
    UNIKMER_TPU_SORT_COMPACT=0/1 overrides."""
    import os

    env = os.environ.get("UNIKMER_TPU_SORT_COMPACT", "auto")
    if env in ("0", "1"):
        return env == "1"
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _compact(values: jnp.ndarray, keep: jnp.ndarray, fill):
    """Stable-compact kept values to a dense prefix via cumsum + scatter
    (CPU form; see use_sort_compact for why TPU avoids it)."""
    n = values.shape[0]
    pos = jnp.cumsum(keep.astype(jnp.int64)) - 1
    pos = jnp.where(keep, pos, n)  # dropped -> out-of-bounds (scatter drops)
    out = jnp.full((n,), fill, dtype=values.dtype)
    out = out.at[pos].set(values, mode="drop")
    return out


def compact_sorted(values: jnp.ndarray, keep: jnp.ndarray, fill,
                   code_bits: int = 64):
    """Stable-compact kept entries of an array whose KEPT values are
    ascending and <= the max-valued ``fill`` sentinel.

    On TPU this is one more sort of where(keep, values, fill) — kept
    values keep their relative (ascending) order, dropped slots collect
    as the fill tail, byte-identical to the scatter form (a kept REAL
    sentinel-valued code is indistinguishable from fill either way and
    the callers' sentinel accounting already owns that case)."""
    if not use_sort_compact():
        return _compact(values, keep, fill)
    return _sort_u64(jnp.where(keep, values, fill), code_bits=code_bits)


def compact_aux(keep: jnp.ndarray, aux: jnp.ndarray, fill):
    """Stable-compact an aux column (u32/i32 taxids) aligned to a keep
    mask: (u32 position key, aux) payload sort — small-dtype 2-operand
    sorts are compile-safe on this backend (CLAUDE.md), unlike the
    2^25-source scatter this replaces."""
    if not use_sort_compact():
        return _compact(aux, keep, fill)
    n = aux.shape[0]
    idx = jax.lax.iota(jnp.uint32, n)
    key = jnp.where(keep, idx, jnp.uint32(0xFFFFFFFF))
    skey, s_aux = jax.lax.sort((key, aux), num_keys=1,
                                is_stable=_sort_stable())
    return jnp.where(skey != jnp.uint32(0xFFFFFFFF), s_aux, fill)


@partial(jax.jit, static_argnames=("mode", "code_bits", "split"))
def collapse_sorted(codes: jnp.ndarray, valid: jnp.ndarray, mode: str = "distinct",
                    code_bits: int = 64, split=None):
    """Sort + collapse a masked code array.

    mode:
      'distinct'  keep one copy of every distinct code (count default)
      'unique'    keep codes that occur exactly once  (count -u)
      'repeated'  keep one copy of codes occurring >1 time (count -d)

    ``code_bits`` (static) bounds the real code values (2*k for the
    2-bit codec, 64 for hashed) so the sort can pick the narrow split
    width; ``split`` overrides the UNIKMER_TPU_SORT_SPLIT routing
    (experiments/tests only).

    Returns (compacted, n): ``compacted`` holds the kept codes in
    ascending order as a dense prefix of length ``n`` (tail is
    CODE_SENTINEL-filled).
    """
    sent = jnp.uint64(CODE_SENTINEL)
    keyed = jnp.where(valid, codes, sent)
    # sentinel-valued REAL codes merge into the invalid tail; count them
    n_sent_real = jnp.sum((codes == sent) & valid, dtype=jnp.int64)
    n_tail = jnp.sum(~valid, dtype=jnp.int64) + n_sent_real
    n_head = codes.shape[0] - n_tail  # non-sentinel real codes

    s = _sort_u64(keyed, code_bits=code_bits, split=split)
    idx = jnp.arange(codes.shape[0], dtype=jnp.int64)
    in_head = idx < n_head

    if mode == "distinct":
        # run-bound scans unneeded: only run starts matter
        first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
        keep = first & in_head
        extra = (n_sent_real > 0).astype(jnp.int64)
    elif mode in ("unique", "repeated"):
        first, start_idx, end_idx = _run_bounds(s)
        count = end_idx - start_idx
        if mode == "unique":
            keep = first & in_head & (count == 1)
            extra = (n_sent_real == 1).astype(jnp.int64)
        else:
            keep = first & in_head & (count > 1)
            extra = (n_sent_real > 1).astype(jnp.int64)
    else:
        raise ValueError(f"unknown mode: {mode}")

    n = jnp.sum(keep, dtype=jnp.int64)
    out = compact_sorted(s, keep, sent, code_bits=code_bits)
    # append the sentinel-valued real code if it survives the mode filter
    out = jnp.where((idx == n) & (extra > 0), sent, out)
    return out, n + extra


@partial(jax.jit, static_argnames=("code_bits", "split"))
def collapse_sorted_dual(codes: jnp.ndarray, valid: jnp.ndarray,
                         code_bits: int = 64, split=None):
    """ONE sort, BOTH collapses: (distinct, n_d, repeated, n_r).

    The -u/-d streaming paths need each piece's distinct set AND its
    within-piece repeated set (the capped-multiplicity merge,
    models/count._capped_cfgs); as two programs that is two sorts of
    the same data — and the sort is ~90% of a device piece.  Sharing
    the sorted array halves the dominant cost.  Sentinel accounting
    identical to collapse_sorted."""
    sent = jnp.uint64(CODE_SENTINEL)
    keyed = jnp.where(valid, codes, sent)
    n_sent_real = jnp.sum((codes == sent) & valid, dtype=jnp.int64)
    n_tail = jnp.sum(~valid, dtype=jnp.int64) + n_sent_real
    n_head = codes.shape[0] - n_tail

    s = _sort_u64(keyed, code_bits=code_bits, split=split)
    return collapse_dual_from_sorted(s, n_sent_real, n_head,
                                     code_bits=code_bits)


def collapse_dual_from_sorted(s: jnp.ndarray, n_sent_real, n_head,
                              code_bits: int = 64):
    """The post-sort half of :func:`collapse_sorted_dual`: sorted keyed
    array + the pre-sort sentinel accounting -> (distinct, n_d,
    repeated, n_r).  Split out so the staged dual programs can run the
    sort and the collapse as SEPARATE device programs (the fused B>=2
    dual graph SIGKILLs the remote compile helper; same staging fix as
    the taxid collapses, models/count._dual_sort_stage)."""
    sent = jnp.uint64(CODE_SENTINEL)
    idx = jnp.arange(s.shape[0], dtype=jnp.int64)
    in_head = idx < n_head
    first, start_idx, end_idx = _run_bounds(s)
    count = end_idx - start_idx

    keep_d = first & in_head
    extra_d = (n_sent_real > 0).astype(jnp.int64)
    n_d = jnp.sum(keep_d, dtype=jnp.int64)
    out_d = compact_sorted(s, keep_d, sent, code_bits=code_bits)
    out_d = jnp.where((idx == n_d) & (extra_d > 0), sent, out_d)

    keep_r = keep_d & (count > 1)
    extra_r = (n_sent_real > 1).astype(jnp.int64)
    n_r = jnp.sum(keep_r, dtype=jnp.int64)
    out_r = compact_sorted(s, keep_r, sent, code_bits=code_bits)
    out_r = jnp.where((idx == n_r) & (extra_r > 0), sent, out_r)
    return out_d, n_d + extra_d, out_r, n_r + extra_r


@jax.jit
def sort_codes_taxids(codes: jnp.ndarray, taxids: jnp.ndarray):
    """Co-sort (codes, taxids) by code.  One 2-operand sort; used by the
    taxid-carrying pipelines (LCA collapse happens on the result).
    UNIKMER_TPU_PALLAS_SORT=1 routes through the key+value bitonic
    kernel (tie order differs from lax.sort's, which is fine: every
    consumer LCA-reduces equal-code runs)."""
    if (
        os.environ.get("UNIKMER_TPU_PALLAS_SORT") == "1"
        and codes.ndim == 1
        and taxids.dtype == jnp.uint32
    ):
        from .pallas_sort import sort_codes_taxids_pallas

        blk = int(os.environ.get("UNIKMER_TPU_PALLAS_SORT_BLOCK", 1 << 16))
        lp = os.environ.get("UNIKMER_TPU_PALLAS_SORT_LOOPED") == "1"
        layout = os.environ.get("UNIKMER_TPU_PALLAS_SORT_LAYOUT", "sub")
        interp = jax.default_backend() == "cpu"
        return sort_codes_taxids_pallas(codes, taxids, block_elems=blk,
                                        looped=lp, layout=layout,
                                        interpret=interp)
    return jax.lax.sort((codes, taxids), num_keys=1,
                        is_stable=_sort_stable())
