"""Pallas TPU kernel: VMEM-blocked bitonic sort over uint64 codes.

This is the production design from docs/design/pallas_sort.md — the
remaining single-chip lever for the sort-bound count pipeline (XLA's
u64 sort runs ~190M keys/s; the reference's analog is the parallel
radix sort behind `sortutil.Uint64s`, unikmer/cmd/sort.go:268-274).

Formulation (flip-merge bitonic, all compare-exchanges ascending):

  * Keys are (hi, lo) u32 pairs, sign-biased to int32 planes so every
    comparison is a plain signed vector compare (this Mosaic target has
    no unsigned vector compares); lexicographic (hi, lo) order equals
    u64 order.  An optional value plane (uint32 taxids) rides along
    through the same selects (key+value sort for the taxid pipelines).
  * The array is split into VMEM blocks of B = ROWS*128 elements laid
    out row-major as (ROWS, 128): element i = (i // 128, i % 128), so a
    compare-exchange at distance j < 128 is a lane-axis roll and at
    j >= 128 a sublane-axis roll — both lower to static concatenated
    slices (no gathers, no in-kernel reshapes/transposes: both are
    measured Mosaic killers here).
  * Phase 1 sorts each block ascending with the full static bitonic
    network (log2(B)*(log2(B)+1)/2 stages, unrolled — everything is
    VPU elementwise).
  * Each cross-block round kk first REVERSES the second half of every
    kk-region (two asc halves -> one bitonic region; the classic
    alternative of sorting odd blocks descending needs per-block
    direction scalars in the kernel).  The reversal, and every
    exchange stage at distance >= B, are done OUTSIDE Pallas as pure
    XLA reshape+elementwise min/max over the (nblocks, ROWS, 128)
    planes — free layout views plus bandwidth-bound passes the
    compiler fuses.  The < B tail of the round (one ascending bitonic
    merge per block) is one grid-free Pallas call per block.
  * Grid-free whole-VMEM calls sequenced with lax.map, matching
    ops/pallas_encode.py (this axon AOT Mosaic build cannot legalize
    gridded pallas_call).

Cost model and on-chip measurements live in docs/design/pallas_sort.md;
interpret-mode tests (tests/test_pallas.py) pin bit-exactness against
jax.lax.sort at every block/array-size combination.  On-chip status:
the 1024-element block compiled and ran EXACTLY on the v5e; the
2^18-element block (171 unrolled stages at 2048x128) exceeded the AOT
compiler's 900 s budget — block size is a compile-time/HBM-pass
trade-off probed by scripts/exp_pallas_sort_chip.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128
# XOR with sign bit: unsigned order -> signed.  numpy scalar on purpose:
# a jnp constant here would touch the backend at import time, which must
# stay legal on hosts where the device is unavailable.
_BIAS = np.int32(-0x80000000)


def _roll(x, shift: int, axis: int):
    """Cyclic roll by a STATIC shift via two slices + concatenate (the
    only data-movement primitives known-safe in this Mosaic build)."""
    if shift == 0:
        return x
    n = x.shape[axis]
    shift %= n
    if axis == 0:
        return jnp.concatenate([x[n - shift :, :], x[: n - shift, :]], axis=0)
    return jnp.concatenate([x[:, n - shift :], x[:, : n - shift]], axis=1)


def _axis_shift(rows: int, j: int, layout: str):
    """VMEM (axis, shift) realizing an element-distance-j exchange.

    layout 'lane': element i at (i // 128, i % 128) — consecutive
    elements across lanes; distances < 128 are lane rolls.
    layout 'sub': element i at (i % rows, i // rows) — consecutive
    elements down sublanes; distances < rows are SUBLANE rolls (the
    cheap axis on the VPU), leaving only log2(LANES) lane-roll stages
    per merge ladder.
    """
    if layout == "sub":
        return (0, j) if j < rows else (1, j // rows)
    return (1, j) if j < LANES else (0, j // LANES)


def _bit_clear_mask(rows: int, j: int, layout: str):
    """(rows, LANES) bool: True where (element_index & j) == 0."""
    if layout == "sub":
        if j < rows:
            r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
            return (r & j) == 0
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        return (c & (j // rows)) == 0
    if j < LANES:
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        return (c & j) == 0
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    return (r & (j // LANES)) == 0


def _exchange(planes, j: int, keep_min, layout: str):
    """One compare-exchange stage at distance j.  ``planes`` is a tuple
    of (rows, LANES) arrays: planes[0:2] are the (hi, lo) key planes,
    the rest are value planes moved by the same selects.  ``keep_min``
    is the per-element 'this position keeps the smaller of the pair'
    mask (already accounting for network direction)."""
    rows = planes[0].shape[0]
    axis, s = _axis_shift(rows, j, layout)
    bc = _bit_clear_mask(rows, j, layout)
    # partner value: i+j where bit j clear (roll left), i-j where set
    partners = tuple(
        jnp.where(bc, _roll(x, -s, axis), _roll(x, s, axis)) for x in planes
    )
    # strict lexicographic compare over ALL planes (values included):
    # with key-only ties both sides of a pair would otherwise take the
    # same element and drop the other's value — the tie-broken total
    # order keeps the two decisions complementary.
    p_lt = jnp.zeros_like(keep_min)
    for x, p in zip(reversed(planes), reversed(partners)):
        p_lt = (p < x) | ((p == x) & p_lt)
    take_p = keep_min == p_lt
    return tuple(jnp.where(take_p, p, x) for p, x in zip(partners, planes))


def _elem_index(rows: int, layout: str):
    """(rows, LANES) int32 global element index of each VMEM slot."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    return c * rows + r if layout == "sub" else r * LANES + c


def _partner_switch(planes, logj, rows: int, layout: str):
    """Partners at distance 2^logj for every plane, with TRACED logj:
    a lax.switch over the log2(n) static-shift branches.  Program size
    is O(log n) instead of O(log^2 n) for the fully unrolled network —
    the fix for the AOT Mosaic compile-time cliff (the 171-stage 2^18
    unrolled block never compiled within 900 s; this form keeps the
    kernel body constant-size per branch)."""
    branches = []
    for lj in range((rows * LANES).bit_length() - 1):
        j = 1 << lj
        axis, s = _axis_shift(rows, j, layout)

        def mk(j=j, axis=axis, s=s):
            def br(pl_):
                bc = _bit_clear_mask(rows, j, layout)
                return tuple(
                    jnp.where(bc, _roll(x, -s, axis), _roll(x, s, axis))
                    for x in pl_
                )

            return br

        branches.append(mk())
    return jax.lax.switch(logj, branches, planes)


def _exchange_traced(planes, logj, idx, asc, rows: int, layout: str):
    """One compare-exchange stage at traced distance j = 2^logj."""
    j = jnp.int32(1) << logj
    bc = (idx & j) == 0
    keep_min = asc == bc
    partners = _partner_switch(planes, logj, rows, layout)
    p_lt = jnp.zeros_like(keep_min)
    for x, p in zip(reversed(planes), reversed(partners)):
        p_lt = (p < x) | ((p == x) & p_lt)
    take_p = keep_min == p_lt
    return tuple(jnp.where(take_p, p, x) for p, x in zip(partners, planes))


def _sort_block_kernel_looped(rows: int, nplanes: int, layout: str, *refs):
    """Full ascending bitonic sort of one (rows, LANES) block with the
    whole stage network as ONE fori_loop of static trip count
    log2(n)*(log2(n)+1)/2 (constant compile-time in block size).

    The (round r, distance 2^logj) schedule is carried as two scalar
    counters updated in the loop body — no nested loops with traced
    bounds and no schedule tables, both of which are extra Mosaic
    legalization risk on this AOT backend."""
    planes = tuple(r[:] for r in refs[:nplanes])
    outs = refs[nplanes:]
    n = rows * LANES
    logn = n.bit_length() - 1
    nstages = logn * (logn + 1) // 2
    idx = _elem_index(rows, layout)

    def body(_, carry):
        planes, r_, logj = carry
        kk = jnp.int32(1) << r_
        # (idx & n) == 0 is all-True for idx < n, so the final round's
        # all-ascending direction falls out of the same expression
        asc = (idx & kk) == 0
        planes = _exchange_traced(planes, logj, idx, asc, rows, layout)
        logj = logj - 1
        wrap = logj < 0
        r_ = r_ + wrap.astype(jnp.int32)
        logj = jnp.where(wrap, r_ - 1, logj)
        return planes, r_, logj

    planes, _, _ = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(nstages), body,
        (planes, jnp.int32(1), jnp.int32(0))
    )
    for o, x in zip(outs, planes):
        o[:] = x


def _merge_block_kernel_looped(rows: int, nplanes: int, layout: str, *refs):
    """Ascending bitonic merge of one already-bitonic block, looped."""
    planes = tuple(r[:] for r in refs[:nplanes])
    outs = refs[nplanes:]
    logn = (rows * LANES).bit_length() - 1
    idx = _elem_index(rows, layout)
    asc = jnp.ones((rows, LANES), bool)

    def stage_body(t, planes):
        return _exchange_traced(planes, jnp.int32(logn - 1) - t, idx, asc,
                                rows, layout)

    # int32 bounds: with x64 enabled a Python-int fori_loop index is
    # int64, and the i64->i32 convert that lax.switch then needs sends
    # this jax version's Mosaic _convert_helper into infinite mutual
    # recursion (RecursionError at AOT lowering; chip-diagnosed
    # 2026-08-18).  Keep every in-kernel scalar int32.
    planes = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(logn), stage_body, planes
    )
    for o, x in zip(outs, planes):
        o[:] = x


def _sort_block_kernel(rows: int, nplanes: int, layout: str, *refs):
    """Full ascending bitonic sort of one (rows, LANES) block."""
    planes = tuple(r[:] for r in refs[:nplanes])
    outs = refs[nplanes:]
    n = rows * LANES
    kk = 2
    while kk <= n:
        asc = _bit_clear_mask(rows, kk, layout) if kk < n else jnp.ones(
            (rows, LANES), bool
        )
        j = kk // 2
        while j >= 1:
            keep_min = asc == _bit_clear_mask(rows, j, layout)
            planes = _exchange(planes, j, keep_min, layout)
            j //= 2
        kk *= 2
    for o, x in zip(outs, planes):
        o[:] = x


def _merge_block_kernel(rows: int, nplanes: int, layout: str, *refs):
    """Ascending bitonic merge (stages j = n/2 .. 1) of one block whose
    contents are already bitonic."""
    planes = tuple(r[:] for r in refs[:nplanes])
    outs = refs[nplanes:]
    j = rows * LANES // 2
    while j >= 1:
        planes = _exchange(planes, j, _bit_clear_mask(rows, j, layout),
                           layout)
        j //= 2
    for o, x in zip(outs, planes):
        o[:] = x


def _block_call(kernel, rows: int, nplanes: int, interpret: bool,
                layout: str):
    return pl.pallas_call(
        partial(kernel, rows, nplanes, layout),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
            for _ in range(nplanes)
        ),
        interpret=interpret,
    )


def _rev_second_halves(x, m: int):
    """Reverse the second half of every 2^m-block region: (nb, R, C) ->
    view (nb/2^m, 2, 2^(m-1), R, C), flip the second half's block order
    AND each of its blocks' element order.  Pure XLA layout ops."""
    nb, r, c = x.shape
    half = 1 << (m - 1)
    v = x.reshape(nb // (2 * half), 2, half, r, c)
    second = jax.lax.rev(v[:, 1], (1, 2, 3))
    return jnp.stack([v[:, 0], second], axis=1).reshape(nb, r, c)


def _cross_block_stage(planes, jb: int):
    """Exchange stage at block distance jb (element distance jb*B),
    ascending keep-min order, as XLA elementwise ops on block pairs."""
    nb, r, c = planes[0].shape
    views = [x.reshape(nb // (2 * jb), 2, jb, r, c) for x in planes]
    a_side = [v[:, 0] for v in views]
    b_side = [v[:, 1] for v in views]
    b_lt = (b_side[0] < a_side[0]) | (
        (b_side[0] == a_side[0]) & (b_side[1] < a_side[1])
    )
    out = []
    for a, b in zip(a_side, b_side):
        na = jnp.where(b_lt, b, a)
        nb_ = jnp.where(b_lt, a, b)
        out.append(jnp.stack([na, nb_], axis=1).reshape(nb, r, c))
    return tuple(out)


def _bitonic_sort_planes(planes, nn: int, b: int, interpret: bool,
                         looped: bool = False, layout: str = "lane"):
    """Run the full blocked network over same-shape int32 planes (first
    two = key planes).  Returns planes flattened back to 1D.

    layout 'sub' stores element i of each block at VMEM slot
    (i % rows, i // rows): one transpose pass on entry/exit trades for
    all-but-log2(128) exchange stages becoming sublane rolls.  The
    cross-block machinery is layout-blind — it pairs identical VMEM
    slots of different blocks, and the region reversal (rev over both
    in-block axes) maps element e -> B-1-e in either layout.
    """
    rows = b // LANES
    nb = nn // b
    nplanes = len(planes)
    if layout == "sub":
        planes = tuple(
            x.reshape(nb, LANES, rows).transpose(0, 2, 1) for x in planes
        )
    else:
        planes = tuple(x.reshape(nb, rows, LANES) for x in planes)

    sort_k = _sort_block_kernel_looped if looped else _sort_block_kernel
    merge_k = _merge_block_kernel_looped if looped else _merge_block_kernel
    sort_call = _block_call(sort_k, rows, nplanes, interpret, layout)
    planes = jax.lax.map(lambda t: sort_call(*t), planes)

    merge_call = _block_call(merge_k, rows, nplanes, interpret, layout)
    m = 1
    while (1 << m) <= nb:
        planes = tuple(_rev_second_halves(x, m) for x in planes)
        jb = 1 << (m - 1)
        while jb >= 1:
            planes = _cross_block_stage(planes, jb)
            jb //= 2
        planes = jax.lax.map(lambda t: merge_call(*t), planes)
        m += 1
    if layout == "sub":
        planes = tuple(x.transpose(0, 2, 1) for x in planes)
    return tuple(x.reshape(-1) for x in planes)


def _key_planes(codes):
    hi = (codes >> jnp.uint64(32)).astype(jnp.uint32)
    lo = (codes & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    # sign-bias to int32 so all vector compares are signed
    return (
        jax.lax.bitcast_convert_type(hi, jnp.int32) ^ _BIAS,
        jax.lax.bitcast_convert_type(lo, jnp.int32) ^ _BIAS,
    )


def _codes_from_planes(hi, lo):
    hi = jax.lax.bitcast_convert_type(hi ^ _BIAS, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(lo ^ _BIAS, jnp.uint32)
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def _padded_size(n: int, block_elems: int):
    nn = 1 << max((n - 1).bit_length(), 10)  # >= 8 rows of 128
    b = min(block_elems, nn)
    if b & (b - 1) or b < 8 * LANES:
        raise ValueError("block_elems must be a power of two >= 1024")
    return nn, b


@partial(jax.jit, static_argnames=("block_elems", "interpret", "looped",
                                   "layout"))
def sort_codes_pallas(
    codes: jnp.ndarray, block_elems: int = 1 << 18, interpret: bool = False,
    looped: bool = False, layout: str = "lane",
) -> jnp.ndarray:
    """Ascending sort of a uint64 code array (drop-in for
    jax.lax.sort(codes) in the count pipeline, which pre-pads to a
    power of two; other lengths are sentinel-padded here)."""
    n = int(codes.shape[0])
    if n <= 1:
        return codes
    nn, b = _padded_size(n, block_elems)
    if nn != n:
        pad = jnp.full((nn - n,), jnp.uint64(0xFFFFFFFFFFFFFFFF), jnp.uint64)
        codes = jnp.concatenate([codes, pad])
    planes = _bitonic_sort_planes(_key_planes(codes), nn, b, interpret,
                                  looped, layout)
    return _codes_from_planes(planes[0], planes[1])[:n]


@partial(jax.jit, static_argnames=("block_elems", "interpret", "looped",
                                   "layout"))
def sort_codes_taxids_pallas(
    codes: jnp.ndarray,
    taxids: jnp.ndarray,
    block_elems: int = 1 << 18,
    interpret: bool = False,
    looped: bool = False,
    layout: str = "lane",
):
    """Key+value sort: (sorted codes, co-sorted uint32 taxids) — the
    pallas twin of ops.sort.sort_codes_taxids.  NOT stable in ties
    (bitonic networks aren't); the taxid pipelines LCA-reduce equal-code
    runs afterwards, so tie order never matters there."""
    n = int(codes.shape[0])
    if n <= 1:
        return codes, taxids
    nn, b = _padded_size(n, block_elems)
    if nn != n:
        pad = jnp.full((nn - n,), jnp.uint64(0xFFFFFFFFFFFFFFFF), jnp.uint64)
        codes = jnp.concatenate([codes, pad])
        taxids = jnp.concatenate(
            [taxids, jnp.zeros((nn - n,), taxids.dtype)]
        )
    v = jax.lax.bitcast_convert_type(taxids.astype(jnp.uint32), jnp.int32)
    planes = _bitonic_sort_planes(
        _key_planes(codes) + (v,), nn, b, interpret, looped, layout
    )
    out_tax = jax.lax.bitcast_convert_type(planes[2], jnp.uint32)
    return _codes_from_planes(planes[0], planes[1])[:n], out_tax[:n]
