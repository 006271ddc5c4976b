"""Pallas TPU kernel: VMEM-blocked bitonic sort over uint64 codes.

This is the production design from docs/design/pallas_sort.md — the
remaining single-chip lever for the sort-bound count pipeline (XLA's
u64 sort runs ~190M keys/s; the reference's analog is the parallel
radix sort behind `sortutil.Uint64s`, unikmer/cmd/sort.go:268-274).

Formulation (flip-merge bitonic, all compare-exchanges ascending):

  * Keys are (hi, lo) u32 pairs, sign-biased to int32 planes so every
    comparison is a plain signed vector compare (this Mosaic target has
    no unsigned vector compares); lexicographic (hi, lo) order equals
    u64 order.
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
jax.lax.sort at every block/array-size combination.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANES = 128
_BIAS = jnp.int32(-0x80000000)  # XOR with sign bit: unsigned order -> signed


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


def _bit_clear_mask(rows: int, j: int):
    """(rows, LANES) bool: True where (element_index & j) == 0."""
    if j < LANES:
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
        return (c & j) == 0
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    return (r & (j // LANES)) == 0


def _exchange(hi, lo, j: int, keep_min):
    """One compare-exchange stage at distance j on (ROWS, LANES) planes.
    ``keep_min`` is the per-element 'this position keeps the smaller of
    the pair' mask (already accounting for network direction)."""
    axis = 1 if j < LANES else 0
    s = j if j < LANES else j // LANES
    bc = _bit_clear_mask(hi.shape[0], j)
    # partner value: i+j where bit j clear (roll left), i-j where set
    phi = jnp.where(bc, _roll(hi, -s, axis), _roll(hi, s, axis))
    plo = jnp.where(bc, _roll(lo, -s, axis), _roll(lo, s, axis))
    p_lt = (phi < hi) | ((phi == hi) & (plo < lo))
    take_p = keep_min == p_lt
    return jnp.where(take_p, phi, hi), jnp.where(take_p, plo, lo)


def _asc_mask(rows: int, kk: int):
    """(rows, LANES) bool: ascending-direction mask (element & kk) == 0
    for the in-block full-sort network."""
    return _bit_clear_mask(rows, kk)


def _sort_block_kernel(rows: int, hi_in, lo_in, hi_out, lo_out):
    """Full ascending bitonic sort of one (rows, LANES) block."""
    hi, lo = hi_in[:], lo_in[:]
    n = rows * LANES
    kk = 2
    while kk <= n:
        asc = _asc_mask(rows, kk) if kk < n else jnp.ones((rows, LANES), bool)
        j = kk // 2
        while j >= 1:
            keep_min = asc == _bit_clear_mask(rows, j)
            hi, lo = _exchange(hi, lo, j, keep_min)
            j //= 2
        kk *= 2
    hi_out[:] = hi
    lo_out[:] = lo


def _merge_block_kernel(rows: int, hi_in, lo_in, hi_out, lo_out):
    """Ascending bitonic merge (stages j = n/2 .. 1) of one block whose
    contents are already bitonic."""
    hi, lo = hi_in[:], lo_in[:]
    j = rows * LANES // 2
    while j >= 1:
        hi, lo = _exchange(hi, lo, j, _bit_clear_mask(rows, j))
        j //= 2
    hi_out[:] = hi
    lo_out[:] = lo


def _block_call(kernel, rows: int, interpret: bool):
    return pl.pallas_call(
        partial(kernel, rows),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
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


def _cross_block_stage(hi, lo, jb: int):
    """Exchange stage at block distance jb (element distance jb*B),
    ascending keep-min order, as XLA elementwise ops on block pairs."""
    nb, r, c = hi.shape
    vhi = hi.reshape(nb // (2 * jb), 2, jb, r, c)
    vlo = lo.reshape(nb // (2 * jb), 2, jb, r, c)
    ahi, bhi = vhi[:, 0], vhi[:, 1]
    alo, blo = vlo[:, 0], vlo[:, 1]
    b_lt = (bhi < ahi) | ((bhi == ahi) & (blo < alo))
    nahi = jnp.where(b_lt, bhi, ahi)
    nalo = jnp.where(b_lt, blo, alo)
    nbhi = jnp.where(b_lt, ahi, bhi)
    nblo = jnp.where(b_lt, alo, blo)
    hi = jnp.stack([nahi, nbhi], axis=1).reshape(nb, r, c)
    lo = jnp.stack([nalo, nblo], axis=1).reshape(nb, r, c)
    return hi, lo


@partial(jax.jit, static_argnames=("block_elems", "interpret"))
def sort_codes_pallas(
    codes: jnp.ndarray, block_elems: int = 1 << 18, interpret: bool = False
) -> jnp.ndarray:
    """Ascending sort of a uint64 code array (drop-in for
    jax.lax.sort(codes) in the count pipeline, which pre-pads to a
    power of two; other lengths are sentinel-padded here)."""
    n = int(codes.shape[0])
    if n <= 1:
        return codes
    nn = 1 << max((n - 1).bit_length(), 10)  # >= 8 rows of 128
    b = min(block_elems, nn)
    if b & (b - 1) or b < 8 * LANES:
        raise ValueError("block_elems must be a power of two >= 1024")
    if nn != n:
        pad = jnp.full((nn - n,), jnp.uint64(0xFFFFFFFFFFFFFFFF), jnp.uint64)
        codes = jnp.concatenate([codes, pad])
    hi = (codes >> jnp.uint64(32)).astype(jnp.uint32)
    lo = (codes & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    # sign-bias to int32 so all vector compares are signed
    hi = jax.lax.bitcast_convert_type(hi, jnp.int32) ^ _BIAS
    lo = jax.lax.bitcast_convert_type(lo, jnp.int32) ^ _BIAS
    rows = b // LANES
    nb = nn // b
    hi = hi.reshape(nb, rows, LANES)
    lo = lo.reshape(nb, rows, LANES)

    sort_call = _block_call(_sort_block_kernel, rows, interpret)
    hi, lo = jax.lax.map(lambda t: sort_call(t[0], t[1]), (hi, lo))

    merge_call = _block_call(_merge_block_kernel, rows, interpret)
    m = 1
    while (1 << m) <= nb:
        hi = _rev_second_halves(hi, m)
        lo = _rev_second_halves(lo, m)
        jb = 1 << (m - 1)
        while jb >= 1:
            hi, lo = _cross_block_stage(hi, lo, jb)
            jb //= 2
        hi, lo = jax.lax.map(lambda t: merge_call(t[0], t[1]), (hi, lo))
        m += 1

    hi = jax.lax.bitcast_convert_type((hi ^ _BIAS).reshape(-1), jnp.uint32)
    lo = jax.lax.bitcast_convert_type((lo ^ _BIAS).reshape(-1), jnp.uint32)
    out = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    return out[:n]
