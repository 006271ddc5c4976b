"""Pallas TPU kernel: fused 2-bit encode + canonical over all windows.

The jnp path (ops/codec.py) computes k-mer codes as uint64, which XLA
emulates as u32 pairs on TPU with one materialized pass per doubling
step.  This kernel keeps the (hi, lo) uint32 pair representation
explicit in VMEM and fuses base-LUT, doubling composition, validity
AND-reduction, reverse-complement and canonical-min into one VMEM-
resident pass per tile.

Layout: the caller reshapes the flat base array into rows of LANES
consecutive bases plus a HALO-base tail from the next row (so every
window shift is a static slice along the lane axis — no cross-row
carries, no gathers).  Outputs are (hi, lo, valid) u32/u32/i32 row
blocks that the wrapper flattens back.

Status / measurements (v5e, 8M bases, k=23 canonical): this kernel is
validated bit-exact against the jnp path both in interpret mode and
compiled on hardware, but the jnp/XLA path stays the default in
models/count.py: the op is HBM-bandwidth-bound and XLA's automatic
elementwise fusion already runs it at 41 ms vs 112 ms here.  Two
environment constraints shape the kernel: this axon AOT Mosaic build
cannot legalize *gridded* pallas_call (any grid=() fails on
'func.return'), so blocks are sequenced by lax.map over grid-free
whole-VMEM calls; and u8 vector compares / i1 vector concats are
unsupported, so bases widen to i32 on load.  The win Pallas could
still deliver on this pipeline is a VMEM-blocked radix/bitonic sort
(the count pipeline is sort-bound at ~190M u64/s via XLA's sort) —
future work.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import codec

LANES = 512  # bases per row (windows owned by the row)
HALO = 128  # halo bases from the next row (>= k-1 for k <= 64... k <= 32 here)
ROWS_BLK = 256  # rows per call


def _pair_shl(hi, lo, s: int):
    """(hi, lo) << s for static s in [0, 64)."""
    if s == 0:
        return hi, lo
    if s >= 32:
        return lo << jnp.uint32(s - 32) if s > 32 else lo, jnp.zeros_like(lo)
    return (hi << jnp.uint32(s)) | (lo >> jnp.uint32(32 - s)), lo << jnp.uint32(s)


def _pair_shr(hi, lo, s: int):
    """(hi, lo) >> s for static s in [0, 64)."""
    if s == 0:
        return hi, lo
    if s >= 32:
        return jnp.zeros_like(hi), hi >> jnp.uint32(s - 32) if s > 32 else hi
    return hi >> jnp.uint32(s), (lo >> jnp.uint32(s)) | (hi << jnp.uint32(32 - s))


_M2 = np.uint32(0x33333333)
_M4 = np.uint32(0x0F0F0F0F)
_M8 = np.uint32(0x00FF00FF)
_M16 = np.uint32(0x0000FFFF)


def _rev2_u32(x):
    """Reverse the order of 2-bit groups within a u32."""
    x = ((x >> jnp.uint32(2)) & _M2) | ((x & _M2) << jnp.uint32(2))
    x = ((x >> jnp.uint32(4)) & _M4) | ((x & _M4) << jnp.uint32(4))
    x = ((x >> jnp.uint32(8)) & _M8) | ((x & _M8) << jnp.uint32(8))
    return (x >> jnp.uint32(16)) | (x << jnp.uint32(16))


def _encode_kernel(k: int, canonical: bool, bases_ref, hi_ref, lo_ref, valid_ref):
    b = bases_ref[:].astype(jnp.int32)  # (ROWS_BLK, LANES+HALO); u8 vector
    # compares are unsupported on this Mosaic target, so widen first
    x = (b & 3).astype(jnp.uint32)
    # validity as int32: Mosaic can't concatenate/shift i1 vectors
    good = (b < 4).astype(jnp.int32)

    def sl(a, off):
        return a[:, off : off + LANES]

    # doubling composition of (hi, lo) window codes and validity
    acc_hi = acc_lo = None
    acc_v = None
    acc_w = 0
    pow_hi = jnp.zeros_like(x)
    pow_lo = x
    pow_v = good
    pow_w = 1
    for bit in range(6):
        if (k >> bit) & 1:
            if acc_hi is None:
                acc_hi, acc_lo, acc_v, acc_w = pow_hi, pow_lo, pow_v, pow_w
            else:
                sh, sl_ = _pair_shl(pow_hi, pow_lo, 2 * acc_w)
                acc_hi = sh | _shift_cols(acc_hi, pow_w)
                acc_lo = sl_ | _shift_cols(acc_lo, pow_w)
                acc_v = pow_v & _shift_cols(acc_v, pow_w)
                acc_w += pow_w
        if (k >> (bit + 1)) != 0:
            sh, sl_ = _pair_shl(pow_hi, pow_lo, 2 * pow_w)
            pow_hi = sh | _shift_cols(pow_hi, pow_w)
            pow_lo = sl_ | _shift_cols(pow_lo, pow_w)
            pow_v = pow_v & _shift_cols(pow_v, pow_w)
            pow_w *= 2

    hi, lo, v = sl(acc_hi, 0), sl(acc_lo, 0), sl(acc_v, 0)

    if canonical:
        chi, clo = ~hi, ~lo
        rhi = _rev2_u32(clo)
        rlo = _rev2_u32(chi)
        rhi, rlo = _pair_shr(rhi, rlo, 64 - 2 * k)
        take_rc = (rhi < hi) | ((rhi == hi) & (rlo < lo))
        hi = jnp.where(take_rc, rhi, hi)
        lo = jnp.where(take_rc, rlo, lo)

    hi_ref[:] = hi
    lo_ref[:] = lo
    valid_ref[:] = v


def _shift_cols(a, s: int):
    """a shifted left by s columns (a[:, s:]) padded with zeros; operates
    on the full (ROWS_BLK, LANES+HALO) array so later slices stay valid."""
    if s == 0:
        return a
    pad = jnp.zeros((a.shape[0], s), dtype=a.dtype)
    return jnp.concatenate([a[:, s:], pad], axis=1)


@partial(jax.jit, static_argnames=("k", "canonical", "interpret"))
def encode_canonical_pallas(bases: jnp.ndarray, k: int, canonical: bool = True,
                            interpret: bool = False):
    """All-window 2-bit codes of a flat base array via the Pallas kernel.

    Returns (codes u64, valid bool) of the same length as ``bases``
    (matching codec.kmer_codes + window_valid + canonical_code).
    """
    if not 0 < k <= codec.MAX_K_ENCODED:
        raise ValueError(f"k must be in [1,{codec.MAX_K_ENCODED}]")
    n = bases.shape[0]
    rows = -(-n // LANES)
    blocks = -(-rows // ROWS_BLK)
    rows_padded = blocks * ROWS_BLK
    # build halo'd rows: row r covers bases [r*LANES, r*LANES+LANES+HALO)
    padded = jnp.full((rows_padded * LANES + HALO,), codec.INVALID_BASE,
                      dtype=jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, bases.astype(jnp.uint8), (0,))
    idx = (jnp.arange(rows_padded, dtype=jnp.int32)[:, None] * LANES
           + jnp.arange(LANES + HALO, dtype=jnp.int32)[None, :])
    rows_arr = padded[idx]

    kern = partial(_encode_kernel, k, canonical)
    call = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((ROWS_BLK, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((ROWS_BLK, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((ROWS_BLK, LANES), jnp.int32),
        ),
        interpret=interpret,
    )
    # NOTE: this environment's AOT Mosaic compiler cannot legalize GRIDDED
    # pallas_call (any grid fails on 'func.return'); each block is a
    # grid-free whole-VMEM call, sequenced by lax.map.
    blocked = rows_arr.reshape(blocks, ROWS_BLK, LANES + HALO)
    hi, lo, valid = jax.lax.map(call, blocked)
    hi = hi.reshape(rows_padded, LANES)
    lo = lo.reshape(rows_padded, LANES)
    valid = valid.reshape(rows_padded, LANES)

    codes = (hi.reshape(-1).astype(jnp.uint64) << jnp.uint64(32)) | lo.reshape(
        -1
    ).astype(jnp.uint64)
    v = valid.reshape(-1) != 0
    return codes[:n], v[:n]
