"""K-mer sketches: minimizer and closed syncmer (vectorized).

Behavior contract (reference: shenwei356/bio sketches via call sites
unikmer/cmd/count.go:100-130,314-367 — SURVEY.md §2.2): sketches force
hashed (ntHash v1) + canonical.

  * Minimizer(k, w): for every window of w consecutive k-mers, select
    the minimum canonical hash (leftmost on ties); the linear stream
    emits one entry each time the selected POSITION changes (density
    ~2/(w+1), matching the reference's 860,900 entries for the
    A. muciniphila k=23 w=5 example).
  * Closed syncmer(k, s): a k-mer is selected iff the minimum s-mer
    hash within it sits at the first (0) or last (k-s) offset; the
    emitted value is the k-mer's canonical ntHash.

TPU-first design: sliding-window min/argmin are computed with the
doubling trick (log2(w) rounds of elementwise min over shifted arrays,
leftmost-preferring ties), entirely on the VPU — no per-window loops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import codec
from .nthash import nthash_windows


def _shift_up(x: jnp.ndarray, s: int, fill) -> jnp.ndarray:
    if s == 0:
        return x
    if s >= x.shape[0]:  # inputs shorter than the window width
        return jnp.full_like(x, fill)
    return jnp.concatenate([x[s:], jnp.full((s,), fill, dtype=x.dtype)])


_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _window_argmin(vals: jnp.ndarray, idx: jnp.ndarray, w: int):
    """(min value, leftmost argmin index) over windows [i, i+w)."""
    if w == 1:
        return vals, idx
    p = 1
    while p * 2 <= w:
        p *= 2
    # doubling to width p
    v, ix = vals, idx
    width = 1
    while width < p:
        v2 = _shift_up(v, width, _U64_MAX)
        ix2 = _shift_up(ix, width, 0)
        take_right = v2 < v  # strict: leftmost wins ties
        v = jnp.where(take_right, v2, v)
        ix = jnp.where(take_right, ix2, ix)
        width *= 2
    # combine two overlapping width-p windows to cover width w
    v2 = _shift_up(v, w - p, _U64_MAX)
    ix2 = _shift_up(ix, w - p, 0)
    take_right = v2 < v
    return jnp.where(take_right, v2, v), jnp.where(take_right, ix2, ix)


def _window_all(valid: jnp.ndarray, w: int) -> jnp.ndarray:
    """AND-reduce over windows [i, i+w) via doubling."""
    if w == 1:
        return valid
    p = 1
    v = valid
    width = 1
    while width * 2 <= w:
        v = v & _shift_up(v, width, False)
        width *= 2
    return v & _shift_up(v, w - width, False)


def minimizer_windows(bases: jnp.ndarray, k: int, w: int):
    """Per-position minimizer stream.

    Returns (codes, emit): slot i covers the k-mer window group starting
    at i; ``emit`` is True where the linear stream yields an entry (the
    selected minimizer position changed), and codes[i] is that
    minimizer's canonical hash.
    """
    kvalid = codec.window_valid(bases, k)
    hashes = nthash_windows(bases, k, canonical=True)
    keyed = jnp.where(kvalid, hashes, _U64_MAX)
    n = bases.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    wmin, wargmin = _window_argmin(keyed, idx, w)
    wvalid = _window_all(kvalid, w)
    # a new record/window-run begins where the previous slot was invalid
    prev_valid = jnp.concatenate([jnp.zeros((1,), bool), wvalid[:-1]])
    prev_arg = jnp.concatenate([jnp.zeros((1,), jnp.int64), wargmin[:-1]])
    emit = wvalid & (~prev_valid | (wargmin != prev_arg))
    return wmin, emit


def syncmer_windows(bases: jnp.ndarray, k: int, s: int):
    """Closed-syncmer stream: (codes, emit) where emit marks selected
    k-mer positions and codes is the k-mer canonical hash."""
    if s > k:
        raise ValueError(f"syncmer s ({s}) must be <= k ({k})")
    kvalid = codec.window_valid(bases, k)
    khash = nthash_windows(bases, k, canonical=True)
    svalid = codec.window_valid(bases, s)
    shash = jnp.where(svalid, nthash_windows(bases, s, canonical=True), _U64_MAX)
    n = bases.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    w = k - s + 1  # number of s-mers per k-mer
    smin, sargmin = _window_argmin(shash, idx, w)
    offset = sargmin - idx
    is_closed = (offset == 0) | (offset == (k - s))
    emit = kvalid & is_closed
    return khash, emit
