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


def compat_gap(k: int, s: int) -> int:
    """Separator-run length pack_records must place between records for
    :func:`syncmer_compat_windows`: with W = 2(k-s) vote windows, a gap
    of W-s+1 RECORD_SEP bytes guarantees (a) no window starting in one
    record can see the next record's real s-mer values, and (b) every
    window starting inside the gap contains a vote-killer byte."""
    return max(2 * (k - s) - s + 1, 1)


def syncmer_compat_windows(bases: jnp.ndarray, k: int, s: int):
    """Device twin of the native compat closed-syncmer reconstruction
    (native/unikit_native.cpp syncmer_compat_emit_u64; the
    ``--syncmer-impl=compat`` mode approximating the reference's
    446,227 fixture, docs/DIVERGENCES.md §2).

    Semantics (per RECORD — segmented by RECORD_SEP runs of
    :func:`compat_gap` length, which pack_records(gap=...) provides):

      1. Base set: for every window of W = 2(k-s) consecutive s-mer
         positions (truncated at the record end), mark its leftmost
         minimum position when that position holds a valid k-mer.
      2. Head fills: before the first base b_first, emit every valid
         position q with (b_first - q) % T == 0, q >= 1 (local),
         T = k - s.
      3. Interior fills: between bases, emit valid positions at
         distance multiple of T since the previous base, up to the
         last base.

    All passes are vectorized: the vote pass is the shared
    _window_argmin pyramid + W shifted compares; the record
    segmentation rides plain (unsegmented) cummax/cummin scans because
    the separator-run layout makes every per-record quantity derivable
    from "previous separator" / "next separator" positions.  The C++
    window truncation at record ends is reproduced exactly by the gap
    layout: the first W-s gap bytes key as U64_MAX (losing, like
    truncation padding) and deeper gap bytes key as 0 ("vote killers"
    that absorb any window reaching across the boundary).

    Returns (khash, emit) like syncmer_windows.
    """
    from .codec import RECORD_SEP

    if s > k:
        raise ValueError(f"syncmer s ({s}) must be <= k ({k})")
    kvalid = codec.window_valid(bases, k)
    khash = nthash_windows(bases, k, canonical=True)
    if s == k:  # degenerate: every valid k-mer is a closed syncmer
        return khash, kvalid
    svalid = codec.window_valid(bases, s)
    shash = jnp.where(svalid, nthash_windows(bases, s, canonical=True),
                      _U64_MAX)
    n = bases.shape[0]
    idx = jnp.arange(n, dtype=jnp.int64)
    W = 2 * (k - s)
    T = k - s

    sep = bases == RECORD_SEP
    # prev_real[i] = last non-separator index <= i (-1 if none):
    # separator-run length at i is then i - prev_real[i]
    prev_real = jax.lax.cummax(jnp.where(~sep, idx, jnp.int64(-1)))
    run = idx - prev_real
    # vote killers: gap bytes deeper than W-s into the separator run
    # (for W <= s every separator byte kills — records are unreachable
    # across even a single gap byte then)
    killer = sep & (run > max(W - s, 0))
    vote_key = jnp.where(killer, jnp.uint64(0), shash)

    # vote pass: i is marked iff some window [t, t+W-1], t in
    # [i-W+1, i], has its leftmost argmin at i (C++ mark loop)
    _, wargmin = _window_argmin(vote_key, idx, W)
    mark = jnp.zeros((n,), bool)
    votes_i = wargmin == idx
    mark = votes_i
    for x in range(1, W):
        shifted = jnp.concatenate(
            [jnp.full((x,), jnp.int64(-1)), wargmin[:-x]])
        mark = mark | (shifted == idx)
    mark = mark & kvalid & (shash != _U64_MAX)

    # record scans (plain, unsegmented — see docstring):
    seg_start = jax.lax.cummax(jnp.where(sep, idx + 1, jnp.int64(0)))
    next_sep = jax.lax.cummin(jnp.where(sep, idx, jnp.int64(n)),
                              reverse=True)
    lb = jax.lax.cummax(jnp.where(mark, idx, jnp.int64(-1)))
    lb_eff = jnp.where(lb >= seg_start, lb, jnp.int64(-1))
    nm = jax.lax.cummin(jnp.where(mark, idx, jnp.int64(n)),
                        reverse=True)
    nm_strict = jnp.concatenate([nm[1:], jnp.full((1,), jnp.int64(n))])

    # head fills: before the record's first base (no base yet), at
    # T-multiples of the distance to it, local position >= 1
    head_fill = (
        kvalid & ~mark & (lb_eff < 0) & (nm < next_sep)
        & ((nm - idx) % T == 0) & (idx > seg_start)
    )
    # interior fills: after a base, before the record's last base, at
    # T-multiples since the previous base
    int_fill = (
        kvalid & ~mark & (lb_eff >= 0) & (nm_strict < next_sep)
        & ((idx - lb_eff) % T == 0)
    )
    return khash, mark | head_fill | int_fill


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
