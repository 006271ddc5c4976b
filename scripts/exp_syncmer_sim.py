"""Simulate stateful sliding-min syncmer implementations (bug-variant grid).

A Go implementation of closed syncmers naturally keeps a tracked
(minVal, minPos) over a sliding window of s-mer hashes.  Subtle choices
(operation order, expiry comparison, rescan vs lazy reset, < vs <=,
emission condition) produce materially different selections.  This grid
simulates them all and scores against the reference fixtures:
  distinct = 446,227; mapped-gap histogram flat ~20k d=1..14 + 165k @15.
"""

import sys
import time

sys.path.insert(0, "/root/repo/scripts")
import numpy as np
from exp_syncmer_rules import Forensics, load_genome, shift_up

U64MAX = 0xFFFFFFFFFFFFFFFF


def window_argmin_np(vals, w, leftmost=True):
    """(min, leftmost-or-rightmost argmin) over [i, i+w)."""
    n = len(vals)
    v = vals.copy()
    ix = np.arange(n, dtype=np.int64)
    width = 1
    while width * 2 <= w:
        v2 = shift_up(v, width, np.uint64(U64MAX))
        ix2 = shift_up(ix.view(np.uint64), width, np.uint64(n)).view(np.int64)
        take = (v2 < v) if leftmost else (v2 <= v)
        v = np.where(take, v2, v)
        ix = np.where(take, ix2, ix)
        width *= 2
    rem = w - width
    if rem:
        v2 = shift_up(v, rem, np.uint64(U64MAX))
        ix2 = shift_up(ix.view(np.uint64), rem, np.uint64(n)).view(np.int64)
        take = (v2 < v) if leftmost else (v2 <= v)
        v = np.where(take, v2, v)
        ix = np.where(take, ix2, ix)
    return v, ix


def simulate(sh_list, nk, W, order, expiry_lt, action, insert_le, emit,
             am_full_l, am_full_r, am_part_l, am_part_r):
    """One pass over windows p=0..nk-1; window = smers [p, p+W-1].

    order: 'EIC','IEC','ECI' (E=expiry, I=insert entering smer, C=check)
    expiry_lt: expire when minPos < p (else minPos <= p... '<' standard)
    action: 'rescan' (argmin over current range) or 'lazy' (reset to inf)
    insert_le: entering smer replaces min when <= (else <)
    emit: tuple of offsets considered "ends" (e.g. (0, W-1))
    am_*: precomputed argmin arrays: full = [p, p+W-1], part = [p, p+W-2]
    """
    INF = 1 << 100
    minVal = INF
    minPos = -1
    sel = np.zeros(nk, bool)
    # prefill smers [0, W-2] as if windows started before
    for q in range(W - 1):
        v = sh_list[q]
        if (v <= minVal) if insert_le else (v < minVal):
            minVal, minPos = v, q
    for p in range(nk):
        q = p + W - 1
        inserted = False
        for stepc in order:
            if stepc == "E":
                if minPos < p:
                    if action == "rescan":
                        mp = (am_full_l[p] if inserted else am_part_l[p])
                        minPos = mp
                        minVal = sh_list[mp]
                    else:
                        minVal, minPos = INF, -1
            elif stepc == "I":
                v = sh_list[q]
                if (v <= minVal) if insert_le else (v < minVal):
                    minVal, minPos = v, q
                inserted = True
            else:  # C
                off = minPos - p
                if off in emit:
                    sel[p] = True
    return sel


def main():
    codes = load_genome("/root/reference/testdata/old/Ecoli-MG1655.fasta.gz")
    F = Forensics(codes)
    nk, sh = F.nk, F.shash
    W = 16
    amWl = window_argmin_np(sh, W, True)[1]
    amWr = window_argmin_np(sh, W, False)[1]
    amPl = window_argmin_np(sh, W - 1, True)[1]
    amPr = window_argmin_np(sh, W - 1, False)[1]
    sh_list = sh.tolist()
    amWl_l, amWr_l = amWl.tolist(), amWr.tolist()
    amPl_l, amPr_l = amPl.tolist(), amPr.tolist()

    grid = []
    for order in ("EIC", "IEC", "ECI"):
        for action in ("rescan", "lazy"):
            for insert_le in (True, False):
                for emit in ((0, W - 1), (0,), (W - 1,)):
                    grid.append((order, action, insert_le, emit))

    target = 446227
    for order, action, insert_le, emit in grid:
        t0 = time.time()
        sel = simulate(
            sh_list, nk, W, order, True, action, insert_le, emit,
            amWl_l, amWr_l, amPl_l, amPr_l,
        )
        name = f"{order}/{action}/{'<=' if insert_le else '<'}/e{emit}"
        n = len(np.unique(F.khash[sel]))
        flag = " <====" if abs(n - target) < 9000 else ""
        print(f"{name:28s} distinct={n:7d} sel={int(sel.sum()):7d} "
              f"({time.time()-t0:.0f}s){flag}", flush=True)


if __name__ == "__main__":
    main()
