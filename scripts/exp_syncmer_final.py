"""Round-3 final syncmer forensic pass (VERDICT round-2 next #8).

The W=30 reign rule + forced emission every T=15 lands at 447,951 vs
the 446,227 fixture (+0.39%; docs/DIVERGENCES.md §2).  Round 2 swept
tie direction, window width, boundary handling, and the forcing
anchor.  This pass covers the last unswept implementation-shaped
variants of the FORCED emission itself:

  A. forced position = argmin of the s-mer hashes in (last, last+T]
     (what a lazy-min ring buffer emits on guarantee expiry), instead
     of exactly last+T;
  B. forcing counter resets only on NATURAL (argmin) emissions, so a
     forced emission does not push the next deadline;
  C. forced position = last+T but measured against the k-mer START of
     the NEXT natural emission (deadline on emitted k-mer distance,
     not reign distance) — equivalent to A with the k-mer hash column;
  D. A with rightmost argmin.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from exp_syncmer_rules import Forensics, load_genome, positions_with_forcing
from exp_syncmer_sim import window_argmin_np


def forced_argmin(base_pos, T, hashes, nk, leftmost=True, reset_on_forced=True):
    """Walk gaps > T; each deadline emits the argmin of the open span's
    hashes instead of the deadline position itself."""
    pos = list(base_pos)
    out = set(base_pos.tolist())
    base = base_pos
    add = []
    # leading edge
    first = base[0] if base.size else nk
    last = -1
    i = 0
    nxt = base[0] if base.size else nk
    while last < nk - 1:
        limit = last + T
        if nxt <= limit:
            last = nxt
            i += 1
            nxt = base[i] if i < base.size else nk
            continue
        # deadline passes with no natural emission
        lo, hi = last + 1, min(limit + 1, nk)
        if lo >= hi:
            break
        span = hashes[lo:hi]
        q = int(np.argmin(span)) if leftmost else (
            len(span) - 1 - int(np.argmin(span[::-1])))
        p = lo + q
        add.append(p)
        last = p if reset_on_forced else limit
        if last >= nk - 1:
            break
    return np.unique(np.array(sorted(out | set(add)), np.int64))


def main():
    codes = load_genome("/root/reference/testdata/old/Ecoli-MG1655.fasta.gz")
    F = Forensics(codes)
    nk, ns, sh = F.nk, F.ns, F.shash
    W = 30
    am = window_argmin_np(sh, W, True)[1]
    hits = am[np.arange(ns)]
    hits = hits[(hits >= 0) & (hits < nk)]
    base_pos = np.unique(hits)

    def ev(name, pos):
        sel = np.zeros(nk, bool)
        sel[pos[(pos >= 0) & (pos < nk)]] = True
        F.evaluate(name, sel)

    ev("baseline W=30 L +f15", positions_with_forcing(base_pos, 15, nk))
    for T in (14, 15, 16):
        ev(f"A argmin-forced T={T}",
           forced_argmin(base_pos, T, sh[:nk], nk, True, True))
    ev("B no-reset forced T=15",
       forced_argmin(base_pos, 15, sh[:nk], nk, True, False))
    ev("D argmin-forced R T=15",
       forced_argmin(base_pos, 15, sh[:nk], nk, False, True))
    # C: deadline measured on k-mer hashes instead of s-mer hashes
    ev("C khash argmin-forced T=15",
       forced_argmin(base_pos, 15, F.khash, nk, True, True))


if __name__ == "__main__":
    main()
