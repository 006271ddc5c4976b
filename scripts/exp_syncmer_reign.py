"""Round-2 syncmer forensics: the reign rule and its micro-variants.

Round 1's best reconstruction (docs/DIVERGENCES.md §2): select every
position that is the leftmost argmin of ANY sliding window of W=30
s-mer hashes, plus forced emission every 15 positions since the last
emission -> 447,951 distinct vs the 446,227 fixture (+0.39%).

This script reproduces that number and sweeps the remaining micro-knobs
(tie direction, window width, boundary handling, forcing anchor).
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from exp_syncmer_rules import (
    Forensics,
    load_genome,
    positions_with_forcing,
    window_min,
)
from exp_syncmer_sim import window_argmin_np


def sel_from_argmin(am, t_range, nk):
    sel = np.zeros(nk, bool)
    hits = am[t_range]
    hits = hits[(hits >= 0) & (hits < nk)]
    sel[hits] = True
    return sel


def run(F, name, base_sel, T=15, force=True):
    if force:
        base_pos = np.flatnonzero(base_sel)
        pos = positions_with_forcing(base_pos, T, F.nk)
        sel = np.zeros(F.nk, bool)
        sel[pos] = True
    else:
        sel = base_sel
    return F.evaluate(name, sel)


def main():
    codes = load_genome("/root/reference/testdata/old/Ecoli-MG1655.fasta.gz")
    F = Forensics(codes)
    nk, ns, sh = F.nk, F.ns, F.shash

    for W in (28, 29, 30, 31, 32):
        for leftmost in (True, False):
            am = window_argmin_np(sh, W, leftmost)[1]
            # windows starting at every t (tail windows partial)
            sel = sel_from_argmin(am, np.arange(ns), nk)
            run(F, f"reign W={W} {'L' if leftmost else 'R'} +f15", sel)

    # full windows only (no partial tails)
    W = 30
    am = window_argmin_np(sh, W, True)[1]
    sel = sel_from_argmin(am, np.arange(ns - W + 1), nk)
    run(F, "reign W=30 L full-only +f15", sel)

    # forcing variants on the winner
    am = window_argmin_np(sh, W, True)[1]
    base = sel_from_argmin(am, np.arange(ns), nk)
    run(F, "reign W=30 L (no force)", base, force=False)
    run(F, "reign W=30 L +f14", base, T=14)
    run(F, "reign W=30 L +f16", base, T=16)


if __name__ == "__main__":
    main()
