"""Syncmer selection-rule forensics (docs/DIVERGENCES.md §2).

Target (reference unikmer v0.21.0, MG1655, k=31, s=16, canonical ntHash):
  * distinct k-mers = 446,227  (analysis/distance/README.md)
  * mapped-position distance histogram: d=1 ~25k, d=2..14 ~20k flat,
    d=15 spike ~165k, nothing beyond 15
  * Edgar's closed syncmer gives 579,624 distinct (our current impl).

This harness computes per-position canonical ntHash arrays once, then
evaluates candidate selection rules in vectorized numpy.
"""

import gzip
import sys

import numpy as np

SEEDS_FWD = np.array(
    [0x3C8BFBB395C60474, 0x3193C18562A02B4C, 0x20323ED082572324, 0x295549F54BE24456],
    dtype=np.uint64,
)
SEEDS_RC = SEEDS_FWD[[3, 2, 1, 0]]


def rol(x, s):
    s = int(s) & 63
    if s == 0:
        return x
    return (x << np.uint64(s)) | (x >> np.uint64(64 - s))


def shift_up(x, s, fill=np.uint64(0)):
    if s == 0:
        return x
    out = np.full_like(x, fill)
    out[:-s] = x[s:]
    return out


def nthash_windows_np(codes, k, canonical=True):
    """ntHash of every window [i, i+k); windows running off the end give
    garbage the caller must mask."""
    f_pow = SEEDS_FWD[codes]
    r_pow = SEEDS_RC[codes]
    pow_w = 1
    f_acc = r_acc = None
    acc_w = 0
    for b in range(7):
        if (k >> b) & 1:
            if f_acc is None:
                f_acc, r_acc, acc_w = f_pow, r_pow, pow_w
            else:
                f_acc = rol(f_pow, acc_w) ^ shift_up(f_acc, pow_w)
                r_acc = r_pow ^ rol(shift_up(r_acc, pow_w), pow_w)
                acc_w += pow_w
        if (k >> (b + 1)) != 0:
            f_pow = rol(f_pow, pow_w) ^ shift_up(f_pow, pow_w)
            r_pow = r_pow ^ rol(shift_up(r_pow, pow_w), pow_w)
            pow_w *= 2
    if canonical:
        return np.minimum(f_acc, r_acc), f_acc, r_acc
    return f_acc, f_acc, r_acc


def window_min(vals, w):
    """min over [i, i+w) via doubling (tail windows partial)."""
    v = vals.copy()
    width = 1
    U = np.uint64(0xFFFFFFFFFFFFFFFF)
    while width * 2 <= w:
        v = np.minimum(v, shift_up(v, width, U))
        width *= 2
    return np.minimum(v, shift_up(v, w - width, U))


def load_genome(path):
    seq = []
    with gzip.open(path, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                continue
            seq.append(line.strip())
    raw = b"".join(seq)
    lut = np.full(256, 255, np.uint8)
    for i, b in enumerate(b"ACGT"):
        lut[b] = i
        lut[b + 32] = i
    codes = lut[np.frombuffer(raw, dtype=np.uint8)]
    assert (codes != 255).all(), "unexpected non-ACGT base"
    return codes


class Forensics:
    def __init__(self, codes, k=31, s=16):
        self.k, self.s = k, s
        self.L = len(codes)
        self.nk = self.L - k + 1  # kmer windows
        self.ns = self.L - s + 1  # smer windows
        kh, kf, kr = nthash_windows_np(codes, k)
        sh, sf, sr = nthash_windows_np(codes, s)
        self.khash = kh[: self.nk]
        self.shash = sh[: self.ns]
        self.sfwd = sf[: self.ns]
        self.srev = sr[: self.ns]

    def evaluate(self, name, sel, show=True):
        """sel: bool over kmer windows [0, nk). Prints distinct count and
        mapped-distance histogram."""
        kms = self.khash[sel]
        distinct = np.unique(kms)
        # mapped positions: every window whose canonical hash is in the set
        pos = np.flatnonzero(np.isin(self.khash, distinct, kind="sort"))
        d = np.diff(pos)
        hist = np.bincount(d, minlength=20)
        if show:
            bars = " ".join(f"{hist[i]//1000}k" for i in range(1, 17))
            tail = hist[17:].sum() + (hist[16] if len(hist) > 16 else 0)
            print(
                f"{name:34s} distinct={len(distinct):7d} pos={len(pos):7d} "
                f"d1..16=[{bars}] d>16={d[d>16].size}",
                flush=True,
            )
        return len(distinct)


def main():
    codes = load_genome("/root/reference/testdata/old/Ecoli-MG1655.fasta.gz")
    F = Forensics(codes)
    k, s = F.k, F.s
    r = k - s  # 15
    nk, ns = F.nk, F.ns
    sh = F.shash

    w16 = window_min(sh, 16)[:nk]  # min over smers [p, p+15]
    lead16 = sh[:nk] == w16
    trail16 = shift_up(sh, r)[:nk] == w16  # smer at p+15 is min

    # strong: smer at q is min of [q-15, q+15] (31 smers); as window over
    # start t = q-15: min31[t] = min sh[t..t+30]; strong center at t+15
    w31 = window_min(sh, 31)
    strong_center = shift_up(sh, 15) == w31  # at index t: smer t+15 strong
    # selection at window p where smer p is strong: p = q -> window start t = p-15
    strongL = np.zeros(nk, bool)  # shash[p] is min of [p-15, p+15]
    strongL[15:] = strong_center[: nk - 15]
    # boundary: for p<15 fall back to min over [0, p+15]
    for p in range(min(15, nk)):
        strongL[p] = sh[p] == sh[: p + 16].min()
    # strongT: shash[p+15] is min of [p, p+30]
    strongT = np.zeros(nk, bool)
    strongT[: ns - 30] = (shift_up(sh, 15) == w31)[: ns - 30]
    w31t = w31
    strongT = shift_up(sh, 15)[:nk] == w31[:nk]  # min over [p, p+30]; tail partial

    print(f"windows={nk}")
    F.evaluate("edgar lead16|trail16 (ours)", lead16 | trail16)
    F.evaluate("trail16 only", trail16)
    F.evaluate("lead16 only", lead16)
    F.evaluate("H_T trail16|strongL", trail16 | strongL)
    F.evaluate("H_T' lead16|strongT", lead16 | strongT)
    F.evaluate("pairs strongL|strongT", strongL | strongT)

    # wider windows with ends {0, w-1}
    for w in (17, 18, 20, 21):
        wm = window_min(sh, w)[:nk]
        lead = sh[:nk] == wm
        trail = shift_up(sh, w - 1)[:nk] == wm
        F.evaluate(f"ends of {w}-window", lead | trail)

    # window of 16 but ends {0, 15} with min over [p-?, ...]
    return 0


def positions_with_forcing(base_pos, T, limit):
    """base_pos sorted; insert forced emissions at last+T whenever the gap
    to the next base position exceeds T.  Returns full sorted positions."""
    out = [base_pos]
    g = np.diff(base_pos)
    # for each gap g_i > T at start t: fills at t+T, t+2T, ... < t+g_i
    idx = np.flatnonzero(g > T)
    if idx.size:
        starts = base_pos[idx]
        counts = (g[idx] - 1) // T
        reps = np.repeat(starts, counts)
        # offsets: T, 2T, ... per group
        cum = np.concatenate([[0], np.cumsum(counts)])
        within = np.arange(reps.size) - np.repeat(cum[:-1], counts) + 1
        out.append(reps + within * T)
    # also leading edge: before first base position
    if base_pos.size and base_pos[0] > T:
        nfill = (base_pos[0] - 1) // T
        out.append((np.arange(nfill, 0, -1) * -T + base_pos[0]))
    pos = np.unique(np.concatenate(out))
    return pos[(pos >= 0) & (pos < limit)]


def run_forced(F, name, base_sel, T=15):
    base_pos = np.flatnonzero(base_sel)
    pos = positions_with_forcing(base_pos, T, F.nk)
    sel = np.zeros(F.nk, bool)
    sel[pos] = True
    return F.evaluate(name, sel)


def main2():
    codes = load_genome("/root/reference/testdata/old/Ecoli-MG1655.fasta.gz")
    F = Forensics(codes)
    k, s = F.k, F.s
    r = k - s
    nk, ns = F.nk, F.ns
    sh = F.shash
    w16 = window_min(sh, 16)[:nk]
    lead16 = sh[:nk] == w16
    trail16 = shift_up(sh, r)[:nk] == w16

    run_forced(F, "trail16 + forced15", trail16, 15)
    run_forced(F, "lead16 + forced15", lead16, 15)
    run_forced(F, "trail16 + forced16", trail16, 16)
    w31 = window_min(sh, 31)
    strongL = np.zeros(nk, bool)
    strongL[15:] = (shift_up(sh, 15) == w31)[: nk - 15]
    run_forced(F, "strongL + forced15", strongL, 15)
    strongT = shift_up(sh, 15)[:nk] == w31[:nk]
    run_forced(F, "strongT + forced15", strongT, 15)
    run_forced(F, "strongLT + forced15", strongL | strongT, 15)


if __name__ == "__main__":
    if "--all" in sys.argv:
        main()
    main2()
