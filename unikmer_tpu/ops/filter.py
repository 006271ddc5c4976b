"""Low-complexity k-mer filter (vectorized).

Behavior contract (reference: unikmer/cmd/filter.go:181-221 filterCode):
walk the code's bases from the LAST base backwards; score[0] = penalty_d,
score[i] = penalty_s when base i equals the previous walked base else
penalty_d; slide a window over the scores with start i in
[0, max(k-window-1, 0)] and flag the k-mer low-complexity when any
window sum >= threshold.  (The reference's loop bound skips the final
window; reproduced bit-for-bit.)
"""

from __future__ import annotations

import numpy as np


def low_complexity_mask(
    codes: np.ndarray,
    k: int,
    penalty_s: int = 3,
    penalty_d: int = 1,
    threshold: int = 15,
    window: int = 7,
) -> np.ndarray:
    """True where the k-mer is low-complexity (to be filtered out)."""
    codes = np.asarray(codes, dtype=np.uint64)
    window = min(window, k)
    n = len(codes)
    if n == 0:
        return np.zeros(0, bool)
    # bases walked from the last base backwards: b[:, i] = (code >> 2i) & 3
    shifts = (2 * np.arange(k, dtype=np.uint64))[None, :]
    bases = ((codes[:, None] >> shifts) & np.uint64(3)).astype(np.int8)
    scores = np.full((n, k), penalty_d, dtype=np.int32)
    if k > 1:
        same = bases[:, 1:] == bases[:, :-1]
        scores[:, 1:][same] = penalty_s
    # sliding-window sums over axis 1, starts 0..i_last
    i_last = max(k - window - 1, 0)
    csum = np.zeros((n, k + 1), dtype=np.int32)
    np.cumsum(scores, axis=1, out=csum[:, 1:])
    starts = np.arange(i_last + 1)
    ends = np.minimum(starts + window, k)
    win_sums = csum[:, ends] - csum[:, starts]
    return (win_sums >= threshold).any(axis=1)
