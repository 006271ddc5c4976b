"""On-chip measurement of the multi-bucket streamed count
(VERDICT round-2 next #5): does one lax.map program over B 2^25
buckets beat B single dispatches by amortizing the ~20-25 ms fixed
dispatch+fetch floor?

Data is a REPEATED genome-like sequence (distinct ~2^21 << windows) so
result egress does not drown the dispatch-floor signal — the first
version used random bases (~100% distinct) and measured the 6 MB/s
tunnel instead (result egress 40+ s/arm; it still showed B=2/B=1 =
1.218x on equal egress).  Dual-step arms run at B=1: the B=2 dual
program SIGKILLed the remote compile helper (oversized graph,
BENCH_NOTES round-3).

Device discipline: in-process watchdog warnings only, no external
kills (CLAUDE.md).
"""

import os
import sys
import time

import numpy as np

import unikmer_tpu  # noqa: F401
import jax

from unikmer_tpu.io.fastx import PackedSeqs
from unikmer_tpu.models.count import CountConfig, count_stream_packed

PIECES = 12  # divisible by every swept B (1..4): no remainder groups
SIZE = 1 << 25


def make_packed(pieces=PIECES):
    rng = np.random.default_rng(7)
    unit = rng.integers(0, 4, size=1 << 21, dtype=np.uint8)
    bases = np.tile(unit, pieces * SIZE // len(unit))
    starts = np.arange(pieces, dtype=np.int64) * SIZE
    return PackedSeqs(bases, starts, np.full(pieces, SIZE, np.int64))


def run(label, mode, multi, dual="0", pieces=PIECES):
    os.environ["UNIKMER_TPU_MULTI_BUCKET"] = multi
    os.environ["UNIKMER_TPU_DUAL_STEP"] = dual
    packed = make_packed(pieces)
    cfg = CountConfig(k=23, canonical=True, mode=mode)
    t0 = time.time()
    out = count_stream_packed([packed], cfg, chunk_bases=SIZE - 23)
    dt = time.time() - t0
    kps = (pieces * SIZE) / dt
    print(f"{label:28s} mode={mode} B={multi} dual={dual} "
          f"wall={dt:6.2f}s n={len(out)} {kps/1e6:7.1f}M kmers/s",
          flush=True)
    return dt, np.asarray(out)


def main():
    print(f"# backend={jax.default_backend()}", flush=True)
    # warm program shapes first (compile excluded from timing); sweep
    # B=1..4 (VERDICT round-3 next #3: find the amortization limit)
    sweep = ("1", "2", "3", "4")
    for m in sweep:
        # warm with exactly one group of B pieces (compiles the full
        # group shape; PIECES % B == 0 so no remainder shapes exist)
        run("warm distinct", "distinct", m, pieces=int(m))
    t1, o1 = run("distinct B=1", "distinct", "1")
    base_out = o1
    for m in sweep[1:]:
        tm, om = run(f"distinct B={m}", "distinct", m)
        assert np.array_equal(base_out, om), f"MULTI-BUCKET MISMATCH B={m}"
        print(f"# distinct speedup B={m}/B=1: {t1/tm:.3f}x", flush=True)
    # dual at B=1 only (B=2 dual compile SIGKILLs the helper)
    for m, d in (("1", "0"), ("1", "1")):
        run("warm repeated", "repeated", m, d, pieces=1)
    t3, o3 = run("repeated 2-dispatch", "repeated", "1", "0")
    t4, o4 = run("repeated dual B=1", "repeated", "1", "1")
    assert np.array_equal(o3, o4), "DUAL MISMATCH"
    print(f"# repeated speedup dual(B=1): {t3/t4:.3f}x", flush=True)
    # STAGED dual at B=2 (round 4): the 2-program split at the sorted
    # boundary dodges the monolithic dual graph that SIGKILLed the
    # helper; UNIKMER_TPU_DUAL_MULTI=1 lets dual groups form, the
    # staged route engages automatically (non-cpu default)
    os.environ["UNIKMER_TPU_DUAL_MULTI"] = "1"
    try:
        run("warm dual staged B=2", "repeated", "2", "1", pieces=2)
        t5, o5 = run("repeated dual stagedB2", "repeated", "2", "1")
        assert np.array_equal(o3, o5), "DUAL STAGED MISMATCH"
        print(f"# repeated speedup dual staged B=2 vs 2-dispatch: "
              f"{t3/t5:.3f}x", flush=True)
    finally:
        del os.environ["UNIKMER_TPU_DUAL_MULTI"]


if __name__ == "__main__":
    sys.exit(main())
