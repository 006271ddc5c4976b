"""On-chip timing for grep's device membership tier (VERDICT round-3
next #4): is DeviceMembership (HBM-resident sorted query set, per-block
binary search, bit-packed egress) ever faster than the host
searchsorted loop on THIS backend, and is the 2^23 auto-gate justified?

Arms, at two query sizes (2^23 and 2^25 codes):
  host   — np.searchsorted per 2^20-code block (grep's real block size)
  device — DeviceMembership.lookup per block

The lookup stream is 2^24 codes (16 blocks of 2^20), ~50% hit rate.
Ingress per block is 8 MB of u64 codes over the ~35 MB/s tunnel, so the
device arm is expected to be ingress-bound here; production PCIe hosts
would see ~100x that ingress.  Outcome feeds the grep_device_route gate
(ops/device_sets.py): keep, retune, or demote to opt-in.

Device discipline: in-process watchdogs only; no external kills.
"""

import sys
import time

import numpy as np

import unikmer_tpu  # noqa: F401  (x64, compile cache, hugepage fix)
import jax

from unikmer_tpu.ops.device_sets import SENT, DeviceMembership

BLOCK = 1 << 20  # io/unik.py DEFAULT_BLOCK: grep streams these
N_LOOK = 1 << 24


def make_query(rng, n):
    q = rng.integers(0, 1 << 46, size=int(n * 1.1), dtype=np.uint64)
    q = np.unique(q)[:n]
    assert len(q) == n
    return q


def make_stream(rng, query, n):
    hits = rng.choice(query, size=n // 2)
    miss = rng.integers(0, 1 << 46, size=n - len(hits), dtype=np.uint64)
    look = np.concatenate([hits, miss])
    rng.shuffle(look)
    return look


def host_arm(query, look):
    t0 = time.time()
    total = 0
    for i in range(0, len(look), BLOCK):
        blk = look[i:i + BLOCK]
        idx = np.searchsorted(query, blk)
        idx = np.minimum(idx, max(len(query) - 1, 0))
        ok = (query[idx] == blk) & (blk != SENT)
        total += int(ok.sum())
    return time.time() - t0, total


def device_arm(query, look):
    t_up0 = time.time()
    dm = DeviceMembership(query)
    # force the upload to finish before timing lookups
    _ = dm.lookup(look[:8])
    t_up = time.time() - t_up0
    t0 = time.time()
    total = 0
    for i in range(0, len(look), BLOCK):
        blk = look[i:i + BLOCK]
        total += int(dm.lookup(blk).sum())
    return time.time() - t0, t_up, total


def main():
    print(f"# backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(11)
    for qbits in (23, 25):
        query = make_query(rng, 1 << qbits)
        look = make_stream(rng, query, N_LOOK)
        th, nh = host_arm(query, look)
        # warm the device program shape before the timed pass
        td_warm, t_up, nd_warm = device_arm(query, look[:BLOCK])
        td, _, nd = device_arm(query, look)
        assert nh == nd, f"MEMBERSHIP MISMATCH host={nh} device={nd}"
        print(
            f"query=2^{qbits} look=2^24: host {th:6.2f}s  "
            f"device {td:6.2f}s (upload {t_up:.2f}s)  "
            f"hits={nh}  device/host={td/th:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    sys.exit(main())
