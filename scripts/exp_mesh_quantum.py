"""Isolate the mesh-efficiency cost of quantized per-shard capacities
(VERDICT round-3 next #5).

Context: bench_multichip.py (the committed MULTICHIP_NOTES numbers)
uses EXACT capacities, while the production driver
(parallel/sharded.mesh_count_distinct) rounds capacity up through
_cap_quantum — pow2 steps, worst case ~2x padding on the exchange
buffers and the per-shard sort.  This experiment measures, on the
virtual CPU mesh:

  arm exact  — capacity = 2*windows/d^2 + 1        (bench formula)
  arm pow2   — _cap_quantum today: next pow2       (worst ~2.00x pad)
  arm half   — half-octave steps {2^i, 1.5*2^i}    (worst ~1.33x pad)

at d = 2, 4 over two input sizes: one whose exact capacity lands just
PAST a pow2 boundary (maximum padding) and one just under (minimum).
Decision rule: if pow2 costs >= 3 points of scaling efficiency at the
bad size and half recovers most of it, adopt half-octave quanta in
_cap_quantum.
"""

import json
import os
import sys
import time

if os.environ.get("UNIKMER_TPU_PLATFORM") is None:
    os.environ["UNIKMER_TPU_PLATFORM"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import numpy as np

import unikmer_tpu  # noqa: F401
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from unikmer_tpu.models.count import CountConfig
from unikmer_tpu.parallel.mesh import SHARD_AXIS, make_mesh
from unikmer_tpu.parallel.sharded import (
    build_sharded_distinct, pack_host_shards,
)

K = 23
REPS = 5


def quant_pow2(cap, floor=1024):
    q = floor
    while q < cap:
        q *= 2
    return q


def quant_half(cap, floor=1024):
    q = floor
    while q < cap:
        if q + q // 2 >= cap:
            return q + q // 2
        q *= 2
    return q


def run(bases, d, capacity):
    mesh = make_mesh(d)
    rows = pack_host_shards(bases, d, K)
    cfg = CountConfig(k=K, canonical=True)
    step = build_sharded_distinct(mesh, cfg, capacity)
    dev_rows = jax.device_put(rows, NamedSharding(mesh, P(SHARD_AXIS, None)))
    out, counts, dropped, _ = step(dev_rows)
    assert int(np.asarray(dropped)[0]) == 0, "capacity overflow"
    total = int(np.asarray(counts).sum())
    best = 1e9
    for _ in range(REPS):
        t0 = time.time()
        _, counts, _, _ = step(dev_rows)
        int(np.asarray(counts).sum())
        best = min(best, time.time() - t0)
    return best, total


def main():
    rng = np.random.default_rng(20260820)
    # size A: exact cap lands just PAST a pow2 boundary at d=2 AND d=4
    # (2*W/d^2 slightly > 2^21/2^19) -> pow2 pads ~1.9x
    # size B: exact cap lands just under the next pow2 (~1.03x pad)
    sizes = {
        "pad-2x": int((1 << 22) * 1.05),
        "pad-1x": int((1 << 22) * 0.97),
    }
    for label, size in sizes.items():
        bases = rng.integers(0, 4, size=size, dtype=np.uint8)
        windows = size - K + 1
        # single-device reference for efficiency normalization
        t1, n1 = run(bases, 1, 2 * windows + 1)
        kps1 = windows / t1
        for d in (2, 4):
            exact = 2 * windows // (d * d) + 1
            for arm, cap in (("exact", exact),
                             ("pow2", quant_pow2(exact)),
                             ("half", quant_half(exact))):
                t, n = run(bases, d, cap)
                assert n == n1, (label, d, arm, n, n1)
                kps = windows / t
                eff = kps / (d * kps1)
                print(json.dumps({
                    "size": label, "d": d, "arm": arm, "cap": cap,
                    "pad_x": round(cap / exact, 3),
                    "kps": round(kps), "eff": round(eff, 3),
                }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
