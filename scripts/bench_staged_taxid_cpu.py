#!/usr/bin/env python
"""CPU-side staged-taxid wall-time probe for the driver bench
(VERDICT round-4 next #6: BENCH_r05 should carry the staged-taxid
evidence without a hand-authored side artifact).

Runs the STAGED 3-program device taxid collapse (the round-4
chip-proven route: sort / merge rounds / egress with device-resident
handoff, ops/device_sets.run_staged_taxid_collapse) on the CPU backend
at a fixed synthetic size and prints ONE JSON line with the wall time.
Cheap (~seconds), deterministic, and exercises the exact program
structure the chip runs — so a structural regression (a stage
re-fused into the starving monolith, a shape change) shows up in the
driver bench even on rounds without a healthy chip queue.

Reference analog: count -T's LCA reduction (count.go:377-410).
"""

import json
import os
import sys
import time

os.environ.setdefault("UNIKMER_TPU_PLATFORM", "cpu")
os.environ.setdefault("UNIKMER_TPU_TAXID_STAGED", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import unikmer_tpu  # noqa: F401

from unikmer_tpu.io.fastx import PackedSeqs
from unikmer_tpu.models.count import CountConfig, count_taxids_from_packed
from unikmer_tpu.taxonomy.taxdump import load_taxonomy

SIZE = 1 << 20  # bases (pads to the 2^20 CPU bucket quantum)
K = 23


def main() -> int:
    taxdir = os.path.join(os.path.dirname(__file__), "..", "tests",
                          "data", "taxdump")
    taxdb = load_taxonomy(taxdir)
    rng = np.random.default_rng(20260821)
    n_rec = 64
    bases = rng.integers(0, 4, size=SIZE, dtype=np.uint8)
    starts = np.sort(rng.choice(SIZE - K, n_rec - 1, replace=False) + 1)
    starts = np.concatenate([[0], starts]).astype(np.int64)
    lengths = np.diff(np.append(starts, SIZE)).astype(np.int64)
    packed = PackedSeqs(bases, starts, lengths)
    valid = np.nonzero(taxdb.depth >= 0)[0]
    pool = valid[valid > 0].astype(np.uint32)
    rec_taxids = rng.choice(pool, n_rec).astype(np.uint32)
    cfg = CountConfig(k=K, canonical=True)

    t0 = time.time()
    codes, taxids = count_taxids_from_packed(packed, rec_taxids, cfg, taxdb)
    cold = time.time() - t0
    t0 = time.time()
    codes, taxids = count_taxids_from_packed(packed, rec_taxids, cfg, taxdb)
    warm = time.time() - t0
    print(
        f"# staged taxid cpu: n={len(codes)} cold={cold:.2f}s "
        f"warm={warm:.2f}s",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "staged_taxid_collapse_cpu_2e20",
        "value": round(warm, 3),
        "unit": "s",
        "vs_baseline": 0,
        "n_out": int(len(codes)),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
