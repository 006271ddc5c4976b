#!/usr/bin/env python
"""Stage attribution for the sharded mesh build on the virtual CPU mesh
(VERDICT round-4 next #5: find and REMOVE a real cost at d=4 instead of
re-measuring until it lands high).

Arms (all shard_map'd, same shapes as build_sharded_distinct):
  full       window codes + local bucket sort + all_to_all + collapse
  nox        same but NO all_to_all (collapse the local send buffer)
  nocollapse codes + bucket sort + all_to_all + sum (no final re-sort)
  codes      window codes only
Reported per d in {1,2,4}: median-of-5 wall (scalar-fetch forced).
"""

import json
import os
import sys
import time

os.environ.setdefault("UNIKMER_TPU_PLATFORM", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import unikmer_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from unikmer_tpu.models.count import CountConfig, window_codes
from unikmer_tpu.ops.sort import collapse_sorted
from unikmer_tpu.parallel.mesh import SHARD_AXIS, make_mesh
from unikmer_tpu.parallel.sharded import (
    SENT, _local_pack_buckets, pack_host_shards, shard_halos,
)
from jax.sharding import NamedSharding, PartitionSpec as P

LOG2 = int(os.environ.get("EXP_SIZE", "22"))
K = 23


def build(mesh, cfg, capacity, arm):
    n_shards = mesh.shape[SHARD_AXIS]
    code_bits = 2 * cfg.k
    front, back = shard_halos(cfg)

    def local_step(bases_row):
        row = bases_row[0]
        codes, valid = window_codes(row, cfg)
        pos = jnp.arange(row.shape[0], dtype=jnp.int32)
        own = (pos >= front) & (pos < row.shape[0] - back)
        valid = valid & own
        if arm == "codes":
            return jnp.sum(jnp.where(valid, codes, 0))[None]
        buf, dropped = _local_pack_buckets(
            codes, valid, n_shards, capacity, code_bits)
        if arm == "nox":
            mine = buf.reshape(-1)
        else:
            recv = jax.lax.all_to_all(
                buf[None], SHARD_AXIS, split_axis=1, concat_axis=1,
                tiled=False)
            mine = recv.reshape(-1)
        if arm == "nocollapse":
            return jnp.sum(mine)[None]
        out, n = collapse_sorted(mine, mine != SENT, mode=cfg.mode,
                                 code_bits=cfg.code_bits)
        return n[None]

    return jax.jit(jax.shard_map(
        local_step, mesh=mesh, in_specs=P(SHARD_AXIS, None),
        out_specs=P(SHARD_AXIS)))


def main():
    size = 1 << LOG2
    rng = np.random.default_rng(20260821)
    bases = rng.integers(0, 4, size=size, dtype=np.uint8)
    cfg = CountConfig(k=K, canonical=True)
    windows = size - K + 1
    out = {}
    for d in (1, 2, 4):
        mesh = make_mesh(d)
        rows = pack_host_shards(bases, d, K)
        capacity = max(2 * windows // (d * d) + 1, 1024)
        dev_rows = jax.device_put(
            rows, NamedSharding(mesh, P(SHARD_AXIS, None)))
        for arm in ("codes", "nox", "nocollapse", "full"):
            step = build(mesh, cfg, capacity, arm)
            r = step(dev_rows)
            np.asarray(r)  # compile+run
            ts = []
            for _ in range(5):
                t0 = time.time()
                np.asarray(step(dev_rows))
                ts.append(time.time() - t0)
            med = sorted(ts)[2]
            out[f"d{d}.{arm}"] = round(med * 1e3, 1)
            print(f"# d={d} {arm}: {med*1e3:.1f} ms "
                  f"(all {[round(t*1e3) for t in ts]})", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
