"""Worker for test_distributed_twoproc: one process of a 2-process
jax.distributed CPU run of pipeline.distributed.sharded_count_distinct.

Usage: python distributed_worker.py <process_id> <port> <fa0> <fa1>
Prints one JSON line with this process's addressable result shards.
"""

import json
import os
import sys


def main():
    pid, port, fa0, fa1 = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["UNIKMER_TPU_PLATFORM"] = "cpu"
    import unikmer_tpu  # noqa: F401
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    import numpy as np
    from jax.sharding import Mesh

    from unikmer_tpu.models.count import CountConfig
    from unikmer_tpu.ops.codec import CODE_SENTINEL
    from unikmer_tpu.parallel.mesh import SHARD_AXIS
    from unikmer_tpu.pipeline.distributed import sharded_count_distinct

    mesh = Mesh(np.array(jax.devices()), (SHARD_AXIS,))
    cfg = CountConfig(k=11, canonical=True)
    out, counts, dropped, _sent = sharded_count_distinct(
        [fa0, fa1], cfg, mesh, capacity=2048, row_len=4096
    )
    shards = {}
    for s in out.addressable_shards:
        row = np.asarray(s.data)[0]
        codes = row[row != np.uint64(CODE_SENTINEL)]
        shards[int(s.index[0].start)] = [int(c) for c in codes]
    total_dropped = int(np.asarray(dropped.addressable_shards[0].data)[0])
    print("RESULT " + json.dumps(
        {"pid": pid, "shards": shards, "dropped": total_dropped}
    ), flush=True)

    # taxid arm: packed-key all_to_all + tiered-LCA collapse ACROSS
    # PROCESSES (build_sharded_taxids).  Deterministic synthetic data:
    # both processes compute the same global rows and supply their own.
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unikmer_tpu.parallel.sharded import (
        build_sharded_taxids, pack_host_rows, pack_host_shards,
    )
    from unikmer_tpu.taxonomy.lca import compact_ids, device_lca_plan
    from unikmer_tpu.taxonomy.taxdump import Taxonomy

    tax = Taxonomy(
        parent=np.array([0, 1, 1, 1, 2, 2], np.uint32),
        depth=np.array([-1, 0, 1, 1, 2, 2], np.int16),
        rank_ids=np.full(6, -1, np.int16), ranks=[],
    )
    rng = np.random.default_rng(99)
    tb = rng.integers(0, 4, 3000).astype(np.uint8)
    ptax = rng.integers(1, 6, 3000).astype(np.uint32)
    kind, closure, tab = device_lca_plan(tax, np.arange(6, dtype=np.uint32))
    ids = compact_ids(closure, ptax).astype(np.int32)
    k2 = 11
    rows = pack_host_shards(tb, 4, k2)
    trows = pack_host_rows(ids, 4, 0, k2 - 1, np.int32(0))
    cap2 = 2048
    step2 = build_sharded_taxids(
        mesh, CountConfig(k=k2, canonical=True), cap2, len(closure),
        2 * k2, (cap2 * 4).bit_length(), kind,
    )
    sharding = NamedSharding(mesh, P(SHARD_AXIS, None))
    g_rows = jax.make_array_from_process_local_data(
        sharding, rows[2 * pid: 2 * pid + 2], rows.shape)
    g_trows = jax.make_array_from_process_local_data(
        sharding, trows[2 * pid: 2 * pid + 2], trows.shape)
    out_c, out_t, n2, dropped2 = step2(g_rows, g_trows, tab)
    shards2 = {}
    counts2 = {int(s.index[0].start): int(np.asarray(s.data)[0])
               for s in n2.addressable_shards}
    for s in out_c.addressable_shards:
        i = int(s.index[0].start)
        shards2[i] = [int(c) for c in np.asarray(s.data)[0][: counts2[i]]]
    tshards2 = {}
    for s in out_t.addressable_shards:
        i = int(s.index[0].start)
        tshards2[i] = [int(closure[x])
                       for x in np.asarray(s.data)[0][: counts2[i]]]
    print("RESULT2 " + json.dumps({
        "pid": pid, "shards": shards2, "taxids": tshards2,
        "dropped": int(np.asarray(dropped2.addressable_shards[0].data)[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
