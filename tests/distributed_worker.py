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


if __name__ == "__main__":
    main()
