"""Multi-host orchestration: sharded ingest + pod-slice k-mer sets.

The reference is strictly single-host; its beyond-RAM story is chunk
files on disk (SURVEY.md §2.4, §3.2).  The TPU-native scale-out:

  * every host runs the same program under `jax.distributed.initialize`
    (initialize() below); the global mesh spans all hosts' devices.
  * ingest is host-sharded: each host reads only its slice of the input
    file list (partition_files) and packs it locally.
  * the sharded set build (parallel/sharded.py) already expresses the
    cross-device all_to_all repartition with jax collectives, so the
    SAME jitted program scales from 1 chip to a pod slice: XLA routes
    the all_to_all over ICI within a slice and DCN across slices.
  * results stay range-partitioned: shard i of the mesh owns code range
    [i, i+1) * 2^code_bits / D, so per-shard outputs concatenate into a
    globally sorted set, and each host can serialize its shards to its
    own `.unik` chunk files (merge-compatible with `merge -D`).

Only one real chip is reachable in this build environment, so the
multi-host path is validated on virtual CPU meshes (tests +
__graft_entry__.dryrun_multichip); the collective program is identical.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.log import log


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize wrapper; no-op when single-process.

    Arguments default from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID so launchers can configure via environment.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return  # single-process
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        f"distributed: process {process_id}/{num_processes} @ {coordinator_address}"
    )


def partition_files(files: list[str], num_hosts: int, host_id: int) -> list[str]:
    """Deterministic host-sharded ingest: host i reads files i, i+H, ..."""
    return files[host_id::num_hosts]


def partition_bases(bases: np.ndarray, num_hosts: int, host_id: int, k: int):
    """Split one large packed base array across hosts with a k-1 halo
    (same ownership rule as parallel.sharded.pack_host_shards)."""
    n = len(bases)
    per = -(-n // num_hosts)
    lo = host_id * per
    hi = min(lo + per + k - 1, n)
    own = min(per, max(n - lo, 0))
    return bases[lo:hi], own


def sharded_count_distinct(files: list[str], cfg, mesh, capacity: int,
                           circular: bool = False, row_len: int | None = None):
    """End-to-end sharded count over ``files`` on a (possibly multi-host)
    mesh.

    Single-process: this host packs rows for every shard.  Multi-process:
    each host reads its slice of the file list, packs rows for ITS mesh
    shards only, and the global input array is assembled with
    jax.make_array_from_process_local_data — the jitted all_to_all then
    redistributes by code range exactly as on one host.  ``row_len``
    fixes the (static, globally agreed) row length in the multi-process
    case, where hosts cannot infer each other's input sizes.

    Returns (codes_per_shard (D, C*D) sentinel-padded sorted, counts (D,),
    dropped, n_sent_real); with multiple processes each host addresses
    only its own shards of the result.
    """
    import jax

    from ..io.fastx import pack_files
    from ..ops.codec import INVALID_BASE
    from ..parallel.mesh import SHARD_AXIS
    from ..parallel.sharded import build_sharded_distinct, pack_host_shards

    n_shards = mesh.shape[SHARD_AXIS]
    num_hosts = jax.process_count()
    host_id = jax.process_index()
    my_files = partition_files(files, num_hosts, host_id)
    packed = pack_files(my_files, cfg.k, circular)
    step = build_sharded_distinct(mesh, cfg, capacity)
    if num_hosts == 1:
        return step(pack_host_shards(packed.bases, n_shards, cfg.k))

    from jax.sharding import NamedSharding, PartitionSpec as P

    if row_len is None:
        raise ValueError("multi-process sharded count needs an agreed row_len")
    if n_shards % num_hosts:
        raise ValueError("mesh size must be a multiple of the host count")
    n_local = n_shards // num_hosts
    local = pack_host_shards(packed.bases, n_local, cfg.k)
    if local.shape[1] > row_len:
        raise ValueError(
            f"host {host_id} rows need {local.shape[1]} > row_len {row_len}"
        )
    rows = np.full((n_local, row_len), INVALID_BASE, np.uint8)
    rows[:, : local.shape[1]] = local
    sharding = NamedSharding(mesh, P(SHARD_AXIS, None))
    global_rows = jax.make_array_from_process_local_data(
        sharding, rows, (n_shards, row_len)
    )
    return step(global_rows)
