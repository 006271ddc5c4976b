"""Device mesh helpers.

The reference is single-host with goroutine pools (SURVEY.md §2.4); the
TPU-native scale-out axis is a 1-D device mesh of shards: genome text is
data-parallel across shards, k-mer sets are range-partitioned by code so
shard-local sorted sets concatenate into a globally sorted set.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shards"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SHARD_AXIS,))


def shard_spec() -> P:
    return P(SHARD_AXIS)


def sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(SHARD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
