"""Device mesh setup and sharding helpers.

The framework scales by data parallelism over a ("data",) mesh axis plus an
optional "graph" axis that shards the residue (L) dimension; XLA/GSPMD
inserts the ICI collectives (all-gather for the global k-NN, psum for grads)
— no hand-written NCCL analog (the reference is strictly single-device;
SURVEY.md §2.3). Multi-host initialization goes through
`jax.distributed.initialize` (see `initialize_distributed`).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, graph_axis: int = 1,
              devices=None) -> Mesh:
    """Mesh with axes ("data", "graph"). graph_axis=1 -> pure DP."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % graph_axis == 0, (n, graph_axis)
    arr = np.asarray(devices).reshape(n // graph_axis, graph_axis)
    return Mesh(arr, axis_names=("data", "graph"))


def batch_sharding(mesh: Mesh, shard_length: bool = False) -> NamedSharding:
    """Batch arrays are sharded on the leading (B) dim over "data" and
    optionally on the residue (L) dim over "graph"."""
    if shard_length:
        return NamedSharding(mesh, P("data", "graph"))
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Dict, mesh: Mesh, shard_length: bool = False) -> Dict:
    """Place a host batch dict onto the mesh. Rank-1+ leading-dim sharding;
    scalars/metadata pass through replicated."""
    out = {}
    for k, v in batch.items():
        if not hasattr(v, "ndim"):
            out[k] = v
            continue
        if v.ndim >= 2 and shard_length:
            spec = P("data", "graph")
        elif v.ndim >= 1:
            spec = P("data")
        else:
            spec = P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sync_batch_length(np_batch: Dict) -> Dict:
    """Multi-host per-host feed: hosts collate their local batch slices
    independently, so their L buckets can disagree (each host buckets its
    own longest structure). Allgather the local L and re-pad every host to
    the global max so make_array_from_process_local_data sees one global
    shape. One tiny (int32) collective per batch."""
    if jax.process_count() <= 1:
        return np_batch
    from jax.experimental import multihost_utils

    from ..train.collate import repad_length

    L_local = int(np_batch["S"].shape[1])
    all_L = np.asarray(multihost_utils.process_allgather(
        np.int32(L_local)))
    return repad_length(np_batch, int(all_L.max()))


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up (per-host launcher calls this before make_mesh);
    no-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
