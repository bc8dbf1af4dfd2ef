"""Multi-host initialization + stream-sharded serving helpers.

Replaces the reference's implicit Lightning-DDP/NCCL backend
(train/train.py:316-321) with `jax.distributed` + XLA collectives:

- training: one process per host; after `init_distributed()` the global
  mesh spans all hosts, dp gradients all-reduce over ICI within a slice
  and DCN across slices — inserted by XLA from the shardings.
- serving: streams are host-local (each host runs its own arena/server;
  any TCP load balancer fronts them).  Collectives are used ONLY for
  fleet metrics aggregation (`all_host_metrics`).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.experimental.multihost_utils as multihost_utils
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed (no-op on a single process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly for manual/DCN setups.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def all_host_metrics(local: Dict[str, float]) -> Dict[str, float]:
    """Sum scalar metrics across all hosts (psum over all devices).

    Use for fleet-level telemetry (total active streams, frames/s);
    the serving data path itself never crosses hosts.
    """
    keys = sorted(local)
    vals = jax.numpy.asarray([float(local[k]) for k in keys])
    summed = multihost_utils.process_allgather(vals)
    total = np.asarray(summed).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, total)}


def global_batch(mesh, tree, axis_name: str = "dp"):
    """Assemble a GLOBAL dp-sharded batch from each process's local
    shard (multi-controller analogue of mesh.shard_batch): every process
    passes its own local leaves; the returned global arrays span all
    hosts' devices along the leading axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))

    return jax.tree_util.tree_map(put, tree)
