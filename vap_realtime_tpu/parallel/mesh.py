"""Device mesh + sharding helpers.

Parallelism story (SURVEY.md §2.7): the model is ~7M params, so the ONLY
parallel axes that matter are
- `dp`: data parallel — training batches and serving stream batches are
  sharded over all chips; params/optimizer state replicated; gradient
  psum over ICI inserted automatically by XLA from the shardings.
- serving: per-host stream sharding, collectives only for metrics.

No TP/PP/SP/EP by design (the reference has none and the model doesn't
need them; see SURVEY.md §2.7 table).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "dp") -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_batch(mesh: Mesh, tree: Any, axis_name: str = "dp") -> Any:
    """Shard every leaf's leading (batch/stream) axis over the mesh.

    Leaves whose leading dim is not divisible by the mesh size (e.g. a
    tiny test batch on an 8-device mesh) are replicated instead — XLA
    still partitions the compute it can."""
    n = mesh.devices.size

    def put(x):
        if x.ndim >= 1 and x.shape[0] % n == 0:
            spec = P(axis_name, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)
