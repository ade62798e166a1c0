"""Device-mesh and sharding helpers.

The reference has NO distributed layer (single process, single GPU, batch=1 -
SURVEY.md 2.3); this module is the TPU-native scaling substrate it lacks:
a ``jax.sharding.Mesh`` over the chips with data/stream-parallel sharding via
``NamedSharding`` + jit.  XLA inserts the ICI collectives; no NCCL/MPI analog
is needed.

Conventions:
  * axis ``"data"`` - batch / stream parallelism (the scaling axis for this
    workload: YOLOv8s fits per-chip trivially, so TP/PP are out of scope by
    design - SURVEY.md 2.3);
  * params/tracker-free state are replicated; batches are sharded on dim 0.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: int | None = None, axis: str = "data",
                devices: list | None = None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    n = num_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, only {len(devs)} available")
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every leaf of a batch pytree along its leading dimension."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(batch, sharding)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params, opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_spec(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
