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


# ---------------------------------------------------------------------------
# Multi-host (DCN) support - stream farms beyond one host's chips.
# ---------------------------------------------------------------------------

def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize ``jax.distributed`` for multi-host meshes.

    Arguments fall back to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``; on Cloud TPU pods
    ``jax.distributed.initialize()`` auto-discovers all three).  Returns True
    when a multi-process runtime is active afterwards, False when running
    single-process (no coordinator configured) - callers can treat False as
    "single host, proceed locally".  Safe to call twice.
    """
    import os

    if jax.process_count() > 1:
        return True
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        # no coordinator configured -> single-host run.  (Deliberately no
        # magic auto-detect: runtime plugins set TPU worker env vars even in
        # single-host sandboxes, and jax.distributed.initialize must not be
        # attempted after the backend is live.)
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError as e:            # already initialized
        if "already" not in str(e):
            raise
    return jax.process_count() > 1


def create_hybrid_mesh(data_axis: str = "data", host_axis: str = "host",
                       devices: list | None = None) -> Mesh:
    """A 2D (host, data) mesh: the host axis maps to DCN, the data axis to
    ICI within each host - so per-host collectives (the common case for
    stream-parallel inference) never touch the slow cross-host links.

    Single-process runs get a (1, N) mesh with the same axis names, so
    downstream sharding code (``P((host_axis, data_axis))`` on the batch dim)
    is uniform across both deployments.
    """
    if jax.process_count() > 1 and devices is None:
        from jax.experimental import mesh_utils

        per_host = jax.local_device_count()
        devs = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per_host),
            dcn_mesh_shape=(jax.process_count(), 1),
        )
        return Mesh(devs, (host_axis, data_axis))
    devs = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devs).reshape(1, len(devs)), (host_axis, data_axis))


def global_batch_spec(mesh: Mesh, data_axis: str = "data",
                      host_axis: str = "host") -> NamedSharding:
    """Shard a batch's leading dim over BOTH mesh axes (host-major): each
    host gets a contiguous block of the global batch, split over its chips."""
    return NamedSharding(mesh, P((host_axis, data_axis)))
