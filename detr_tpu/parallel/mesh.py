"""Device mesh + sharding helpers (data parallelism over ICI).

TPU-native replacement for the reference's NCCL-via-Accelerate distribution
(reference detr/train.py:117-124,218-220; SURVEY §2.3): a 1-D
``jax.sharding.Mesh`` with a ``data`` axis; batches are sharded along it,
parameters and optimizer state are replicated, and XLA emits the gradient
all-reduce over ICI inside the single jitted train step — there is no
NCCL-analog code to write.

The same step compiles for one chip (trivial mesh) or a pod slice; the
driver's multi-chip dry run exercises it on a virtual CPU mesh
(``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices

    (all GLOBAL devices when 0 — in a multi-process run this spans every
    host's chips and the jitted step's gradient psum rides ICI/DCN)."""
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batch arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """Places a host batch onto the mesh, sharded along the data axis.

    Single-process: a plain sharded device_put.  Multi-process (the mesh
    spans several hosts): ``batch`` is this process's LOCAL rows — its
    shard of the per-process-sharded dataset — and the global array is
    assembled from every process's contribution; the global batch size is
    local_batch * process_count.
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Replicates a TrainState (params/opt state) across the mesh.

    In a multi-process run every process must hold the same host values
    (same-seed init or a shared checkpoint restore) — the replicated
    placement trusts, and asserts nothing about, that agreement, exactly
    like torch DDP's same-seed contract.
    """
    r = replicate(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                r, np.asarray(x)
            ),
            state,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), state)


def assert_divisible(batch_size: int, mesh: Mesh, axis: str = DATA_AXIS) -> None:
    n = mesh.shape[axis]
    if batch_size % n != 0:
        raise ValueError(
            f"global batch {batch_size} not divisible by mesh axis {axis}={n}"
        )
