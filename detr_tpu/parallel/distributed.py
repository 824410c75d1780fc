"""Multi-process (multi-host / pod-scale) wiring.

The reference tops out at single-host data parallelism — HF Accelerate
wraps torch DDP over however many local GPUs one process group sees
(reference detr/train.py:117-124) and its launcher pins one host
(train.sh:22).  On TPU pods the equivalent native layer is JAX's
multi-process runtime: one Python process per host, each seeing its local
chips, joined by ``jax.distributed.initialize`` so a single ``Mesh`` spans
every chip in the slice and GSPMD emits ICI/DCN collectives across hosts.

Division of labor (scaling-book recipe):
  * every process runs the same program and the same jitted step over the
    GLOBAL mesh;
  * input pipeline: each process loads only its shard of the dataset
    (``BucketedLoader(shard=...)``) and contributes its local rows via
    ``jax.make_array_from_process_local_data`` (mesh.shard_batch);
  * replicated state: same-seeded init (or a checkpoint restore) on every
    process, placed with a replicated sharding;
  * host-side effects (tensorboard, metric accumulation, image grids) run
    on process 0 only; orbax checkpointing is multihost-aware already
    (primary_host=0 writes metadata, every process writes its addressable
    shards — fully-replicated state means process 0 writes everything).

Launch (one command per host, standard TPU-VM environment):

    JAX_COORDINATOR=host0:8476 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
        python -m detr_tpu.train.trainer --coco-dataset-root ...

On actual Cloud TPU VMs the three variables can be omitted — a multi-host
slice is recognized from the TPU runtime's own topology env
(``TPU_WORKER_HOSTNAMES`` listing >1 host) and
``jax.distributed.initialize()`` then autodetects coordinator/process-id
from the TPU metadata server.  ``JAX_DISTRIBUTED=1`` forces the
autodetect attempt on other managed clusters (SLURM/MPI); the three
explicit env vars remain for CPU tests and hand-wired clusters.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Joins the JAX multi-process runtime when configured; idempotent.

    Sources, in precedence order: explicit args, then the
    ``JAX_COORDINATOR`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` env
    vars, then (on Cloud TPU) jax's own autodetection.  Returns True when
    the runtime is (now) multi-process.  A plain single-host run — no args,
    no env, not a managed TPU slice — skips initialization entirely and
    runs exactly as before.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Cloud-TPU autodetection path: on a managed multi-host slice the
        # TPU runtime exports the worker topology (TPU_WORKER_HOSTNAMES
        # lists every host); jax.distributed.initialize() with no args
        # reads the metadata server.  JAX_DISTRIBUTED=1 forces the
        # autodetect attempt on clusters that configure jax.distributed
        # through other means (SLURM, MPI — jax probes those too).  A
        # plain single-host run matches neither and skips initialization.
        worker_hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if os.environ.get("JAX_DISTRIBUTED") != "1" and "," not in worker_hosts:
            return False  # single-process mode, nothing to do
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _INITIALIZED = True
    logger.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns host-side effects (logs, eval, viz)."""
    return jax.process_index() == 0


def data_shard() -> tuple[int, int]:
    """(shard_index, shard_count) for per-process dataset sharding."""
    return jax.process_index(), jax.process_count()


def allgather_host(tree):
    """Gathers a process-local or data-sharded array tree onto every host.

    Used by validation: ``eval_step`` outputs are sharded along the data
    axis of a multi-host mesh, so their non-local shards are not
    addressable; PostProcess/mAP need the full arrays host-side.
    No-op-equivalent (device_get) in single-process mode.
    """
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    return jax.device_get(multihost_utils.process_allgather(tree, tiled=True))
