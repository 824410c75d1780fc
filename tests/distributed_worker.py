"""Subprocess worker for tests/test_distributed.py (multi-host wiring).

Each invocation is one "host": 4 virtual CPU devices, joined into a
2-process JAX runtime (global mesh of 8).  Runs ONE fused train step of the
tiny DETR on its row-block of a deterministic global batch and prints the
(replicated) loss/grad-norm as JSON — the test compares them against the
same step computed single-process on the identical global batch.

Usage: python tests/distributed_worker.py <port> <process_id>
"""

import json
import os
import sys

# Env mutations must (a) precede jax backend init in worker mode and
# (b) NOT run when the test imports this module for its shared constants —
# the test process's backend initializes lazily and would pick up the
# 4-device flag meant for workers.
if __name__ == "__main__":
    # Standalone script (no installed package): resolve the repo root.
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from detr_tpu.config import DETRConfig, TrainingConfig  # noqa: E402
from detr_tpu.data import synthetic_batch  # noqa: E402
from detr_tpu.models import DETR  # noqa: E402
from detr_tpu.parallel import make_mesh, shard_batch, shard_state  # noqa: E402
from detr_tpu.parallel.distributed import (  # noqa: E402
    data_shard,
    initialize_distributed,
)
from detr_tpu.train import build_optimizer, create_train_state  # noqa: E402
from detr_tpu.train.train_step import build_criterion, make_train_step  # noqa: E402

TINY = dict(
    num_object_queries=8,
    num_encoder_layers=1,
    num_decoder_layers=2,
    num_attention_heads=2,
    hidden_size=16,
    ffn_scale_factor=2,
    dtype="float32",
    hidden_dropout_prob=0.0,  # bitwise-comparable across layouts
    attention_probs_dropout_prob=0.0,
)


def global_batch():
    return synthetic_batch(
        np.random.default_rng(0), batch_size=8, height=64, width=64, max_gt=8
    )


def main() -> int:
    port, process_id = int(sys.argv[1]), int(sys.argv[2])
    multi = initialize_distributed(f"localhost:{port}", 2, process_id)
    assert multi and jax.device_count() == 8, (
        jax.process_count(),
        jax.device_count(),
    )

    detr_config = DETRConfig(**TINY)
    train_config = TrainingConfig(
        cumulative_train_batch_size=8, train_batch_size=8, max_gt_boxes=8
    )
    model = DETR(detr_config)
    criterion = build_criterion(train_config, detr_config)
    tx, _ = build_optimizer(train_config)

    batch = global_batch()
    index, count = data_shard()
    bl = batch["image"].shape[0] // count
    local = {k: v[index * bl:(index + 1) * bl] for k, v in batch.items()}

    mesh = make_mesh()
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), {k: v[:1] for k, v in batch.items()}
    )
    state = shard_state(state, mesh)
    step = make_train_step(model, criterion, donate=False)
    _, metrics = step(state, shard_batch(local, mesh))
    print(
        json.dumps(
            {
                "process": process_id,
                "loss": float(metrics["loss"]),
                "grad_norm": float(metrics["grad_norm"]),
            }
        ),
        flush=True,
    )
    return 0


def main_tp() -> int:
    """One fused train step under 2 processes x (dp=4, tp=2): DP across
    "hosts", Megatron TP within each host's 4 virtual devices.  Prints the
    replicated loss/grad-norm; the test compares them against the same
    step computed single-process on an identical (8-device, tp=2) mesh."""
    from detr_tpu.parallel.tp import make_mesh_2d, shard_state_tp, validate_tp

    port, process_id = int(sys.argv[1]), int(sys.argv[2])
    multi = initialize_distributed(f"localhost:{port}", 2, process_id)
    assert multi and jax.device_count() == 8

    detr_config = DETRConfig(**TINY)
    train_config = TrainingConfig(
        cumulative_train_batch_size=8, train_batch_size=8, max_gt_boxes=8
    )
    model = DETR(detr_config)
    criterion = build_criterion(train_config, detr_config)
    tx, _ = build_optimizer(train_config)

    batch = global_batch()
    index, count = data_shard()
    bl = batch["image"].shape[0] // count
    local = {k: v[index * bl:(index + 1) * bl] for k, v in batch.items()}

    mesh = make_mesh_2d(model_parallel=2)
    validate_tp(detr_config, mesh)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), {k: v[:1] for k, v in batch.items()}
    )
    state = shard_state_tp(state, mesh)
    step = make_train_step(model, criterion, donate=False)
    _, metrics = step(state, shard_batch(local, mesh))
    print(
        json.dumps(
            {
                "process": process_id,
                "loss": float(metrics["loss"]),
                "grad_norm": float(metrics["grad_norm"]),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__" and not (len(sys.argv) > 3 and sys.argv[3] in ("trainer", "tp")):
    raise SystemExit(main())


if __name__ == "__main__" and len(sys.argv) > 3 and sys.argv[3] == "tp":
    raise SystemExit(main_tp())


def main_trainer() -> int:
    """End-to-end ``train_DETR`` under the 2-process runtime: sharded
    BucketedLoader (equal-batch-count quota), collective orbax checkpoint
    saves, and multi-process run_validation.  A regression for the two
    deadlock classes of multi-host training — batch-count skew at the
    gradient psum and primary-only orbax barriers."""
    port, process_id = int(sys.argv[1]), int(sys.argv[2])
    root, outdir = sys.argv[4], sys.argv[5]
    multi = initialize_distributed(f"localhost:{port}", 2, process_id)
    assert multi and jax.device_count() == 8

    from detr_tpu.train.trainer import train_DETR

    detr_config = DETRConfig(**TINY)
    config = TrainingConfig(
        coco_dataset_root=root,
        output_dir=outdir,
        train_batch_size=4,          # per process; global batch 8
        cumulative_train_batch_size=4,  # accumulation 1
        val_batch_size=8,
        epochs=2,
        eval_epochs=1,
        checkpoint_epochs=1,
        num_workers=0,
        shape_buckets=((64, 64),),
        eval_shape=(64, 64),
        max_gt_boxes=8,
        mixed_precision="no",
        watchdog_secs=0.0,
        log_frequency=1,
        save_image_epochs=1000,  # grids are host-side noise here
    )
    metrics = train_DETR(config, detr_config)
    print(
        json.dumps(
            {
                "process": process_id,
                "done": True,
                "ap": float(metrics.get("AP", -1.0)) if metrics else None,
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__" and len(sys.argv) > 3 and sys.argv[3] == "trainer":
    raise SystemExit(main_trainer())
