#!/usr/bin/env bash
# Launcher (reference train.sh equivalent): full COCO training run on the
# attached TPU. Single-host multi-chip scales automatically via the data mesh
# (--num-devices 0 = all visible chips); no accelerate/NCCL launcher needed.
set -euo pipefail

OUTPUT_DIR=${OUTPUT_DIR:-runs/detr-r50}
COCO_ROOT=${COCO_ROOT:-datasets/coco-2017}

python -m detr_tpu.train.trainer \
  --output-dir "$OUTPUT_DIR" \
  --coco-dataset-root "$COCO_ROOT" \
  --epochs 100 \
  --lr-warmup-epochs 5 \
  --lr-hold-max-epochs 35

# Debug variants (reference train.sh:8-21):
# python -m detr_tpu.train.trainer --synthetic --epochs 2 --limit-train-iters 10 --limit-val-iters 2 --output-dir /tmp/detr-smoke
# python -m detr_tpu.train.trainer --resume-from-checkpoint "$OUTPUT_DIR" --start-epoch 50 --epochs 100

# Multi-host (pod slice): run the SAME command on every host. On Cloud TPU
# VMs the slice is recognized from TPU_WORKER_HOSTNAMES and
# jax.distributed autodetects coordinator/process-id from the metadata
# server (JAX_DISTRIBUTED=1 forces the attempt on SLURM/MPI clusters);
# elsewhere set the trio explicitly (parallel/distributed.py):
#   JAX_COORDINATOR=host0:8476 JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i ./train.sh
# Each process loads a disjoint dataset shard (equal per-epoch batch
# counts are guaranteed — data/loader.py quota); --train-batch-size is PER
# PROCESS. Every process participates in the (collective) orbax
# checkpoint save against a SHARED filesystem; tensorboard/mAP/grids are
# process-0 work.
