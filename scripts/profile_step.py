"""Per-op step-time breakdown for the fused train step (real TPU).

Captures a ``jax.profiler`` trace of N train-step dispatches and aggregates
device-side op durations, printing a ms/step table — the tool behind
PARITY.md's "where the step time goes" sections (round-2 verdict weak #1:
attribute the step-time residual, give DC5 its own breakdown).

Axon-tunnel specifics (see .claude/skills/verify): the trace rides the
relay fine; aggregate ``ph == "X"`` events on the TPU pid.  Fusion display
names lie — map the top entries back to sources by grepping the dumped HLO
(--dump-hlo) for ``metadata={op_name=...}``.

Usage:
    python scripts/profile_step.py [--config r50|dc5|r101] [--steps 10]
        [--trace-dir /tmp/jxtrace] [--dump-hlo /tmp/step.hlo] [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

import numpy as np


def build_step(cfg_name: str):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from detr_tpu.config import DETRConfig, TrainingConfig
    from detr_tpu.data import synthetic_batch
    from detr_tpu.models import DETR
    from detr_tpu.train import build_optimizer, create_train_state
    from detr_tpu.train.train_step import build_criterion, make_train_step

    if cfg_name == "r50":
        batch_size, height, width = 8, 800, 800
        detr_config = DETRConfig(dtype="bfloat16")
    elif cfg_name == "dc5":
        batch_size, height, width = 2, 800, 1344
        detr_config = DETRConfig(dtype="bfloat16", dilation=True)
    elif cfg_name == "r101":
        batch_size, height, width = 4, 800, 800
        detr_config = DETRConfig(
            dtype="bfloat16", backbone="resnet101", num_object_queries=300
        )
    else:
        raise SystemExit(f"unknown --config {cfg_name!r}")

    train_config = TrainingConfig(
        cumulative_train_batch_size=batch_size, train_batch_size=batch_size
    )
    model = DETR(detr_config)
    criterion = build_criterion(train_config, detr_config)
    tx, _ = build_optimizer(train_config)

    def make_batch(seed):
        return {
            k: jnp.asarray(v)
            for k, v in synthetic_batch(
                np.random.default_rng(seed),
                batch_size=batch_size,
                height=height,
                width=width,
                max_gt=25,
            ).items()
        }

    state = create_train_state(model, tx, jax.random.PRNGKey(0), make_batch(1))
    step = make_train_step(model, criterion, donate=False)
    return step, state, make_batch, batch_size


def aggregate_trace(trace_dir: str, steps: int, top: int) -> None:
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # Device events live on the TPU process; find pids whose process_name
    # mentions TPU (fallback: every non-python pid with "X" events).
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {
        p for p, n in pid_names.items() if "tpu" in n.lower() or "/device" in n.lower()
    }
    if not tpu_pids:
        tpu_pids = {
            p
            for p, n in pid_names.items()
            if "python" not in n.lower() and "host" not in n.lower()
        }

    total_by_name: dict[str, float] = {}
    grand = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            dur = float(e.get("dur", 0.0))  # microseconds
            name = e.get("name", "?")
            total_by_name[name] = total_by_name.get(name, 0.0) + dur
            grand += dur
    print(f"# trace: {paths[-1]}")
    print(f"# device pids: {sorted(tpu_pids)} ({[pid_names.get(p) for p in sorted(tpu_pids)]})")
    print(f"# total device time: {grand / 1e3 / steps:.2f} ms/step over {steps} steps\n")
    print(f"{'ms/step':>9}  {'%':>5}  op")
    for name, us in sorted(total_by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us / 1e3 / steps:9.3f}  {100 * us / grand:5.1f}  {name}")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="r50")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--trace-dir", default="/tmp/jxtrace")
    ap.add_argument("--dump-hlo", default=None)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument(
        "--parse-only", action="store_true",
        help="skip capture; aggregate the newest trace in --trace-dir",
    )
    args = ap.parse_args()

    if not args.parse_only:
        import jax

        step, state, make_batch, _bs = build_step(args.config)
        state, m = step(state, make_batch(2))  # compile + warm
        _ = float(m["loss"])
        if args.dump_hlo:
            txt = step.lower(state, make_batch(2)).compile().as_text()
            with open(args.dump_hlo, "w") as f:
                f.write(txt)
            print(f"wrote HLO ({len(txt)} bytes) to {args.dump_hlo}", file=sys.stderr)
        with jax.profiler.trace(args.trace_dir):
            for i in range(args.steps):
                state, m = step(state, make_batch(3 + i))
            _ = float(m["loss"])  # materialize inside the trace window
    aggregate_trace(args.trace_dir, args.steps, args.top)
    return 0


if __name__ == "__main__":
    from detr_tpu.utils.chip_pause import request_chip_pause

    with request_chip_pause():  # single-chip arbitration vs a live trainer
        raise SystemExit(main())
