"""Interrogate a committed weights seed (artifacts/proof_weights) at the
mid2 cert config: why is val loss flat at ~59 while train loss fell to ~37?

Decisive experiments, each isolating one hypothesis:
  1. MODE GAP: loss on the SAME train batch, train mode (dropout on) vs
     deterministic.  Big gap => dropout-dependent degenerate basin again.
  2. DATA GAP: deterministic loss train batch vs val batch.  Train low +
     val high => memorization; both high => the "train loss" the trainer
     logs is a dropout artifact.
  3. Liftoff diags on val (matched CE / nonbg_frac / matched GIoU).
  4. Class-argmax histogram (collapse check).
  5. BN freshness: recalibrate frozen stats from current weights, re-run
     val loss.  Big change => stats stale despite --bn-recalibrate-epochs.

Usage: python scripts/diagnose_seed.py [--seed-dir artifacts/proof_weights]
"""

from __future__ import annotations

import argparse
import collections

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed-dir", default="artifacts/proof_weights")
    ap.add_argument("--root", default="datasets/synth3k_dense")
    ap.add_argument("--val-batches", type=int, default=3)
    ap.add_argument("--train-batches", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from detr_tpu.config import DETRConfig, TrainingConfig
    from detr_tpu.losses.criterion import total_loss
    from detr_tpu.models import DETR, calibrate_frozen_bn
    from detr_tpu.ops.image_norm import prepare_batch_image
    from detr_tpu.train.checkpoint import CheckpointManager
    from detr_tpu.train.train_step import (
        _targets_of_batch,
        build_criterion,
        create_train_state,
    )
    from detr_tpu.train.trainer import _canvas_map, _make_loaders
    import optax

    # Mirror the mid2 cert run's config (scripts/watch_and_resume.sh).
    config = TrainingConfig(
        coco_dataset_root=args.root,
        train_batch_size=8,
        cumulative_train_batch_size=16,
        val_batch_size=16,
        lr_backbone=3e-4,
        photometric_distort=False,
        bn_recalibrate_epochs=1,
        shape_buckets=((768, 768), (512, 1024), (1024, 512)),
        max_gt_boxes=48,
        num_workers=0,
    )
    detr_config = DETRConfig(
        num_object_queries=50,
        num_attention_heads=4,
        hidden_size=128,
        ffn_scale_factor=8,
    )

    train_loader, val_loader, num_classes, _ = _make_loaders(config, False)
    detr_config = detr_config.replace(num_classes=num_classes, dtype="bfloat16")
    model = DETR(detr_config)
    criterion = build_criterion(config, detr_config)
    train_canvases = _canvas_map(train_loader)
    eval_canvases = _canvas_map(val_loader)

    sample = next(iter(train_loader))
    sample = {k: jnp.asarray(v) for k, v in sample.items() if k != "pad_count"}
    tx = optax.adamw(1e-4)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), sample, canvas_map=train_canvases
    )
    src = CheckpointManager(args.seed_dir)
    state = src.restore_params_only(state)
    print(f"restored weights from {args.seed_dir}")
    params, frozen = state.params, state.frozen

    def loss_and_diag(batch, canvases, deterministic, drop_seed=0):
        image = prepare_batch_image(batch, canvases)
        kwargs = {}
        if not deterministic:
            kwargs = {"rngs": {"dropout": jax.random.PRNGKey(drop_seed)}}
        out = model.apply(
            {"params": params, "frozen": frozen},
            image, batch["height"], batch["width"], deterministic, **kwargs,
        )
        ld = criterion(out, _targets_of_batch(batch))
        return total_loss(ld), ld, out

    def fmt(ld):
        keys = [
            "loss_label_ce", "loss_l1_bbox", "loss_giou", "cardinality_error",
            "diag_matched_ce", "diag_noobj_ce", "diag_nonbg_frac",
            "diag_matched_giou", "class_error",
        ]
        return "  ".join(f"{k}={float(ld[k]):.3f}" for k in keys if k in ld)

    # ---- experiment 1+2: mode gap and data gap ----
    print("\n=== train batches ===")
    tit = iter(train_loader)
    for i in range(args.train_batches):
        b = {k: jnp.asarray(v) for k, v in next(tit).items() if k != "pad_count"}
        lt, ldt, _ = loss_and_diag(b, train_canvases, deterministic=False, drop_seed=i)
        ld_, ldd, _ = loss_and_diag(b, train_canvases, deterministic=True)
        print(f"[train {i}] dropout={float(lt):7.3f}  determ={float(ld_):7.3f}")
        print(f"  determ: {fmt(ldd)}")

    print("\n=== val batches (deterministic, eval wire) ===")
    hist: collections.Counter = collections.Counter()
    vit = iter(val_loader)
    val_losses = []
    for i in range(args.val_batches):
        b = {k: jnp.asarray(v) for k, v in next(vit).items() if k != "pad_count"}
        lv, ldv, out = loss_and_diag(b, eval_canvases, deterministic=True)
        val_losses.append(float(lv))
        print(f"[val {i}] determ={float(lv):7.3f}")
        print(f"  {fmt(ldv)}")
        arg = np.asarray(jnp.argmax(out["pred_logits"][:, -1], axis=-1)).ravel()
        hist.update(arg.tolist())

    print("\nargmax class histogram (val, last layer): "
          f"{dict(sorted(hist.items(), key=lambda kv: -kv[1])[:8])} "
          f"(no-object id = {num_classes})")

    # ---- experiment 5: BN freshness ----
    print("\n=== BN recalibration check ===")
    img = prepare_batch_image(sample, train_canvases)
    cal = calibrate_frozen_bn(detr_config, {"params": params, "frozen": frozen}, img)
    # stat drift magnitude
    drift = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), frozen, cal["frozen"]
    )
    mx = max(jax.tree_util.tree_leaves(drift)) if jax.tree_util.tree_leaves(drift) else 0.0
    print(f"max |frozen stat drift| after recalibration: {mx:.4f}")
    frozen2 = cal["frozen"]
    vit = iter(val_loader)
    b = {k: jnp.asarray(v) for k, v in next(vit).items() if k != "pad_count"}
    image = prepare_batch_image(b, eval_canvases)
    out = model.apply(
        {"params": params, "frozen": frozen2}, image, b["height"], b["width"], True
    )
    ld = criterion(out, _targets_of_batch(b))
    print(f"val batch 0 loss with RECALIBRATED stats: {float(total_loss(ld)):.3f} "
          f"(was {val_losses[0]:.3f})")

    # ---- activation magnitude probe ----
    print("\n=== activation magnitudes (val batch 0) ===")
    _, inter = model.apply(
        {"params": params, "frozen": frozen}, image, b["height"], b["width"], True,
        capture_intermediates=lambda mdl, name: name in ("__call__",),
    )
    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    seen = set()
    for path, v in flat:
        if not hasattr(v, "shape"):
            continue
        name = "/".join(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        top = "/".join(name.split("/")[1:3])
        if top in seen:
            continue
        seen.add(top)
        print(f"  {name[:70]:70s} max|x|={float(jnp.max(jnp.abs(v))):.3e}")


if __name__ == "__main__":
    main()
