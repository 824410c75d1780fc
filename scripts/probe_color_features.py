"""Color-discriminability probe at a trained checkpoint (root-cause #4).

The proof runs' signature is: boxes learn (matched GIoU ~0.38 train AND
val) while the classifier sits at the constant-predictor optimum
(noobj_ce == -ln p_bg* and matched_ce == ln(0.73/80-ish) EXACTLY, both
measured from the live proof_mid3 tfevents).  Objectness is learnable from
luminance alone; CLASS on the synthetic palette task is pure color.  So
the question is whether the features the class head reads are
color-discriminative at all.

Three linear probes on the same matched GT population:
  P0 raw pixels   — median RGB at box center -> nearest palette (control,
                    known ~0.99 from scripts/check_label_alignment.py)
  P1 backbone     — layer4 feature vector at the GT box center cell
                    -> multinomial logistic regression -> class
  P2 decoder      — last-layer matched-query feature -> same probe

Readout:
  P1 ~ chance  => the from-scratch trunk never learned color-selective
                  filters: the classifier CANNOT lift regardless of LR —
                  root cause is upstream feature learning.
  P1 high, P2 ~ chance => color dies in encoder/decoder (attention mixes
                  it away / bottleneck).
  P2 high      => features fine; the class head/optimizer is the problem.

Usage: JAX_PLATFORMS=cpu python scripts/probe_color_features.py \
    [--seed-dir artifacts/proof_weights] [--batches 8]
"""

from __future__ import annotations

import argparse

import numpy as np


def softmax_probe(X, y, n_classes, iters=400, lr=0.5, l2=1e-4, seed=0):
    """Multinomial logistic regression, full-batch GD on standardized X.

    Returns (train_acc, test_acc) over a 75/25 split."""
    rng = np.random.default_rng(seed)
    n = len(y)
    perm = rng.permutation(n)
    X, y = X[perm], y[perm]
    mu, sd = X.mean(0), X.std(0) + 1e-6
    X = (X - mu) / sd
    k = int(n * 0.75)
    Xtr, ytr, Xte, yte = X[:k], y[:k], X[k:], y[k:]
    W = np.zeros((X.shape[1], n_classes), np.float64)
    b = np.zeros(n_classes, np.float64)
    onehot = np.eye(n_classes)[ytr]
    for _ in range(iters):
        logits = Xtr @ W + b
        logits -= logits.max(1, keepdims=True)
        p = np.exp(logits)
        p /= p.sum(1, keepdims=True)
        g = (p - onehot) / len(ytr)
        W -= lr * (Xtr.T @ g + l2 * W)
        b -= lr * g.sum(0)
    tr = float((np.argmax(Xtr @ W + b, 1) == ytr).mean())
    te = float((np.argmax(Xte @ W + b, 1) == yte).mean())
    return tr, te


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seed-dir", default="artifacts/proof_weights")
    ap.add_argument("--root", default="datasets/synth3k_dense")
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--random-init", action="store_true",
                    help="probe a RANDOM-init model instead (baseline)")
    ap.add_argument("--save-npz", default=None,
                    help="checkpoint collected features here per batch")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from detr_tpu.config import DETRConfig, TrainingConfig
    from detr_tpu.data.make_synthetic_coco import class_palette_uint8
    from detr_tpu.data.transforms import _NORM_BIAS, _NORM_SCALE
    from detr_tpu.models import DETR
    from detr_tpu.ops.image_norm import prepare_batch_image
    from detr_tpu.train.checkpoint import CheckpointManager
    from detr_tpu.train.train_step import (
        _targets_of_batch,
        build_criterion,
        create_train_state,
    )
    from detr_tpu.train.trainer import _canvas_map, _make_loaders

    # proof_mid3 config (ps-verified flags)
    config = TrainingConfig(
        coco_dataset_root=args.root,
        train_batch_size=8,
        cumulative_train_batch_size=16,
        val_batch_size=16,
        lr_backbone=3e-4,
        photometric_distort=False,
        bn_recalibrate_epochs=1,
        device_resize=True,
        shape_buckets=((768, 768), (512, 1024), (1024, 512)),
        max_gt_boxes=48,
        num_workers=0,
    )
    detr_config = DETRConfig(
        num_object_queries=50, num_attention_heads=4,
        hidden_size=128, ffn_scale_factor=8,
    )
    train_loader, _vl, num_classes, _ = _make_loaders(config, False)
    detr_config = detr_config.replace(num_classes=num_classes, dtype="bfloat16")
    model = DETR(detr_config)
    criterion = build_criterion(config, detr_config)
    canvases = _canvas_map(train_loader)

    it = iter(train_loader)
    sample = {k: jnp.asarray(v) for k, v in next(it).items() if k != "pad_count"}
    state = create_train_state(
        model, optax.adamw(1e-4), jax.random.PRNGKey(0), sample,
        canvas_map=canvases,
    )
    if not args.random_init:
        state = CheckpointManager(args.seed_dir).restore_params_only(state)
        print(f"restored weights from {args.seed_dir}")
    params, frozen = state.params, state.frozen
    pal = class_palette_uint8().astype(np.float32)

    def forward(batch):
        image = prepare_batch_image(batch, canvases)
        out, inter = model.apply(
            {"params": params, "frozen": frozen},
            image, batch["height"], batch["width"], True,
            capture_intermediates=lambda mdl, name: mdl.name in (
                "backbone", "decoder",
            ),
        )
        feats = inter["intermediates"]["backbone"]["__call__"][0]
        decoded = inter["intermediates"]["decoder"]["__call__"][0]
        qog = criterion.matcher(
            out["pred_logits"].astype(jnp.float32),
            out["pred_boxes"].astype(jnp.float32),
            jnp.broadcast_to(
                batch["class_idx"][:, None],
                (batch["class_idx"].shape[0], out["pred_logits"].shape[1],
                 batch["class_idx"].shape[1]),
            ),
            jnp.broadcast_to(
                batch["boxes_normalized"][:, None],
                (batch["class_idx"].shape[0], out["pred_logits"].shape[1],
                 batch["class_idx"].shape[1], 4),
            ),
            jnp.broadcast_to(
                batch["gt_valid"][:, None],
                (batch["class_idx"].shape[0], out["pred_logits"].shape[1],
                 batch["class_idx"].shape[1]),
            ),
        )
        return image, np.asarray(feats, np.float32), np.asarray(
            decoded[:, -1], np.float32
        ), np.asarray(qog[:, -1])

    X_bb, X_dec, y_all, pix_ok = [], [], [], 0
    save_path = args.save_npz
    for bi in range(args.batches):
        batch = {
            k: jnp.asarray(v) for k, v in next(it).items() if k != "pad_count"
        }
        image, feats, dec_last, qog_last = forward(batch)
        rgb = (np.asarray(image) + _NORM_BIAS) / _NORM_SCALE
        B, fh, fw, _c = feats.shape
        for b in range(B):
            h, w = int(batch["height"][b]), int(batch["width"][b])
            for g in range(batch["gt_valid"].shape[1]):
                if not bool(batch["gt_valid"][b, g]):
                    continue
                x0, y0, x1, y1 = np.asarray(batch["boxes_normalized"][b, g])
                cx, cy = (x0 + x1) / 2 * w, (y0 + y1) / 2 * h
                # P0: pixel control
                med = np.median(
                    rgb[b, max(0, int(cy) - 2): int(cy) + 3,
                        max(0, int(cx) - 2): int(cx) + 3].reshape(-1, 3),
                    axis=0,
                )
                want = int(batch["class_idx"][b, g])
                if int(np.argmin(((pal - med) ** 2).sum(1))) == want:
                    pix_ok += 1
                # P1: backbone cell at center (stride = canvas/feat grid)
                stride_y = image.shape[1] / fh
                stride_x = image.shape[2] / fw
                fy = min(fh - 1, int(cy / stride_y))
                fx = min(fw - 1, int(cx / stride_x))
                X_bb.append(feats[b, fy, fx])
                # P2: matched decoder query feature
                q = int(qog_last[b, g])
                X_dec.append(dec_last[b, max(q, 0)])
                y_all.append(want)
        print(f"batch {bi}: collected {len(y_all)} GT so far", flush=True)
        if save_path:
            # checkpoint the population every batch: the axon transport
            # can drop mid-run and feature collection is the expensive part
            np.savez(
                save_path,
                X_bb=np.stack(X_bb), X_dec=np.stack(X_dec),
                y=np.array(y_all), pix_ok=pix_ok,
            )

    y = np.array(y_all)
    n = len(y)
    print(f"\npopulation: {n} matched GT, {len(np.unique(y))} classes present")
    print(f"P0 pixel control: acc={pix_ok / n:.3f} (chance={1/80:.3f})")
    tr, te = softmax_probe(np.stack(X_bb), y, num_classes)
    print(f"P1 backbone-center linear probe: train={tr:.3f} test={te:.3f}")
    tr, te = softmax_probe(np.stack(X_dec), y, num_classes)
    print(f"P2 decoder-matched-query linear probe: train={tr:.3f} test={te:.3f}")


if __name__ == "__main__":
    main()
