"""Dev harness: checkpoint -> forward -> loss -> PostProcess -> mAP -> grids.

Script equivalent of the reference's ``notebooks/dev-model.ipynb`` smoke
harness (SURVEY §4.1): load (or initialize) a DETR model, run a small batch
through forward + matcher + criterion + post-processing + metrics, and write
detection grids to PNG.

Usage:
  python -m examples.dev_model [--checkpoint runs/detr] [--out /tmp/dev_model]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from detr_tpu.config import DETRConfig, TrainingConfig
from detr_tpu.data import synthetic_batch
from detr_tpu.eval import DetectionMetrics, PostProcess
from detr_tpu.models import DETR
from detr_tpu.train.checkpoint import CheckpointManager
from detr_tpu.train.train_step import _targets_of_batch, build_criterion
from detr_tpu.viz import plot_grid


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--out", type=str, default="/tmp/dev_model")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    detr_config = DETRConfig()
    model = DETR(detr_config)
    criterion = build_criterion(TrainingConfig(), detr_config)
    class_names = [f"class_{i}" for i in range(detr_config.num_classes)]

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            np.random.default_rng(0), batch_size=2, height=640, width=640
        ).items()
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["image"], batch["height"], batch["width"]
    )

    if args.checkpoint:
        from detr_tpu.train.train_step import TrainState
        import optax

        state = TrainState(
            step=jnp.int32(0),
            params=variables["params"],
            frozen=variables.get("frozen", {}),
            opt_state=optax.sgd(0.0).init(variables["params"]),
            rng=jax.random.PRNGKey(0),
            tx=optax.sgd(0.0),
        )
        state = CheckpointManager(args.checkpoint).restore_params_only(state)
        variables = {"params": state.params, "frozen": state.frozen}

    outputs = jax.jit(model.apply)(
        variables, batch["image"], batch["height"], batch["width"]
    )
    print("pred_logits:", outputs["pred_logits"].shape)

    loss_dict = criterion(outputs, _targets_of_batch(batch))
    for k, v in sorted(loss_dict.items()):
        print(f"  {k}: {float(v):.4f}")

    post = PostProcess(class_names)
    preds = post(
        outputs["pred_logits"][:, -1],
        outputs["pred_boxes"][:, -1],
        batch["height"],
        batch["width"],
        score_threshold=0.1,
    )
    metrics = DetectionMetrics(class_names)
    metrics.update(preds, {k: np.asarray(v) for k, v in batch.items()})
    result = metrics.compute()
    print("AP:", result["AP"], "AP50:", result["AP50"])

    items = [
        {"image": np.asarray(batch["image"][i]), "boxes": preds[i]["boxes"],
         "scores": preds[i]["scores"]}
        for i in range(len(preds))
    ]
    grid = plot_grid(items, box_color="red")
    Image.fromarray(grid).save(os.path.join(args.out, "predictions.png"))
    print("wrote", os.path.join(args.out, "predictions.png"))


if __name__ == "__main__":
    main()
