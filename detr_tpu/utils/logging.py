"""Observability: tensorboard metric writer with the reference panel taxonomy.

Reproduces the reference's tensorboard layout (detr/train.py:327-355
``format_loss_for_logging``): per-loss panels with train/val curves,
per-decoder-layer loss panels (genuinely useful for DETR debugging —
SURVEY §5), cardinality-error panels, classification error, learning rates,
and GT/prediction image grids.

Backed by tensorboardX (no torch dependency); degrades to a no-op when the
writer can't be constructed so headless training never dies on logging.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def format_loss_for_logging(loss_dict: dict, split: str = "train") -> dict:
    """loss dict -> {tag: scalar} with the reference's panel names

    (reference detr/train.py:327-355), flattened to tensorboard tags."""
    logs: dict[str, float] = {}
    loss_names = ["loss_label_ce", "loss_l1_bbox", "loss_giou"]
    for loss_name in loss_names:
        short = loss_name[len("loss_") :]
        logs[f"loss/{short}/{split}"] = float(loss_dict[loss_name])
        for k, v in loss_dict.items():
            if k.startswith(loss_name):
                logs[f"loss by decoder layer/{short}-{split}/{k}"] = float(v)

    logs[f"Incorrect Number of Object Predictions/cardinality_error/{split}"] = float(
        loss_dict["cardinality_error"]
    )
    for k, v in loss_dict.items():
        if k.startswith("cardinality_error"):
            logs[
                f"Incorrect Number of Object Predictions/by decoder layer {split}/{k}"
            ] = float(v)

    if "class_error" in loss_dict:
        logs[f"Classification Error (1 - accuracy)/{split}"] = float(
            loss_dict["class_error"]
        )
    # Beyond the reference taxonomy: last-layer liftoff diagnostics
    # (losses/criterion.py::_liftoff_diagnostics) — the curves that tell a
    # collapsed-but-recovering classifier from one that can never lift off.
    for k, v in loss_dict.items():
        if k.startswith("diag_"):
            logs[f"Liftoff Diagnostics/{k[len('diag_'):]}/{split}"] = float(v)
    return logs


class MetricLogger:
    def __init__(self, log_dir: Optional[str]):
        self.writer = None
        if log_dir is not None:
            try:
                import logging as _logging

                from tensorboardX import SummaryWriter

                # tensorboardX INFO-logs a "Summary name ... is illegal"
                # line for EVERY scalar whose tag it sanitizes; the
                # reference's panel taxonomy (spaces, parens) triggers ~40
                # of them per log step — pure log bloat on a 1-core host.
                _logging.getLogger("tensorboardX").setLevel(_logging.WARNING)
                self.writer = SummaryWriter(log_dir)
            except Exception:
                self.writer = None

    def log_scalars(self, scalars: dict, step: int) -> None:
        if self.writer is None:
            return
        for tag, value in scalars.items():
            try:
                self.writer.add_scalar(tag, float(value), step)
            except Exception:
                pass

    def log_loss_dict(self, loss_dict: dict, step: int, split: str = "train") -> None:
        self.log_scalars(format_loss_for_logging(loss_dict, split), step)

    def log_image(self, tag: str, image: np.ndarray, step: int) -> None:
        if self.writer is None:
            return
        self.writer.add_image(tag, image, step, dataformats="HWC")

    def flush(self) -> None:
        if self.writer is not None:
            self.writer.flush()

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
