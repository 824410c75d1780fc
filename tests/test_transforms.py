"""Photometric-distort vs the synthetic color-coded dataset.

Documents (as an executable fact) the root cause of two rounds of AP 0.000
learning-proof runs: the reference train augmentation
(reference detr/data.py:36, v2.RandomPhotometricDistort — mirrored by
data/transforms.photometric_distort) includes a p=0.5 random CHANNEL
PERMUTATION plus hue rotation.  On real COCO that is sound augmentation;
on the synthetic stand-in dataset (data/make_synthetic_coco.py), where
class identity IS the RGB color, it moves ~44.5% of crops nearer to a
WRONG class's palette color — a classification task with a ~45% label
noise floor, which the matched-CE liftoff diagnostic showed as a flat
curve at chance level.  ``TrainTransform(photometric=False)`` /
``--no-photometric-distort`` exists for exactly this case.
"""

import numpy as np
import pytest

import detr_tpu.data.transforms as T
from detr_tpu.data.make_synthetic_coco import class_palette_uint8


def _nearest_class_error(photometric: bool, n_draws: int = 30) -> float:
    """Fraction of distorted class-color patches whose nearest palette
    entry is a different class."""
    pal = class_palette_uint8(80).astype(np.float32)
    rng = np.random.default_rng(0)
    wrong = total = 0
    for c in range(80):
        patch = np.tile(pal[c][None, None, :], (4, 4, 1)).astype(np.uint8)
        for _ in range(n_draws):
            out = patch.astype(np.float32)
            if photometric:
                out = T.photometric_distort(patch, rng).astype(np.float32)
            color = out.mean((0, 1))
            d = np.linalg.norm(pal - color[None, :], axis=1)
            total += 1
            wrong += int(np.argmin(d) != c)
    return wrong / total


def test_photometric_distort_confuses_palette():
    # The distorted palette is heavily conflated (measured 44.5% at
    # n_draws=30, seed 0) — the reason learning-proof runs must disable it.
    assert _nearest_class_error(photometric=True) > 0.30


def test_clean_palette_is_separable():
    assert _nearest_class_error(photometric=False, n_draws=1) == 0.0


@pytest.mark.parametrize("emit_source", [False, True])
def test_train_transform_photometric_off_preserves_colors(emit_source):
    """With photometric=False the augmented image contains only geometric
    ops: every non-background pixel must still be an EXACT palette color
    (resize interpolation can blend at box edges, so check the box
    center), across many RNG draws covering both geometry branches."""
    pal = class_palette_uint8(80)
    tf = T.TrainTransform(seed=7, normalize=False, emit_source=emit_source,
                          photometric=False)
    rng = np.random.default_rng(3)
    checked = 0
    for _ in range(8):
        cls = int(rng.integers(0, 80))
        h, w = int(rng.integers(320, 480)), int(rng.integers(320, 480))
        img = np.full((h, w, 3), 128, np.uint8)
        # Big centered box so every crop/resize keeps its center.
        bh, bw = h // 2, w // 2
        y0, x0 = h // 4, w // 4
        img[y0:y0 + bh, x0:x0 + bw] = pal[cls]
        target = {
            "boxes": np.array([[x0, y0, x0 + bw, y0 + bh]], np.float32),
            "class_idx": np.array([cls], np.int64),
            "class_id": np.array([cls + 1], np.int64),
            "iscrowd": np.array([False]),
            "image_id": 0,
            "orig_size": (h, w),
        }
        out, t = tf(img, target)
        if len(t["boxes"]) == 0:
            continue  # box sanitized away by an aggressive crop
        bx0, by0, bx1, by1 = t["boxes"][0]
        cy, cx = int((by0 + by1) / 2), int((bx0 + bx1) / 2)
        cy = np.clip(cy, 0, out.shape[0] - 1)
        cx = np.clip(cx, 0, out.shape[1] - 1)
        center = out[cy, cx].astype(np.float32)
        d = np.linalg.norm(pal.astype(np.float32) - center[None, :], axis=1)
        assert int(np.argmin(d)) == cls
        # Geometric-only chain: nearest distance is interpolation-level.
        assert d.min() < 32.0
        checked += 1
    assert checked >= 4


def test_train_transform_photometric_flag_plumbed():
    tf = T.get_train_transforms(photometric=False)
    assert tf.photometric is False
    assert T.get_train_transforms().photometric is True
