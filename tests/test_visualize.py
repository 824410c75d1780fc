"""Visualization: box/label/mask rendering (reference detr/visualize.py)."""

import numpy as np

from detr_tpu.viz.visualize import plot, plot_grid, render_bounding_boxes


def test_plot_draws_boxes_and_labels():
    img = np.zeros((64, 64, 3), np.uint8)
    out = plot(
        img,
        boxes=np.array([[8.0, 8.0, 40.0, 40.0]]),
        class_names=["cat"],
        scores=np.array([0.9]),
        box_color="red",
    )
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    assert out.sum() > 0  # something was drawn


def test_plot_mask_overlay():
    """Mask pixels are alpha-blended (reference visualize.py:87-93)."""
    img = np.full((32, 32, 3), 200, np.uint8)
    masks = np.zeros((2, 32, 32), bool)
    masks[0, :8, :8] = True
    masks[1, 20:, 20:] = True
    out = plot(img, masks=masks, mask_color=(0, 128, 0), mask_alpha=0.65)
    # Inside both masks: blended toward green; outside: untouched.
    exp = (0.35 * 200 + 0.65 * np.array([0, 128, 0])).astype(np.uint8)
    assert np.array_equal(out[4, 4], exp)
    assert np.array_equal(out[25, 25], exp)
    assert np.array_equal(out[16, 16], [200, 200, 200])


def test_plot_denormalizes_float_images():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(16, 16, 3)).astype(np.float32)
    out = plot(img)
    assert out.dtype == np.uint8 and out.shape == (16, 16, 3)


def test_plot_grid_shapes_and_masks():
    items = [
        {
            "image": np.zeros((32, 48, 3), np.uint8),
            "boxes": np.array([[1.0, 1.0, 10.0, 10.0]]),
            "masks": np.ones((1, 32, 48), bool),
        },
        {"image": np.zeros((32, 48, 3), np.uint8)},
        {"image": np.zeros((32, 48, 3), np.uint8)},
    ]
    grid = plot_grid(items, num_cols=2)
    assert grid.shape == (2 * 32, 2 * 48, 3)
    # First cell carries the green mask wash; others stay black.
    assert grid[:32, :48].sum() > 0
    assert grid[:32, 48:].sum() == 0


def test_render_bounding_boxes_coco_format():
    from PIL import Image

    img = Image.new("RGB", (40, 40))
    anns = [{"bbox": [4, 4, 10, 12], "category_id": 7}]
    out = render_bounding_boxes(img, anns, class_id2name={7: "dog"})
    assert np.asarray(out).sum() > 0
