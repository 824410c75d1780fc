"""Resize-numerics golden vs the reference's actual kernel (round-2
verdict missing #5).

The reference converts PIL images to tensors first (v2.ToImage,
reference detr/data.py:33) and then resizes with
v2.RandomShortestSize(..., antialias=True default), i.e.
``torch.nn.functional.interpolate(mode="bilinear", antialias=True,
align_corners=False)``.  Our pipeline resizes with PIL BILINEAR
(data/transforms.py:68) — a DIFFERENT implementation whose divergence was
previously only a documented risk.  torchvision is not in this
environment, but torch is, and v2's tensor resize bottoms out in exactly
``F.interpolate`` — so this test compares against the real kernel.

Measured (see PARITY.md): max |diff| <= 1.0 uint8 level and mean ~0.29
across downscales, upscales, and odd geometries — i.e. rounding-level
agreement (our output is uint8, the oracle float).  Bounds below leave
small headroom over the measured envelope.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from detr_tpu.data.transforms import resize  # noqa: E402


def _torch_antialias_resize(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    import torch.nn.functional as F

    x = torch.from_numpy(img.astype(np.float32)).permute(2, 0, 1)[None]
    y = F.interpolate(
        x, size=(nh, nw), mode="bilinear", align_corners=False, antialias=True
    )
    return y[0].permute(1, 2, 0).numpy()


_CASES = [
    (480, 640, 240, 320),    # clean 2x downscale
    (600, 400, 300, 200),    # portrait
    (800, 1333, 480, 800),   # reference val geometry, non-integer ratio
    (537, 713, 229, 305),    # odd sizes
    (333, 555, 800, 1333),   # upscale (antialias is inert here)
]


@pytest.mark.parametrize("h,w,nh,nw", _CASES)
def test_uint8_resize_matches_torch_antialias_bilinear(h, w, nh, nw):
    rng = np.random.default_rng(h * 7 + w)
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    ours, _ = resize(img, {"boxes": np.zeros((0, 4), np.float32)}, nh, nw)
    ref = _torch_antialias_resize(img, nh, nw)
    d = np.abs(ours.astype(np.float32) - ref)
    # uint8 output vs float oracle: 0.5 is pure rounding; 1.5 allows the
    # separable-filter evaluation-order residue on worst-case noise images.
    assert d.max() <= 1.5, f"max diff {d.max():.2f} uint8 levels"
    assert d.mean() <= 0.5, f"mean diff {d.mean():.3f} uint8 levels"
