"""Host-side augmentation pipeline (numpy + PIL).

Reproduces the reference's torchvision-v2 transform stacks
(detr/data.py:20-83) without torchvision:

train (reference detr/data.py:31-63):
  hflip(0.5) -> photometric distort(0.5) -> RandomChoice[
      RandomShortestSize(scales 480:800:32, max 1333)
    | RandomShortestSize([400,500,600]) -> RandomSizeCrop(384,600)
      -> RandomShortestSize(scales, 1333) ]
  -> clamp boxes -> sanitize boxes -> float [0,1] -> ImageNet normalize

val (reference detr/data.py:66-83):
  shortest-side 800 / max 1333 -> clamp -> sanitize -> normalize

Semantics notes (documented approximations):
  * RandomShortestSize matches torchvision: ratio = min_size / min(h, w)
    capped by max_size / max(h, w); bilinear PIL resize.
  * RandomSizeCrop samples w, h uniformly from [min_size, min(side, max_size))
    with a random in-bounds top-left, like the reference subclass
    (detr/data.py:162-178).
  * PhotometricDistort follows torchvision's RandomPhotometricDistort:
    brightness / contrast / saturation / hue each applied with prob p, the
    contrast op randomly ordered before or after the saturation+hue pair,
    plus a channel permutation with prob p.  Color math (contrast via gray
    mean, saturation via gray blend, hue via HSV rotation) mirrors
    torchvision's functional definitions in float32.
  * Sanitize drops boxes whose clamped width or height < 1 pixel
    (torchvision SanitizeBoundingBoxes defaults), keeping class_idx /
    class_id / iscrowd aligned — the reference wires those via
    ``labels_getter`` (detr/data.py:11-17).

All functions are pure: they take/return ``(np.ndarray image HWC, target)``.
"""

from __future__ import annotations

import numpy as np

from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

TRAIN_SCALES = (480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800)
MAX_SIZE = 1333


# ---------------------------------------------------------------- helpers


def _to_numpy(img) -> np.ndarray:
    if isinstance(img, np.ndarray):
        return img
    return np.asarray(img)  # PIL -> HWC uint8


def hflip(img: np.ndarray, target: dict) -> tuple[np.ndarray, dict]:
    h, w = img.shape[:2]
    img = img[:, ::-1]
    boxes = target["boxes"].copy()
    if len(boxes):
        boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    target = dict(target, boxes=boxes)
    return img, target


def resize(img: np.ndarray, target: dict, new_h: int, new_w: int):
    h, w = img.shape[:2]
    if img.dtype == np.uint8:
        # Native antialiased bilinear (same algorithm as PIL BILINEAR and
        # the reference's torchvision antialias=True resize, <= 1 uint8
        # level apart — tests/test_resize_numerics.py); PIL fallback when
        # no toolchain.  Resize is ~46% of the augmentation chain.
        from detr_tpu.data import _native

        nat = _native.resize_bilinear(img, new_h, new_w)
        if nat is not None:
            img = nat
        else:
            pil = Image.fromarray(img)
            img = np.asarray(pil.resize((new_w, new_h), Image.BILINEAR))
    else:
        # float images (post-normalize): PIL bilinear per channel, mode "F"
        chans = [
            np.asarray(
                Image.fromarray(np.ascontiguousarray(img[..., c]), mode="F").resize(
                    (new_w, new_h), Image.BILINEAR
                )
            )
            for c in range(img.shape[2])
        ]
        img = np.stack(chans, axis=-1).astype(img.dtype)
    boxes = target["boxes"].copy()
    if len(boxes):
        boxes[:, [0, 2]] *= new_w / w
        boxes[:, [1, 3]] *= new_h / h
    return img, dict(target, boxes=boxes)


def random_shortest_size(
    img: np.ndarray, target: dict, rng: np.random.Generator, min_sizes, max_size: int
):
    """torchvision RandomShortestSize: pick a min_size, scale so the short

    side hits it without the long side exceeding max_size."""
    h, w = img.shape[:2]
    min_size = int(rng.choice(np.atleast_1d(min_sizes)))
    ratio = min(min_size / min(h, w), max_size / max(h, w))
    new_h, new_w = int(round(h * ratio)), int(round(w * ratio))
    return resize(img, target, new_h, new_w)


def crop(img: np.ndarray, target: dict, top: int, left: int, ch: int, cw: int):
    img = img[top : top + ch, left : left + cw]
    boxes = target["boxes"].copy()
    if len(boxes):
        boxes[:, [0, 2]] -= left
        boxes[:, [1, 3]] -= top
    return img, dict(target, boxes=boxes)


def random_size_crop(
    img: np.ndarray,
    target: dict,
    rng: np.random.Generator,
    min_size: int = 384,
    max_size: int = 600,
):
    """DETR-paper-style crop (reference detr/data.py:151-178)."""
    h, w = img.shape[:2]
    hi_w, hi_h = min(w, max_size), min(h, max_size)
    if hi_w <= min_size or hi_h <= min_size:
        return img, target  # image too small to crop
    cw = int(rng.integers(min_size, hi_w))
    ch = int(rng.integers(min_size, hi_h))
    top = int(rng.integers(0, h - ch + 1))
    left = int(rng.integers(0, w - cw + 1))
    return crop(img, target, top, left, ch, cw)


def clamp_and_sanitize(
    img: np.ndarray, target: dict, min_w: float = 1.0, min_h: float = 1.0
):
    """ClampBoundingBoxes + SanitizeBoundingBoxes (reference data.py:55-58).

    ``min_w``/``min_h`` override the >= 1 px drop threshold — the
    device-resize wire passes the source-coordinate equivalent of "1 px at
    the final scale" (TrainTransform._call_source)."""
    h, w = img.shape[:2]
    boxes = target["boxes"].copy()
    if len(boxes):
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
        bw = boxes[:, 2] - boxes[:, 0]
        bh = boxes[:, 3] - boxes[:, 1]
        keep = (bw >= min_w) & (bh >= min_h)
    else:
        keep = np.zeros((0,), bool)
    return img, dict(
        target,
        boxes=boxes[keep],
        class_idx=target["class_idx"][keep],
        class_id=target["class_id"][keep],
        iscrowd=target["iscrowd"][keep],
    )


# ------------------------------------------------------ photometric distort


def _blend(a: np.ndarray, b: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(b + factor * (a - b), 0.0, 255.0)


def _grayscale(img_f: np.ndarray) -> np.ndarray:
    g = img_f @ np.array([0.299, 0.587, 0.114], np.float32)
    return g[..., None]


def _affine_gray_native(img_f, alpha, beta, gamma):
    """One-pass native clip(alpha*img + beta*gray + gamma) or None."""
    from detr_tpu.data import _native

    return _native.affine_gray(img_f, alpha, beta, gamma)


def adjust_brightness(img_f, factor):
    out = _affine_gray_native(img_f, factor, 0.0, 0.0)
    if out is not None:
        return out
    return np.clip(img_f * factor, 0, 255)


def adjust_contrast(img_f, factor):
    from detr_tpu.data import _native

    mean = _native.gray_mean(img_f)
    if mean is None:
        mean = float(_grayscale(img_f).mean())
    out = _affine_gray_native(img_f, factor, 0.0, (1.0 - factor) * mean)
    if out is not None:
        return out
    return _blend(img_f, np.float32(mean), factor)


def adjust_saturation(img_f, factor):
    out = _affine_gray_native(img_f, factor, 1.0 - factor, 0.0)
    if out is not None:
        return out
    return _blend(img_f, _grayscale(img_f), factor)


def adjust_hue(img_f, delta):
    """Rotate hue by delta (fraction of the full circle), via HSV.

    Hot loop of the host pipeline: the native one-pass kernel
    (native/image_ops.cc, same float math) runs when a C++ toolchain is
    available; this numpy fallback gathers the HSV->RGB sextant per channel
    with ``np.choose`` (vs the original 6-branch ``np.select`` at
    ~35 ms/image).
    """
    from detr_tpu.data import _native

    native_out = _native.hue_rotate(img_f, delta)
    if native_out is not None:
        return native_out
    x = img_f * np.float32(1.0 / 255.0)
    mx = x.max(-1)
    mn = x.min(-1)
    diff = mx - mn + np.float32(1e-12)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    h = np.where(
        mx == r,
        ((g - b) / diff) % 6.0,
        np.where(mx == g, (b - r) / diff + 2.0, (r - g) / diff + 4.0),
    ) / 6.0
    s = np.where(mx > 0, diff / (mx + np.float32(1e-12)), 0.0)
    v = mx
    h = (h + delta) % 1.0
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(np.int32) % 6
    out = np.empty(img_f.shape, np.float32)
    np.choose(i, (v, q, p, p, t, v), out=out[..., 0])
    np.choose(i, (t, v, v, q, p, p), out=out[..., 1])
    np.choose(i, (p, p, t, v, v, q), out=out[..., 2])
    return np.clip(out * 255.0, 0, 255)


def photometric_distort(
    img: np.ndarray,
    rng: np.random.Generator,
    brightness=(0.875, 1.125),
    contrast=(0.7, 1.3),
    saturation=(0.8, 1.2),
    hue=(-0.05, 0.05),
    p: float = 0.5,
) -> np.ndarray:
    x = img.astype(np.float32)
    if rng.random() < p:
        x = adjust_brightness(x, rng.uniform(*brightness))
    contrast_before = rng.random() < 0.5
    if contrast_before and rng.random() < p:
        x = adjust_contrast(x, rng.uniform(*contrast))
    if rng.random() < p:
        x = adjust_saturation(x, rng.uniform(*saturation))
    if rng.random() < p:
        x = adjust_hue(x, rng.uniform(*hue))
    if not contrast_before and rng.random() < p:
        x = adjust_contrast(x, rng.uniform(*contrast))
    if rng.random() < p:
        x = x[..., rng.permutation(3)]
    return x.astype(np.uint8)


_NORM_SCALE = (1.0 / (255.0 * IMAGENET_STD)).astype(np.float32)
_NORM_BIAS = (IMAGENET_MEAN / IMAGENET_STD).astype(np.float32)


def normalize(img: np.ndarray) -> np.ndarray:
    # (x/255 - mean)/std folded to x*scale - bias: one native pass
    # (native/image_ops.cc) or two numpy passes (vs four on the naive form,
    # profiled at 18 ms/image).
    if img.dtype == np.uint8:
        from detr_tpu.data import _native

        native_out = _native.normalize_u8(img, _NORM_SCALE, _NORM_BIAS)
        if native_out is not None:
            return native_out
    x = np.multiply(img, _NORM_SCALE, dtype=np.float32)
    x -= _NORM_BIAS
    return x


# ------------------------------------------------------------- pipelines


def _shortest_size_ratio(
    h: int, w: int, rng: np.random.Generator, min_sizes, max_size: int
) -> float:
    """The scale factor random_shortest_size would apply (same draw)."""
    min_size = int(rng.choice(np.atleast_1d(min_sizes)))
    return min(min_size / min(h, w), max_size / max(h, w))


class TrainTransform:
    """Full reference train augmentation (detr/data.py:20-63).

    ``normalize=False`` defers ImageNet normalization to batch assembly
    (``bucketing.assemble_batch`` normalizes uint8 images natively): with
    process workers this ships 4x fewer bytes per image over the IPC pipe
    (uint8 vs fp32), which is the pool's throughput ceiling.

    ``emit_source=True`` (the device-resize wire, ops/device_resize.py):
    the GEOMETRY of the reference chain is sampled identically (same RNG
    draw order -> bit-identical target sizes run-for-run with the host
    path), but the final resample never happens on the host — the image is
    returned at source resolution (cropped when the crop branch was drawn,
    mapped back to source coordinates) with ``target["resize_to"] =
    (th, tw)`` for the device to execute.  Boxes stay in source pixel
    coordinates; sanitize applies the reference's >= 1 *target* pixel rule
    scaled back to source units.  Approximations vs the host chain, both
    augmentation-level: crop offsets round to source pixels (the host path
    crops in resized sub-pixel space), and the crop branch becomes a
    single resample instead of resize->crop->resize.
    """

    def __init__(
        self,
        seed: int = 0,
        scales=TRAIN_SCALES,
        max_size: int = MAX_SIZE,
        normalize: bool = True,
        emit_source: bool = False,
        photometric: bool = True,
    ):
        self.rng = np.random.default_rng(seed)
        self.scales = scales
        self.max_size = max_size
        self.normalize = normalize
        self.emit_source = emit_source
        # ``photometric=False`` drops the distort stage (reference
        # detr/data.py:36) while keeping the geometric chain intact.  The
        # distort includes a p=0.5 random CHANNEL PERMUTATION and hue
        # rotation — correct augmentation for real COCO, but on the
        # synthetic stand-in dataset (make_synthetic_coco), where class
        # identity IS the RGB color, it relabels ~44.5% of train crops to
        # a wrong class's color (measured in tests/test_transforms.py::
        # test_photometric_distort_confuses_palette) — an unlearnable
        # classification task.  Learning-proof runs set this False.
        self.photometric = photometric

    def __call__(self, img, target):
        if self.emit_source:
            return self._call_source(img, target)
        rng = self.rng
        img = _to_numpy(img)
        if rng.random() < 0.5:
            img, target = hflip(img, target)
        if self.photometric:
            img = photometric_distort(img, rng)
        if rng.random() < 0.5:
            img, target = random_shortest_size(
                img, target, rng, self.scales, self.max_size
            )
        else:
            img, target = random_shortest_size(img, target, rng, (400, 500, 600), 10_000)
            img, target = random_size_crop(img, target, rng)
            img, target = random_shortest_size(
                img, target, rng, self.scales, self.max_size
            )
        img, target = clamp_and_sanitize(img, target)
        if not self.normalize:
            return _to_uint8(img), target
        return normalize(img), target

    def _call_source(self, img, target):
        rng = self.rng
        img = _to_numpy(img)
        if rng.random() < 0.5:
            img, target = hflip(img, target)
        if self.photometric:
            img = photometric_distort(img, rng)
        h, w = img.shape[:2]
        if rng.random() < 0.5:
            ratio = _shortest_size_ratio(h, w, rng, self.scales, self.max_size)
            th, tw = int(round(h * ratio)), int(round(w * ratio))
        else:
            # Crop branch, geometry sampled in the s1-resized space exactly
            # like the host path (same draws: s1, cw, ch, top, left, s2),
            # then mapped back and executed as ONE host crop + one device
            # resample instead of resize->crop->resize.
            ratio1 = _shortest_size_ratio(h, w, rng, (400, 500, 600), 10_000)
            h1, w1 = int(round(h * ratio1)), int(round(w * ratio1))
            ch, cw = h1, w1
            hi_w, hi_h = min(w1, 600), min(h1, 600)
            if hi_w > 384 and hi_h > 384:  # random_size_crop's guard
                cw = int(rng.integers(384, hi_w))
                ch = int(rng.integers(384, hi_h))
                top = int(rng.integers(0, h1 - ch + 1))
                left = int(rng.integers(0, w1 - cw + 1))
                t0 = min(int(round(top / ratio1)), h - 1)
                l0 = min(int(round(left / ratio1)), w - 1)
                ch0 = min(max(1, int(round(ch / ratio1))), h - t0)
                cw0 = min(max(1, int(round(cw / ratio1))), w - l0)
                img, target = crop(img, target, t0, l0, ch0, cw0)
            ratio2 = _shortest_size_ratio(ch, cw, rng, self.scales, self.max_size)
            th, tw = int(round(ch * ratio2)), int(round(cw * ratio2))
        sh, sw = img.shape[:2]
        # Reference sanitize drops boxes under 1 px at the FINAL scale
        # (clamp_and_sanitize runs post-resize there); in source
        # coordinates that threshold is 1/scale.
        img, target = clamp_and_sanitize(
            img, target, min_w=sw / max(tw, 1), min_h=sh / max(th, 1)
        )
        target = dict(target, resize_to=(th, tw))
        return _to_uint8(img), target


class ValTransform:
    """Reference val transform (detr/data.py:66-83).

    ``normalize=False`` / ``emit_source=True``: see TrainTransform."""

    def __init__(
        self,
        min_size: int = 800,
        max_size: int = MAX_SIZE,
        normalize: bool = True,
        emit_source: bool = False,
    ):
        self.min_size = min_size
        self.max_size = max_size
        self.rng = np.random.default_rng(0)
        self.normalize = normalize
        self.emit_source = emit_source

    def __call__(self, img, target):
        img = _to_numpy(img)
        if self.emit_source:
            h, w = img.shape[:2]
            ratio = min(self.min_size / min(h, w), self.max_size / max(h, w))
            th, tw = int(round(h * ratio)), int(round(w * ratio))
            img, target = clamp_and_sanitize(
                img, target, min_w=w / max(tw, 1), min_h=h / max(th, 1)
            )
            return _to_uint8(img), dict(target, resize_to=(th, tw))
        img, target = random_shortest_size(
            img, target, self.rng, (self.min_size,), self.max_size
        )
        img, target = clamp_and_sanitize(img, target)
        if not self.normalize:
            return _to_uint8(img), target
        return normalize(img), target


def _to_uint8(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return img
    return np.clip(img, 0, 255).astype(np.uint8)


def get_train_transforms(
    seed: int = 0,
    normalize: bool = True,
    emit_source: bool = False,
    photometric: bool = True,
) -> TrainTransform:
    return TrainTransform(
        seed=seed,
        normalize=normalize,
        emit_source=emit_source,
        photometric=photometric,
    )


def get_val_transforms(
    normalize: bool = True,
    emit_source: bool = False,
    min_size: int = 800,
    max_size: int = MAX_SIZE,
) -> ValTransform:
    return ValTransform(
        min_size=min_size,
        max_size=max_size,
        normalize=normalize,
        emit_source=emit_source,
    )
