"""Data-pipeline tests: COCO parsing, augmentation invariants, bucketing,

and the fixed-shape guarantee that keeps XLA from recompiling
(SURVEY §4 implication (c))."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from detr_tpu.data import (
    BucketedLoader,
    CocoDataset,
    assemble_batch,
    get_train_transforms,
    get_val_transforms,
    make_eval_loader,
    pick_bucket,
)
from detr_tpu.data import transforms as T


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    rng = np.random.default_rng(0)
    for split in ("train", "validation"):
        os.makedirs(root / split / "data")
        images, annotations = [], []
        aid = 1
        n_img = 12 if split == "train" else 6
        for i in range(n_img):
            h, w = int(rng.integers(240, 640)), int(rng.integers(240, 640))
            arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
            name = f"{i:06d}.png"
            Image.fromarray(arr).save(root / split / "data" / name)
            images.append({"id": i, "file_name": name, "height": h, "width": w})
            for _ in range(int(rng.integers(0, 6))):
                x = float(rng.uniform(0, w - 40))
                y = float(rng.uniform(0, h - 40))
                bw = float(rng.uniform(10, 40))
                bh = float(rng.uniform(10, 40))
                annotations.append(
                    {
                        "id": aid,
                        "image_id": i,
                        "category_id": int(rng.choice([1, 3, 7])),
                        "bbox": [x, y, bw, bh],
                        "area": bw * bh,
                        "iscrowd": 0,
                    }
                )
                aid += 1
        cats = [
            {"id": 1, "name": "cat"},
            {"id": 3, "name": "dog"},
            {"id": 7, "name": "bird"},
        ]
        with open(root / split / "labels.json", "w") as f:
            json.dump(
                {"images": images, "annotations": annotations, "categories": cats}, f
            )
    return str(root)


def test_dataset_parsing(coco_root):
    ds = CocoDataset(coco_root, "train")
    assert ds.num_classes == 3
    assert ds.class_names == ["cat", "dog", "bird"]
    assert ds.class_id2idx == {1: 0, 3: 1, 7: 2}
    img, target = ds[0]
    assert img.mode == "RGB"
    assert target["boxes"].shape[1] == 4 if len(target["boxes"]) else True
    assert len(target["boxes"]) == len(target["class_idx"]) == len(target["iscrowd"])
    # XYWH -> XYXY conversion: x1 > x0
    if len(target["boxes"]):
        assert (target["boxes"][:, 2] > target["boxes"][:, 0]).all()


def test_hflip_box_math():
    img = np.zeros((10, 20, 3), np.uint8)
    t = {
        "boxes": np.array([[2.0, 1.0, 5.0, 4.0]], np.float32),
        "class_idx": np.array([0]),
        "class_id": np.array([1]),
        "iscrowd": np.array([False]),
    }
    img2, t2 = T.hflip(img, t)
    np.testing.assert_allclose(t2["boxes"], [[15.0, 1.0, 18.0, 4.0]])


def test_shortest_size_resize():
    rng = np.random.default_rng(0)
    img = np.zeros((300, 400, 3), np.uint8)
    t = {
        "boxes": np.array([[40.0, 30.0, 80.0, 60.0]], np.float32),
        "class_idx": np.array([0]),
        "class_id": np.array([1]),
        "iscrowd": np.array([False]),
    }
    img2, t2 = T.random_shortest_size(img, t, rng, (600,), 1333)
    assert min(img2.shape[:2]) == 600
    # boxes scale with the image
    np.testing.assert_allclose(t2["boxes"], [[80, 60, 160, 120]], rtol=1e-5)
    # max_size cap engages
    img3, _ = T.random_shortest_size(img, t, rng, (2000,), 1333)
    assert max(img3.shape[:2]) <= 1333 + 1


def test_sanitize_drops_degenerate():
    img = np.zeros((50, 50, 3), np.uint8)
    t = {
        "boxes": np.array(
            [[10, 10, 20, 20], [-30, -30, -5, -5], [10, 10, 10.4, 30]], np.float32
        ),
        "class_idx": np.array([0, 1, 2]),
        "class_id": np.array([1, 3, 7]),
        "iscrowd": np.array([False, True, False]),
    }
    _, t2 = T.clamp_and_sanitize(img, t)
    assert len(t2["boxes"]) == 1
    assert t2["class_idx"].tolist() == [0]


def test_photometric_distort_shape_and_range(rng):
    img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    out = T.photometric_distort(img, np.random.default_rng(1))
    assert out.shape == img.shape and out.dtype == np.uint8


def test_train_transform_end_to_end(coco_root):
    ds = CocoDataset(coco_root, "train", transform=get_train_transforms(seed=1))
    img, target = ds[1]
    h, w = img.shape[:2]
    assert 479 <= min(h, w) <= 801 or max(h, w) <= 1334
    assert img.dtype == np.float32
    if len(target["boxes"]):
        b = target["boxes"]
        assert (b[:, 0] >= 0).all() and (b[:, 2] <= w + 1e-3).all()
        assert (b[:, 1] >= 0).all() and (b[:, 3] <= h + 1e-3).all()


def test_learnable_synthetic_paints_class_colors(rng):
    """learnable=True paints each GT box with its class palette color —
    the signal the convergence runs learn from."""
    from detr_tpu.data.synthetic import _class_palette, synthetic_batch

    b = synthetic_batch(rng, 2, 96, 96, max_gt=6, num_classes=5, learnable=True)
    pal = _class_palette(5)
    found = 0
    for i in range(2):
        for g in range(6):
            if not b["gt_valid"][i, g]:
                continue
            x0, y0, x1, y1 = b["boxes"][i, g]
            cx, cy = int((x0 + x1) / 2), int((y0 + y1) / 2)
            px = b["image"][i, cy, cx]
            # center pixel is the class color unless painted over by a
            # later overlapping box (which carries some palette color too)
            if np.allclose(px, pal[b["class_idx"][i, g]], atol=1e-5):
                found += 1
    assert found >= 1
    # padding region still exactly zero
    h, w = int(b["height"][0]), int(b["width"][0])
    assert (b["image"][0, h:] == 0).all() and (b["image"][0, :, w:] == 0).all()


def test_native_image_ops_match_numpy(rng):
    """native/image_ops.cc kernels vs the numpy fallbacks (exact math)."""
    from detr_tpu.data import _native
    from detr_tpu.data import transforms as T

    if _native.load() is None:
        pytest.skip("no C++ toolchain")
    img = (rng.random((120, 90, 3)) * 255).astype(np.float32)
    for delta in (0.04, -0.03, 0.5):
        a = _native.hue_rotate(img, delta)
        # numpy fallback: run adjust_hue with the native path disabled
        orig = _native._lib
        try:
            _native._lib = None
            b = T.adjust_hue(img, delta)
        finally:
            _native._lib = orig
        np.testing.assert_allclose(a, b, atol=5e-3)

    u8 = img.astype(np.uint8)
    n1 = _native.normalize_u8(u8, T._NORM_SCALE, T._NORM_BIAS)
    n2 = (u8.astype(np.float32) / 255.0 - T.IMAGENET_MEAN) / T.IMAGENET_STD
    np.testing.assert_allclose(n1, n2, atol=1e-5)

    # fused affine-gray photometric kernels vs the numpy fallbacks
    for fn, args in (
        (T.adjust_brightness, (1.11,)),
        (T.adjust_brightness, (0.9,)),
        (T.adjust_contrast, (0.75,)),
        (T.adjust_saturation, (1.18,)),
    ):
        a = fn(img, *args)
        orig = _native._lib
        try:
            _native._lib = None
            b = fn(img, *args)
        finally:
            _native._lib = orig
        np.testing.assert_allclose(a, b, atol=5e-3)

    # native antialiased resize vs PIL BILINEAR (same algorithm; float32
    # vs PIL's int16 fixed point — within one uint8 level)
    from PIL import Image

    u8img = (rng.random((123, 217, 3)) * 255).astype(np.uint8)
    for nh, nw in ((61, 108), (246, 434), (100, 300)):
        nat = _native.resize_bilinear(u8img, nh, nw)
        pil = np.asarray(Image.fromarray(u8img).resize((nw, nh), Image.BILINEAR))
        assert np.abs(nat.astype(np.int16) - pil.astype(np.int16)).max() <= 1


def test_pick_bucket():
    buckets = ((832, 1344), (1344, 832), (1056, 1056))
    assert pick_bucket(800, 1333, buckets) == 0
    assert pick_bucket(1333, 800, buckets) == 1
    assert pick_bucket(1000, 1000, buckets) == 2
    # oversize -> least-downscale bucket
    assert pick_bucket(1400, 1400, buckets) == 2


def test_assemble_batch_fixed_shapes():
    items = []
    for h, w, n in ((100, 200, 2), (150, 120, 0)):
        img = np.ones((h, w, 3), np.float32)
        t = {
            "image_id": 7,
            "boxes": np.tile([10.0, 10.0, 50.0, 40.0], (n, 1)).astype(np.float32),
            "class_idx": np.zeros(n, np.int64),
            "class_id": np.ones(n, np.int64),
            "iscrowd": np.zeros(n, bool),
        }
        items.append((img, t))
    batch = assemble_batch(items, (256, 256), max_gt=10)
    assert batch["image"].shape == (2, 256, 256, 3)
    assert batch["gt_valid"].sum() == 2
    # zero padding outside valid extent
    assert batch["image"][0, 100:, :, :].sum() == 0
    assert batch["image"][0, :, 200:, :].sum() == 0
    # normalization by per-image extent (reference data.py:216-219)
    np.testing.assert_allclose(
        batch["boxes_normalized"][0, 0], [10 / 200, 10 / 100, 50 / 200, 40 / 100]
    )


def test_loader_fixed_shape_guarantee(coco_root):
    ds = CocoDataset(coco_root, "train", transform=get_train_transforms(seed=2))
    buckets = ((832, 1344), (1344, 832), (1056, 1056))
    loader = BucketedLoader(
        ds, batch_size=2, buckets=buckets, max_gt=16, num_workers=2, drop_last=False
    )
    seen_shapes = set()
    n_batches = 0
    for batch in loader:
        seen_shapes.add(batch["image"].shape)
        assert batch["class_idx"].shape == (2, 16)
        n_batches += 1
    assert n_batches >= 1
    # every emitted shape is a bucket shape — the no-recompile guarantee
    assert seen_shapes <= {(2, bh, bw, 3) for bh, bw in buckets}


def test_eval_loader_single_shape_and_pad_count(coco_root):
    ds = CocoDataset(coco_root, "validation", transform=get_val_transforms())
    loader = make_eval_loader(ds, batch_size=4, max_gt=16)
    batches = list(loader)
    eval_shapes = {(4, 800, 1344, 3), (4, 1344, 800, 3)}
    assert all(b["image"].shape in eval_shapes for b in batches)
    total = sum(4 - int(b["pad_count"]) for b in batches)
    assert total == len(ds)


def test_loader_deterministic_order(coco_root):
    ds = CocoDataset(coco_root, "validation", transform=get_val_transforms())
    l1 = list(make_eval_loader(ds, batch_size=3, num_workers=3))
    l2 = list(make_eval_loader(ds, batch_size=3, num_workers=0))
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a["image_id"], b["image_id"])
        np.testing.assert_allclose(a["image"], b["image"])


def test_loader_process_pool_matches_sync(coco_root):
    """Spawn-pool workers yield bitwise the synchronous loader's batches
    (deterministic val transform; order preserved by imap)."""
    from detr_tpu.data.loader import BucketedLoader

    ds = CocoDataset(coco_root, "validation", transform=get_val_transforms())
    kw = dict(batch_size=3, buckets=((800, 1344), (1344, 800)), shuffle=False,
              drop_last=False)
    sync = BucketedLoader(ds, num_workers=0, **kw)
    pool = BucketedLoader(ds, num_workers=2, worker_mode="process", **kw)
    b_sync, b_pool = list(sync), list(pool)
    pool.close()
    assert len(b_sync) == len(b_pool) > 0
    for a, b in zip(b_sync, b_pool):
        np.testing.assert_array_equal(a["image_id"], b["image_id"])
        np.testing.assert_allclose(a["image"], b["image"])


def test_loader_process_mode_falls_back_for_unpicklable():
    from detr_tpu.data.loader import BucketedLoader

    class LocalDS:  # locally-defined -> not picklable by reference
        def __len__(self):
            return 4

        def __getitem__(self, i):
            img = np.full((64, 64, 3), i * 10, np.uint8)
            return img, {
                "image_id": i,
                "boxes": np.zeros((0, 4), np.float32),
                "class_idx": np.zeros((0,), np.int32),
                "class_id": np.zeros((0,), np.int32),
                "iscrowd": np.zeros((0,), bool),
            }

    loader = BucketedLoader(
        LocalDS(), batch_size=2, buckets=((64, 64),), shuffle=False,
        num_workers=2, worker_mode="process",
    )
    batches = list(loader)
    loader.close()
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 64, 64, 3)


def test_deferred_normalize_matches_eager(coco_root):
    """normalize=False transforms + collate-time normalization produce the
    same batches as normalize-in-transform (padding stays exactly 0)."""
    from detr_tpu.data.loader import BucketedLoader

    ds_eager = CocoDataset(coco_root, "validation", transform=get_val_transforms())
    ds_late = CocoDataset(
        coco_root, "validation", transform=get_val_transforms(normalize=False)
    )
    kw = dict(batch_size=3, buckets=((800, 1344), (1344, 800)), shuffle=False,
              drop_last=False, num_workers=0)
    for a, b in zip(BucketedLoader(ds_eager, **kw), BucketedLoader(ds_late, **kw)):
        np.testing.assert_allclose(a["image"], b["image"], atol=1e-6)
        h, w = int(a["height"][0]), int(a["width"][0])
        pad_region = a["image"][0, h:, w:]
        if pad_region.size:
            np.testing.assert_array_equal(pad_region, 0.0)


class _VarShapeDS:
    """Module-level (picklable) dataset with index-dependent aspect ratios —
    shards develop different bucket compositions, the failure mode of
    naive per-shard drop_last batching."""

    def __init__(self, n: int):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        h = int(rng.integers(200, 900))
        w = int(rng.integers(200, 900))
        img = np.full((h, w, 3), i % 255, np.uint8)
        t = {
            "image_id": i,
            "boxes": np.asarray([[10.0, 10.0, 50.0, 40.0]], np.float32),
            "class_idx": np.zeros(1, np.int64),
            "class_id": np.ones(1, np.int64),
            "iscrowd": np.zeros(1, bool),
        }
        return img, t


def test_sharded_loader_equal_batch_counts():
    """Multi-process shards must emit IDENTICAL batch counts per epoch —
    every batch feeds a collective train step over the global mesh, so a
    count mismatch hangs the odd process at the gradient psum.  The loader
    guarantees this by capping every shard at the deterministic lower
    bound (see BucketedLoader._batch_quota)."""
    from detr_tpu.data.loader import BucketedLoader

    buckets = ((832, 1344), (1344, 832), (1056, 1056))
    n, count, bs = 101, 4, 4  # uneven shards, odd sizes
    kw = dict(
        batch_size=bs, buckets=buckets, max_gt=4, shuffle=True,
        drop_last=True, num_workers=0, seed=3,
    )
    counts = []
    for index in range(count):
        loader = BucketedLoader(_VarShapeDS(n), shard=(index, count), **kw)
        batches = list(loader)
        counts.append(len(batches))
        assert all(b["image_valid"].all() for b in batches)
    expected = (n // count) // bs - (len(buckets) - 1)
    assert counts == [expected] * count
    # single-process mode is uncapped (emits every full bucket batch)
    solo = list(BucketedLoader(_VarShapeDS(n), shard=(0, 1), **kw))
    assert len(solo) >= expected


def test_sharded_loader_too_small_shard_raises():
    """quota == 0 must be a loud construction error, not a trainer that
    'finishes' every epoch having emitted zero batches (the lower bound
    floor(n/B) - (k-1) hits 0 when the shard is smaller than k*B items)."""
    from detr_tpu.data.loader import BucketedLoader

    buckets = ((832, 1344), (1344, 832), (1056, 1056))
    with pytest.raises(ValueError, match="full batch per epoch"):
        BucketedLoader(
            _VarShapeDS(20), batch_size=4, buckets=buckets, max_gt=4,
            shuffle=True, drop_last=True, num_workers=0, shard=(0, 2),
        )


def test_thread_workers_released_when_abandoned_with_full_queue():
    """With more workers than out_q slots (batch_size=1, prefetch=1), the
    stop sentinels cannot all fit in the queue; workers must still exit
    after the consumer abandons the epoch instead of blocking forever in
    out_q.put(stop)."""
    import threading
    import time as _time

    from detr_tpu.data.loader import BucketedLoader

    before = set(threading.enumerate())
    loader = BucketedLoader(
        _TinyDS(n=32), batch_size=1, buckets=((64, 64),), max_gt=4,
        shuffle=False, drop_last=True, num_workers=8, prefetch=1,
        worker_mode="thread",
    )
    it = iter(loader)
    next(it)
    it.close()  # abandon mid-epoch: GeneratorExit -> abandoned.set()
    deadline = _time.monotonic() + 15.0
    while _time.monotonic() < deadline:
        leaked = [
            t for t in threading.enumerate()
            if t not in before and t.is_alive()
        ]
        if not leaked:
            break
        _time.sleep(0.1)
    assert not leaked, f"worker threads leaked after abandonment: {leaked}"


class _TinyDS:
    """Unpicklable-by-reference tiny dataset (locally usable, thread mode)."""

    def __init__(self, n=64, size=32):
        self.n, self.size = n, size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        img = np.full((self.size, self.size, 3), i % 255, np.uint8)
        return img, {
            "image_id": i,
            "boxes": np.zeros((0, 4), np.float32),
            "class_idx": np.zeros((0,), np.int32),
            "class_id": np.zeros((0,), np.int32),
            "iscrowd": np.zeros((0,), bool),
        }


def test_loader_thread_abandonment_releases_workers():
    """Abandoning the iterator mid-epoch (trainer sample fetch,
    --limit-*-iters breaks) must release the worker threads instead of
    leaving them pinned on a full out_q holding decoded images."""
    import threading
    import time

    baseline = threading.active_count()
    loader = BucketedLoader(
        _TinyDS(), batch_size=2, buckets=((32, 32),), shuffle=False,
        num_workers=2, worker_mode="thread", prefetch=1,
    )
    it = iter(loader)
    next(it)  # workers now saturate the bounded out_q
    it.close()  # GeneratorExit -> finally -> abandoned.set()
    deadline = time.time() + 10
    while time.time() < deadline and threading.active_count() > baseline:
        time.sleep(0.05)
    assert threading.active_count() <= baseline


def test_loader_epoch_pinning_continues_schedule():
    """torch DistributedSampler.set_epoch semantics: a fresh loader pinned
    to epoch E reproduces epoch E's shuffle permutation, so crash-restored
    runs continue the schedule instead of replaying early epochs."""
    mk = lambda: BucketedLoader(
        _TinyDS(n=16), batch_size=2, buckets=((32, 32),), shuffle=True,
        seed=7, num_workers=0,
    )
    natural = mk()
    orders = [
        [tuple(b["image_id"].tolist()) for b in natural] for _ in range(3)
    ]
    pinned = mk()
    pinned.epoch = 2  # what trainer.py does on (restored) epoch 2
    assert [tuple(b["image_id"].tolist()) for b in pinned] == orders[2]
    assert orders[0] != orders[2]  # permutations actually differ by epoch
