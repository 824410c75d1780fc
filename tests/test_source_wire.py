"""Device-resize ("source") wire: transform geometry parity, loader batch
contract, and prepared-image equivalence with the host-resize wire.

The source wire (data/transforms.py emit_source, data/bucketing.py
assemble_batch_source, ops/device_resize.py) ships source-resolution uint8
and resamples on device; everything downstream (criterion, PostProcess,
metrics) must see identical semantics to the host-resize wire.
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from detr_tpu.data import transforms as T
from detr_tpu.data.bucketing import derive_source_buckets
from detr_tpu.data.coco import CocoDataset
from detr_tpu.data.loader import BucketedLoader, make_eval_loader
from detr_tpu.ops.image_norm import prepare_batch_image, prepare_image


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_srcwire")
    rng = np.random.default_rng(7)
    os.makedirs(root / "train" / "data")
    images, annotations = [], []
    aid = 1
    for i in range(10):
        h, w = int(rng.integers(240, 640)), int(rng.integers(240, 640))
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        name = f"{i:06d}.png"
        Image.fromarray(arr).save(root / "train" / "data" / name)
        images.append({"id": i, "file_name": name, "height": h, "width": w})
        for _ in range(int(rng.integers(1, 5))):
            x, y = rng.uniform(0, w - 40), rng.uniform(0, h - 40)
            bw, bh = rng.uniform(16, 40), rng.uniform(16, 40)
            annotations.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": 1,
                    "bbox": [x, y, bw, bh],
                    "iscrowd": 0,
                    "area": bw * bh,
                }
            )
            aid += 1
    import json

    with open(root / "train" / "labels.json", "w") as f:
        json.dump(
            {
                "images": images,
                "annotations": annotations,
                "categories": [{"id": 1, "name": "thing"}],
            },
            f,
        )
    return str(root)


def test_train_geometry_parity(coco_root):
    """Same seed -> the source wire samples bit-identical target sizes to
    the host wire (identical RNG draw order), and box counts agree."""
    ds = CocoDataset(coco_root, "train", None)
    host = T.TrainTransform(seed=11, normalize=False)
    src = T.TrainTransform(seed=11, normalize=False, emit_source=True)
    for i in range(len(ds)):
        img, tgt = ds[i]
        h_img, h_tgt = host(img, dict(tgt))
        s_img, s_tgt = src(img, dict(tgt))
        assert tuple(s_tgt["resize_to"]) == h_img.shape[:2]
        # sanitize agreement: the source wire drops at the scaled threshold
        assert len(s_tgt["boxes"]) == len(h_tgt["boxes"])
        if len(h_tgt["boxes"]):
            # normalized coordinates agree (path A exactly; path B within
            # crop-rounding slack of ~1 source pixel)
            sh, sw = s_img.shape[:2]
            hh, hw = h_img.shape[:2]
            a = s_tgt["boxes"] / np.array([sw, sh, sw, sh], np.float32)
            b = h_tgt["boxes"] / np.array([hw, hh, hw, hh], np.float32)
            np.testing.assert_allclose(a, b, atol=2.5 / min(sh, sw))


def test_val_prepared_image_equivalence(coco_root):
    """Deterministic val path, both wires over the same data: the prepared
    (device-resized + normalized) images must match the host-resized ones
    within resample-quantization tolerance, with identical masks/extents."""
    host_ds = CocoDataset(
        coco_root, "train", T.ValTransform(normalize=False)
    )
    src_ds = CocoDataset(
        coco_root, "train", T.ValTransform(normalize=False, emit_source=True)
    )
    host_loader = make_eval_loader(host_ds, 2, num_workers=0, image_dtype="uint8")
    src_loader = make_eval_loader(src_ds, 2, num_workers=0, wire="source")
    canvases = dict(zip(src_loader.source_buckets, src_loader.buckets))
    for hb, sb in zip(host_loader, src_loader):
        assert np.array_equal(hb["height"], sb["height"])
        assert np.array_equal(hb["width"], sb["width"])
        np.testing.assert_allclose(
            sb["boxes"], hb["boxes"], atol=0.51, rtol=1e-5
        )
        href = prepare_image(
            jnp.asarray(hb["image"]), jnp.asarray(hb["height"]),
            jnp.asarray(hb["width"]),
        )
        got = prepare_batch_image(
            {k: jnp.asarray(v) for k, v in sb.items() if k != "pad_count"},
            canvases,
        )
        assert got.shape == href.shape
        err = np.abs(np.asarray(got) - np.asarray(href))
        # 2 uint8 levels after ImageNet std scaling (~1/(255*0.225))
        assert err.mean() < 2.0 / (255 * 0.225), err.mean()
        assert np.quantile(err, 0.99) < 4.0 / (255 * 0.225)


def test_source_loader_batch_contract(coco_root):
    ds = CocoDataset(
        coco_root, "train",
        T.TrainTransform(seed=3, normalize=False, emit_source=True),
    )
    buckets = ((768, 768), (512, 1024), (1024, 512))
    loader = BucketedLoader(
        ds, 2, buckets=buckets, max_gt=16, shuffle=True, drop_last=False,
        num_workers=0, seed=3, wire="source",
    )
    srcs = derive_source_buckets(buckets)
    seen = 0
    for batch in loader:
        seen += 1
        sh, sw = batch["image"].shape[1:3]
        assert (sh, sw) in srcs
        i = srcs.index((sh, sw))
        bh, bw = buckets[i]
        assert batch["image"].dtype == np.uint8
        assert (batch["src_height"] <= sh).all()
        assert (batch["src_width"] <= sw).all()
        assert (batch["height"] <= bh).all() and (batch["width"] <= bw).all()
        # normalized == target-pixel boxes / target size where valid
        v = batch["gt_valid"]
        if v.any():
            tw = batch["width"][:, None].astype(np.float32)
            th = batch["height"][:, None].astype(np.float32)
            np.testing.assert_allclose(
                batch["boxes"][..., 0][v],
                (batch["boxes_normalized"][..., 0] * tw)[v],
                rtol=1e-5, atol=1e-4,
            )
            np.testing.assert_allclose(
                batch["boxes"][..., 3][v],
                (batch["boxes_normalized"][..., 3] * th)[v],
                rtol=1e-5, atol=1e-4,
            )
    assert seen >= 3


def test_train_step_runs_on_source_wire(coco_root):
    """Tiny DETR train step consumes a source-wire batch end-to-end (device
    resize inside the jitted step) with a finite loss and gradients."""
    import jax

    from detr_tpu.config import DETRConfig, TrainingConfig
    from detr_tpu.train.optimizer import build_optimizer
    from detr_tpu.train.train_step import (
        build_criterion, create_train_state, make_train_step,
    )
    from detr_tpu.models import DETR

    ds = CocoDataset(
        coco_root, "train",
        T.TrainTransform(seed=5, normalize=False, emit_source=True),
    )
    buckets = ((256, 256),)
    loader = BucketedLoader(
        ds, 2, buckets=buckets, max_gt=8, shuffle=False, drop_last=False,
        num_workers=0, wire="source", source_buckets=((160, 160),),
    )
    canvases = {(160, 160): (256, 256)}
    batch = next(iter(loader))
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "pad_count"}

    dcfg = DETRConfig(
        num_object_queries=8, num_encoder_layers=1, num_decoder_layers=1,
        num_attention_heads=2, hidden_size=16, ffn_scale_factor=2,
        num_classes=2, dtype="float32",
    )
    tcfg = TrainingConfig(train_batch_size=2, cumulative_train_batch_size=2)
    model = DETR(dcfg)
    criterion = build_criterion(tcfg, dcfg)
    tx, _ = build_optimizer(tcfg)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), batch, canvas_map=canvases
    )
    step = make_train_step(model, criterion, donate=False, canvas_map=canvases)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0.0
