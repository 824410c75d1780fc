"""COCO dataset: host-side JSON parsing and image loading.

Equivalent of the reference ``CocoDataset`` (detr/data.py:86-148) without the
torchvision/pycocotools dependency: a small self-contained COCO-JSON parser
(images, annotations, categories) with the same directory layout
``<root>/<split>/data`` + ``<root>/<split>/labels.json`` (reference
detr/data.py:94-95), the same class-id <-> contiguous-index maps (reference
detr/data.py:103-107), and the same empty-image handling (reference
detr/data.py:132-139).

``__getitem__`` returns ``(PIL.Image, target)`` where target carries numpy
arrays: boxes (N, 4) XYXY float32, class_idx (N,) int64, class_id (N,),
iscrowd (N,) bool, image_id int — the transform pipeline
(detr_tpu/data/transforms.py) consumes and updates them.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import numpy as np

try:  # PIL is in the base image; guard anyway for import-light contexts
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


class CocoDataset:
    def __init__(
        self,
        dataset_root: str,
        split: str = "train",
        transform: Optional[Callable] = None,
    ):
        assert split in ("train", "validation")
        self.root = os.path.join(dataset_root, split, "data")
        ann_file = os.path.join(dataset_root, split, "labels.json")
        with open(ann_file) as f:
            coco = json.load(f)

        self.transform = transform

        # categories (insertion order == pycocotools key order)
        cats = {c["id"]: c for c in coco.get("categories", [])}
        self.class_id2name = {cid: c["name"] for cid, c in cats.items()}
        self.class_id2idx = {cid: idx for idx, cid in enumerate(cats.keys())}
        self.class_idx2id = {idx: cid for cid, idx in self.class_id2idx.items()}
        self.class_names = [c["name"] for c in cats.values()]

        self.images = sorted(coco.get("images", []), key=lambda im: im["id"])
        self._by_image: dict[int, list] = {im["id"]: [] for im in self.images}
        for ann in coco.get("annotations", []):
            if ann["image_id"] in self._by_image:
                self._by_image[ann["image_id"]].append(ann)

    @property
    def num_classes(self) -> int:
        return len(self.class_names)

    def set_worker_seed(self, worker_seed: int) -> None:
        """Decorrelate the transform's RNG in a loader worker process.

        Called by BucketedLoader's pool initializer after unpickling —
        without this every worker would replay the identical augmentation
        stream (each holds an identical copy of the transform)."""
        t = self.transform
        if t is not None and hasattr(t, "rng"):
            t.rng = np.random.default_rng([worker_seed & 0x7FFFFFFF, 0xDE7])

    def __len__(self) -> int:
        return len(self.images)

    def load_image(self, idx: int):
        info = self.images[idx]
        path = os.path.join(self.root, info["file_name"])
        img = Image.open(path).convert("RGB")
        return img

    def raw_target(self, idx: int) -> dict:
        info = self.images[idx]
        anns = self._by_image[info["id"]]
        n = len(anns)
        boxes = np.zeros((n, 4), np.float32)
        class_id = np.zeros((n,), np.int64)
        iscrowd = np.zeros((n,), bool)
        for i, a in enumerate(anns):
            x, y, w, h = a["bbox"]  # COCO XYWH -> XYXY
            boxes[i] = (x, y, x + w, y + h)
            class_id[i] = a["category_id"]
            iscrowd[i] = bool(a.get("iscrowd", 0))
        class_idx = np.array(
            [self.class_id2idx[c] for c in class_id], np.int64
        ).reshape(n)
        return {
            "image_id": int(info["id"]),
            "boxes": boxes,
            "class_idx": class_idx,
            "class_id": class_id,
            "iscrowd": iscrowd,
        }

    def __getitem__(self, idx: int):
        img = self.load_image(idx)
        target = self.raw_target(idx)
        if self.transform is not None:
            img, target = self.transform(img, target)
        return img, target
