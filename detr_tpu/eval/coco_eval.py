"""From-scratch COCO mAP evaluator (pure numpy).

TPU-native replacement for the pycocotools C eval kernel the reference uses
through torchmetrics (reference detr/utils.py:9-54; SURVEY §2.2 row 2) —
pycocotools is not available in this environment, so the COCOeval protocol
is re-implemented faithfully:

  * 10 IoU thresholds 0.50:0.05:0.95; AP50/AP75 slices;
  * 101-point interpolated precision sampled at recall 0:0.01:1;
  * area ranges all / small(<32^2) / medium(32^2..96^2) / large(>96^2),
    computed from box area (torchmetrics' box-only behavior);
  * maxDets=100 per image per class, score-descending;
  * crowd handling: iscrowd GTs are ignore-GTs with union replaced by the
    detection's own area in the IoU, detections may match them without
    counting as TP or FP;
  * greedy per-detection matching in score order: best IoU >= t among
    unmatched GTs, preferring non-ignored GTs (a detection settles for an
    ignored GT only if no real GT clears the threshold);
  * unmatched detections outside the area range are ignored, not FPs;
  * classes with zero GT are excluded from the mean (precision = -1).

AP parity with pycocotools was verified on hand-constructed cases in
tests/test_coco_eval.py; eval runs offline on the host (not the train hot
path), matching the reference's placement.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05).round(2)  # 10 values
RECALL_THRESHOLDS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = 100


def _box_area(boxes: np.ndarray) -> np.ndarray:
    return np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )


def _iou_matrix(dets: np.ndarray, gts: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """(D, G) IoU; crowd GT columns use det-area as the denominator

    (pycocotools maskUtils.iou semantics)."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)), np.float64)
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = _box_area(dets)[:, None]
    area_g = _box_area(gts)[None, :]
    union = np.where(iscrowd[None, :], area_d, area_d + area_g - inter)
    return inter / np.maximum(union, 1e-12)


@dataclass
class _ImageEval:
    """Per-(image, class) match bookkeeping across IoU thresholds."""

    det_scores: np.ndarray  # (D,)
    det_matched_ignore: np.ndarray  # (T, D) bool — matched to ignored GT
    det_matched: np.ndarray  # (T, D) bool
    det_ignore_area: np.ndarray  # (D,) bool — unmatched + outside area range
    num_gt: int  # non-ignored GT count


class CocoEvaluator:
    """Accumulates detections + ground truth; computes the COCO AP family."""

    def __init__(self, num_classes: int, class_names=None):
        self.num_classes = num_classes
        self.class_names = class_names
        self.reset()

    def reset(self):
        self._dets = defaultdict(list)  # image_id -> list of (box, score, label)
        self._gts = defaultdict(list)  # image_id -> (boxes, labels, iscrowd)
        self._image_ids = []
        self._group_cache: dict = {}  # image_id -> {cls: (db, ds, gb, gc)}

    def add_image(
        self,
        image_id: int,
        det_boxes: np.ndarray,
        det_scores: np.ndarray,
        det_labels: np.ndarray,
        gt_boxes: np.ndarray,
        gt_labels: np.ndarray,
        gt_iscrowd: np.ndarray | None = None,
    ):
        """All boxes XYXY in pixels."""
        if gt_iscrowd is None:
            gt_iscrowd = np.zeros(len(gt_boxes), bool)
        self._image_ids.append(image_id)
        self._dets[image_id] = (
            np.asarray(det_boxes, np.float64).reshape(-1, 4),
            np.asarray(det_scores, np.float64).reshape(-1),
            np.asarray(det_labels, np.int64).reshape(-1),
        )
        self._gts[image_id] = (
            np.asarray(gt_boxes, np.float64).reshape(-1, 4),
            np.asarray(gt_labels, np.int64).reshape(-1),
            np.asarray(gt_iscrowd, bool).reshape(-1),
        )
        self._group_cache.pop(image_id, None)

    # ------------------------------------------------------------- matching

    def _grouped(self, image_id) -> dict:
        """{cls: (det_boxes, det_scores, gt_boxes, gt_iscrowd)} built ONCE
        per image (pycocotools keeps a per-(img, cat) index the same way):
        compute() iterates all num_classes per image, and rescanning the
        label arrays 80x per image dominated at 5k-image scale."""
        cache = self._group_cache.get(image_id)
        if cache is None:
            db, ds, dl = self._dets[image_id]
            gb, gl, gc = self._gts[image_id]
            cache = {}
            present = np.unique(np.concatenate([dl, gl])) if (
                len(dl) or len(gl)
            ) else ()
            for cls in present:
                dsel = dl == cls
                gsel = gl == cls
                cache[int(cls)] = (db[dsel], ds[dsel], gb[gsel], gc[gsel])
            self._group_cache[image_id] = cache
        return cache

    def _image_class_data(self, image_id, cls) -> dict | None:
        """Range-independent work, done ONCE per (image, class) and reused by
        all four area ranges (pycocotools computes IoU once per (img, cat)
        too): det/GT selection, score sort + maxDets cap, areas, and the IoU
        matrix (in base GT order — per-range matching permutes its columns)."""
        entry = self._grouped(image_id).get(cls)
        if entry is None:
            return None
        db, ds, gb, gc = entry

        # sort dets by score desc, cap maxDets
        order = np.argsort(-ds, kind="mergesort")[:MAX_DETS]
        db, ds = db[order], ds[order]
        return {
            "ds": ds,
            "gc": gc,
            "ious": _iou_matrix(db, gb, gc),
            "d_area": _box_area(db),
            "g_area": _box_area(gb),
        }

    def _evaluate_image(self, data: dict, area_range) -> _ImageEval:
        """Per-area-range matching on top of cached (image, class) data."""
        ds, gc = data["ds"], data["gc"]
        lo, hi = area_range
        g_ignore = gc | (data["g_area"] < lo) | (data["g_area"] > hi)

        # sort gts: non-ignored first (pycocotools gtind ordering); permute
        # the cached IoU columns to match.
        g_order = np.argsort(g_ignore, kind="mergesort")
        gc, g_ignore = gc[g_order], g_ignore[g_order]
        ious = data["ious"][:, g_order]
        T = len(IOU_THRESHOLDS)
        D, G = ious.shape

        # Native C++ inner loop when the toolchain is available
        # (native/cocoeval.cc — the pycocotools-C-kernel equivalent).
        native = None
        if D and G:
            from detr_tpu.eval import _native

            native = _native.match_detections(ious, gc, g_ignore, IOU_THRESHOLDS)
        if native is not None:
            det_matched, det_matched_ignore = native
        elif D == 0 or G == 0:
            # Nothing can match: skip the scalar loops (the D>0, G==0 case —
            # a class detected in an image with no GT of it — is extremely
            # common and was burning T*D no-op iterations per call).
            det_matched = np.zeros((T, D), bool)
            det_matched_ignore = np.zeros((T, D), bool)
        else:
            det_matched = np.zeros((T, D), bool)
            det_matched_ignore = np.zeros((T, D), bool)
            for ti, t in enumerate(IOU_THRESHOLDS):
                gt_taken = np.zeros(G, bool)
                for d in range(D):
                    best_iou = min(t, 1 - 1e-10)
                    best_g = -1
                    for g in range(G):
                        if gt_taken[g] and not gc[g]:
                            continue  # taken non-crowd GT can't rematch
                        # holding a real GT and remaining are ignored -> stop
                        # (gts are sorted real-first)
                        if best_g > -1 and not g_ignore[best_g] and g_ignore[g]:
                            break
                        if ious[d, g] < best_iou:
                            continue
                        best_iou = ious[d, g]
                        best_g = g
                    if best_g == -1:
                        continue
                    det_matched[ti, d] = True
                    det_matched_ignore[ti, d] = g_ignore[best_g]
                    gt_taken[best_g] = True

        d_area = data["d_area"]
        det_ignore_area = (d_area < lo) | (d_area > hi)
        return _ImageEval(
            det_scores=ds,
            det_matched_ignore=det_matched_ignore,
            det_matched=det_matched,
            det_ignore_area=det_ignore_area,
            num_gt=int((~g_ignore).sum()),
        )

    # ----------------------------------------------------------- accumulate

    @staticmethod
    def _interp_precision(
        matched: np.ndarray,
        matched_ign: np.ndarray,
        ign_area: np.ndarray,
        num_gt: int,
    ) -> np.ndarray:
        """(T, R) interpolated precision from score-ordered match flags.

        ``matched``/``matched_ign`` are (T, D) bool, ``ign_area`` (D,) bool,
        all already in global score-descending order; ``num_gt`` > 0."""
        T, R = len(IOU_THRESHOLDS), len(RECALL_THRESHOLDS)
        precision = -np.ones((T, R))
        # det is ignored if matched to an ignored GT, or unmatched + out of
        # area range (pycocotools dtIg)
        ignored = matched_ign | (~matched & ign_area[None, :])
        tp = matched & ~ignored
        fp = ~matched & ~ignored

        tp_cum = np.cumsum(tp, axis=1).astype(np.float64)
        fp_cum = np.cumsum(fp, axis=1).astype(np.float64)
        for ti in range(T):
            rc = tp_cum[ti] / num_gt
            pr = tp_cum[ti] / np.maximum(tp_cum[ti] + fp_cum[ti], 1e-12)
            # monotone non-increasing interpolation (right to left),
            # vectorized: suffix running max == pycocotools' backward loop
            pr = np.maximum.accumulate(pr[::-1])[::-1]
            # sample at the 101 recall points (first index where rc >= r)
            idx = np.searchsorted(rc, RECALL_THRESHOLDS, side="left")
            prec = np.zeros(R)
            valid = idx < len(pr)
            prec[valid] = pr[idx[valid]]
            precision[ti] = prec
        return precision

    def _precision_for(self, class_data: list, area_range) -> np.ndarray:
        """(T, R) interpolated precision, or -1 where the class has no GT.

        ``class_data`` is the per-image cache from ``_image_class_data``."""
        evals = [self._evaluate_image(d, area_range) for d in class_data]
        T, R = len(IOU_THRESHOLDS), len(RECALL_THRESHOLDS)
        precision = -np.ones((T, R))
        if not evals:
            return precision
        num_gt = sum(e.num_gt for e in evals)
        if num_gt == 0:
            return precision

        scores = np.concatenate([e.det_scores for e in evals])
        order = np.argsort(-scores, kind="mergesort")
        matched = np.concatenate([e.det_matched for e in evals], axis=1)[:, order]
        matched_ign = np.concatenate(
            [e.det_matched_ignore for e in evals], axis=1
        )[:, order]
        ign_area = np.concatenate([e.det_ignore_area for e in evals])[order]
        return self._interp_precision(matched, matched_ign, ign_area, num_gt)

    # ------------------------------------------------- batched native path

    def _prepare_batched(self):
        """Label-major global layout for the batched native kernel: every
        det/GT row concatenated across images, sorted by (label, image,
        -score) / (label, image) with stable order — per-class slices are
        then contiguous, with per-image blocks score-sorted inside, exactly
        the layout ``native/cocoeval.cc evaluate_blocks`` consumes."""
        imgs = self._image_ids
        db_l, ds_l, dl_l, di_l = [], [], [], []
        gb_l, gl_l, gc_l, gi_l = [], [], [], []
        for i, img in enumerate(imgs):
            db, ds, dl = self._dets[img]
            gb, gl, gc = self._gts[img]
            if len(ds):
                db_l.append(db); ds_l.append(ds); dl_l.append(dl)
                di_l.append(np.full(len(ds), i, np.int64))
            if len(gl):
                gb_l.append(gb); gl_l.append(gl); gc_l.append(gc)
                gi_l.append(np.full(len(gl), i, np.int64))

        def cat(parts, dtype, width=None):
            if not parts:
                shape = (0, width) if width else (0,)
                return np.zeros(shape, dtype)
            return np.concatenate(parts).astype(dtype, copy=False)

        db = cat(db_l, np.float64, 4)
        ds = cat(ds_l, np.float64)
        dl = cat(dl_l, np.int64)
        di = cat(di_l, np.int64)
        gb = cat(gb_l, np.float64, 4)
        gl = cat(gl_l, np.int64)
        gc = cat(gc_l, bool)
        gi = cat(gi_l, np.int64)

        # lexsort: LAST key is primary.  Stable, so within (label, image)
        # dets keep score-desc ties in insertion order (matching the
        # per-image argsort(-ds, mergesort)) and GTs keep insertion order.
        dorder = np.lexsort((-ds, di, dl))
        gorder = np.lexsort((gi, gl))
        return {
            "db": db[dorder], "ds": ds[dorder], "dl": dl[dorder],
            "di": di[dorder],
            "gb": gb[gorder], "gl": gl[gorder], "gc": gc[gorder],
            "gi": gi[gorder],
        }

    def _class_precisions_batched(self, prep: dict, cls: int):
        """{range_name: (T, R) precision} for one class via the native
        batched kernel, or None to fall back to the per-image path."""
        from detr_tpu.eval import _native

        d_lo, d_hi = np.searchsorted(prep["dl"], [cls, cls + 1])
        g_lo, g_hi = np.searchsorted(prep["gl"], [cls, cls + 1])
        db, ds, di = (
            prep["db"][d_lo:d_hi], prep["ds"][d_lo:d_hi], prep["di"][d_lo:d_hi]
        )
        gb, gc, gi = (
            prep["gb"][g_lo:g_hi], prep["gc"][g_lo:g_hi], prep["gi"][g_lo:g_hi]
        )

        T, R = len(IOU_THRESHOLDS), len(RECALL_THRESHOLDS)
        neg = -np.ones((T, R))
        if len(gb) == 0:
            # no GT of this class anywhere: every range is excluded (-1)
            return {name: neg for name in AREA_RANGES}

        # Per-image block offsets over the union of images that carry this
        # class (both slices are image-sorted, so blocks are contiguous).
        pres = np.union1d(np.unique(di), np.unique(gi))
        d_starts = np.searchsorted(di, pres, side="left")
        g_starts = np.searchsorted(gi, pres, side="left")
        d_off = np.append(d_starts, len(di)).astype(np.int64)
        g_off = np.append(g_starts, len(gi)).astype(np.int64)
        d_sizes = np.diff(d_off)

        # maxDets cap per (image, class), score order already per block
        if len(d_sizes) and d_sizes.max() > MAX_DETS:
            rank = np.arange(len(di)) - np.repeat(d_off[:-1], d_sizes)
            keep = rank < MAX_DETS
            db, ds, di = db[keep], ds[keep], di[keep]
            d_sizes = np.minimum(d_sizes, MAX_DETS)
            d_off = np.concatenate([[0], np.cumsum(d_sizes)]).astype(np.int64)

        g_sizes = np.diff(g_off)
        ious = _native.iou_blocks(db, gb, gc, d_off, g_off)
        if ious is None:
            return None
        iou_off = np.concatenate([[0], np.cumsum(d_sizes * g_sizes)]).astype(
            np.int64
        )
        lo = np.array([r[0] for r in AREA_RANGES.values()], np.float64)
        hi = np.array([r[1] for r in AREA_RANGES.values()], np.float64)
        res = _native.evaluate_blocks(
            ious, iou_off, d_off, g_off, gc, _box_area(gb), _box_area(db),
            IOU_THRESHOLDS, lo, hi,
        )
        if res is None:
            return None
        matched, matched_ign, ignore_area, num_gt = res

        order = np.argsort(-ds, kind="mergesort")
        out = {}
        for r, name in enumerate(AREA_RANGES):
            if num_gt[r] == 0:
                out[name] = neg
                continue
            out[name] = self._interp_precision(
                matched[r][:, order],
                matched_ign[r][:, order],
                ignore_area[r][order],
                int(num_gt[r]),
            )
        return out

    # -------------------------------------------------------------- compute

    def compute(self) -> dict[str, float]:
        from detr_tpu.eval import _native

        per_class_all = np.full(self.num_classes, -1.0)
        stats = {k: [] for k in ("all", "small", "medium", "large")}
        ap50, ap75 = [], []
        # Batched native path: one evaluate_blocks call per class covers
        # every image x IoU threshold x area range (the per-(image, class,
        # area) Python dispatch measured 117s for 5k images x 80 classes;
        # this layout brings the whole compute to a few seconds).
        prep = self._prepare_batched() if _native.load() is not None else None
        for cls in range(self.num_classes):
            precisions = (
                self._class_precisions_batched(prep, cls)
                if prep is not None
                else None
            )
            if precisions is None:  # no toolchain, or >=4096-GT image
                class_data = [
                    d
                    for img in self._image_ids
                    if (d := self._image_class_data(img, cls)) is not None
                ]
                precisions = {
                    name: self._precision_for(class_data, rng)
                    for name, rng in AREA_RANGES.items()
                }
            for range_name in AREA_RANGES:
                p = precisions[range_name]
                valid = p > -1
                ap = p[valid].mean() if valid.any() else -1.0
                if range_name == "all":
                    per_class_all[cls] = ap
                    if valid.any():
                        ap50.append(p[0][p[0] > -1].mean())
                        ap75.append(p[5][p[5] > -1].mean())
                if ap > -1:
                    stats[range_name].append(ap)

        def mean_or_neg(vals):
            return float(np.mean(vals)) if len(vals) else -1.0

        out = {
            "AP": mean_or_neg(stats["all"]),
            "AP50": mean_or_neg(ap50),
            "AP75": mean_or_neg(ap75),
            "AP-small": mean_or_neg(stats["small"]),
            "AP-medium": mean_or_neg(stats["medium"]),
            "AP-large": mean_or_neg(stats["large"]),
            "per_class": per_class_all,
        }
        return out
