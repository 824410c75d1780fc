// Native COCO-eval matching kernel.
//
// TPU-native-framework equivalent of pycocotools' C eval kernel (the
// reference consumes it through torchmetrics — reference detr/utils.py:14-18;
// SURVEY §2.2 row 2): the per-(image, category) greedy detection<->GT
// matching across IoU thresholds is the O(T * D * G) inner loop of COCO mAP
// and dominates eval time for large validation sets.  The surrounding
// protocol (sorting, accumulation, 101-point interpolation) stays in numpy
// (detr_tpu/eval/coco_eval.py); this kernel is loaded via ctypes with a
// pure-numpy fallback when no C++ toolchain is available.
//
// Semantics mirror pycocotools COCOeval.evaluateImg:
//   * crowd GT columns use det-area as the IoU denominator;
//   * detections iterate in score-descending order (pre-sorted by caller);
//   * GTs iterate real-first (pre-sorted by caller); a detection may steal
//     an ignored GT only if no real GT clears the threshold; taken non-crowd
//     GTs cannot rematch, crowd GTs can absorb multiple detections.
//
// Build: g++ -O3 -shared -fPIC -o libcocoeval.so cocoeval.cc

#include <cstdint>

extern "C" {

// IoU matrix with crowd handling. boxes are XYXY doubles.
// dets: (n_det, 4), gts: (n_gt, 4), iscrowd: (n_gt,), out: (n_det, n_gt).
void iou_matrix(const double* dets, int n_det, const double* gts, int n_gt,
                const uint8_t* iscrowd, double* out) {
  for (int d = 0; d < n_det; ++d) {
    const double dx0 = dets[d * 4 + 0], dy0 = dets[d * 4 + 1];
    const double dx1 = dets[d * 4 + 2], dy1 = dets[d * 4 + 3];
    const double area_d = (dx1 > dx0 ? dx1 - dx0 : 0.0) * (dy1 > dy0 ? dy1 - dy0 : 0.0);
    for (int g = 0; g < n_gt; ++g) {
      const double gx0 = gts[g * 4 + 0], gy0 = gts[g * 4 + 1];
      const double gx1 = gts[g * 4 + 2], gy1 = gts[g * 4 + 3];
      const double area_g = (gx1 > gx0 ? gx1 - gx0 : 0.0) * (gy1 > gy0 ? gy1 - gy0 : 0.0);
      const double ix0 = dx0 > gx0 ? dx0 : gx0;
      const double iy0 = dy0 > gy0 ? dy0 : gy0;
      const double ix1 = dx1 < gx1 ? dx1 : gx1;
      const double iy1 = dy1 < gy1 ? dy1 : gy1;
      const double iw = ix1 > ix0 ? ix1 - ix0 : 0.0;
      const double ih = iy1 > iy0 ? iy1 - iy0 : 0.0;
      const double inter = iw * ih;
      const double denom = iscrowd[g] ? area_d : (area_d + area_g - inter);
      out[d * n_gt + g] = denom > 1e-12 ? inter / denom : 0.0;
    }
  }
}

// Greedy matching across IoU thresholds.
//
// ious:        (n_det, n_gt) from iou_matrix (dets score-desc sorted,
//              gts real-first sorted).
// gt_iscrowd:  (n_gt,)   gt_ignore: (n_gt,)
// thresholds:  (n_thr,)
// det_matched, det_matched_ignore: (n_thr, n_det) outputs.
void match_detections(const double* ious, int n_det, int n_gt,
                      const uint8_t* gt_iscrowd, const uint8_t* gt_ignore,
                      const double* thresholds, int n_thr,
                      uint8_t* det_matched, uint8_t* det_matched_ignore) {
  // thread-free scratch: caller guarantees n_gt small (COCO <= ~100)
  uint8_t taken[4096];
  for (int t = 0; t < n_thr; ++t) {
    for (int g = 0; g < n_gt && g < 4096; ++g) taken[g] = 0;
    for (int d = 0; d < n_det; ++d) {
      double best_iou = thresholds[t] < 1.0 - 1e-10 ? thresholds[t] : 1.0 - 1e-10;
      int best_g = -1;
      for (int g = 0; g < n_gt; ++g) {
        if (taken[g] && !gt_iscrowd[g]) continue;
        // gts sorted real-first: once we hold a real match, stop at ignored
        if (best_g > -1 && !gt_ignore[best_g] && gt_ignore[g]) break;
        const double iou = ious[d * n_gt + g];
        if (iou < best_iou) continue;
        best_iou = iou;
        best_g = g;
      }
      const int idx = t * n_det + d;
      if (best_g == -1) {
        det_matched[idx] = 0;
        det_matched_ignore[idx] = 0;
      } else {
        det_matched[idx] = 1;
        det_matched_ignore[idx] = gt_ignore[best_g];
        taken[best_g] = 1;
      }
    }
  }
}

}  // extern "C"
