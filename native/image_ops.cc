// Native host-pipeline image kernels (OpenMP).
//
// The Python augmentation chain (detr_tpu/data/transforms.py) is the host
// side of the training input pipeline; profiling put the numpy HSV hue
// rotation at ~57 ms/image and normalization at ~18 ms — at 164 img/s of
// TPU consumption (bench.py) the CPU pipeline becomes the trainer's
// bottleneck.  These kernels implement the exact float math of the numpy
// reference implementations (which remain as fallbacks) in one interleaved
// pass per pixel.
//
// Role-equivalent of the reference's native input-pipeline dependencies
// (torchvision C++ transforms / PIL C paths — SURVEY §2.2 last row).
//
// Built lazily by detr_tpu/data/_native.py via g++ -O3 -fopenmp.

#include <cmath>
#include <cstdint>

extern "C" {

// In-place hue rotation on interleaved (n_px, 3) float32 RGB in [0, 255].
// delta is a fraction of the full hue circle.  Matches
// transforms.adjust_hue's float math (HSV roundtrip, sextant gather).
void hue_rotate_f32(float* img, long n_px, float delta) {
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n_px; ++i) {
    float r = img[3 * i] * (1.0f / 255.0f);
    float g = img[3 * i + 1] * (1.0f / 255.0f);
    float b = img[3 * i + 2] * (1.0f / 255.0f);
    float mx = r > g ? (r > b ? r : b) : (g > b ? g : b);
    float mn = r < g ? (r < b ? r : b) : (g < b ? g : b);
    float diff = mx - mn + 1e-12f;
    float h;
    if (mx == r) {
      h = fmodf((g - b) / diff, 6.0f);
      if (h < 0.0f) h += 6.0f;  // python % semantics
    } else if (mx == g) {
      h = (b - r) / diff + 2.0f;
    } else {
      h = (r - g) / diff + 4.0f;
    }
    h *= (1.0f / 6.0f);
    float s = mx > 0.0f ? diff / (mx + 1e-12f) : 0.0f;
    float v = mx;
    h = fmodf(h + delta, 1.0f);
    if (h < 0.0f) h += 1.0f;
    float h6 = h * 6.0f;
    float fi = floorf(h6);
    float f = h6 - fi;
    float p = v * (1.0f - s);
    float q = v * (1.0f - f * s);
    float t = v * (1.0f - (1.0f - f) * s);
    int sex = ((int)fi) % 6;
    float ro, go, bo;
    switch (sex) {
      case 0: ro = v; go = t; bo = p; break;
      case 1: ro = q; go = v; bo = p; break;
      case 2: ro = p; go = v; bo = t; break;
      case 3: ro = p; go = q; bo = v; break;
      case 4: ro = t; go = p; bo = v; break;
      default: ro = v; go = p; bo = q; break;
    }
    auto clip = [](float x) {
      x *= 255.0f;
      return x < 0.0f ? 0.0f : (x > 255.0f ? 255.0f : x);
    };
    img[3 * i] = clip(ro);
    img[3 * i + 1] = clip(go);
    img[3 * i + 2] = clip(bo);
  }
}

// out = u8 * scale[c] - bias[c]   (ImageNet normalization, fused)
void normalize_u8_f32(const uint8_t* img, float* out, long n_px,
                      const float* scale, const float* bias) {
  const float s0 = scale[0], s1 = scale[1], s2 = scale[2];
  const float b0 = bias[0], b1 = bias[1], b2 = bias[2];
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n_px; ++i) {
    out[3 * i] = img[3 * i] * s0 - b0;
    out[3 * i + 1] = img[3 * i + 1] * s1 - b1;
    out[3 * i + 2] = img[3 * i + 2] * s2 - b2;
  }
}

}  // extern "C"
