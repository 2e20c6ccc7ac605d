// Native data-path ops for the host-side input pipeline.
//
// The reference's data path is cv2/PIL called step-by-step from Python
// (reference: datasets/ade20k.py:264-314) — eight full passes over each
// image with Python dispatch between them. These fused C++ kernels do the
// same work in single passes; they are loaded via ctypes
// (native/__init__.py) and selected with DAT_TPU_NATIVE=1, with the
// cv2/numpy implementation as the always-available fallback.
//
// Build: make -C dat_segmentation_tpu/native
//
// All images are HWC, uint8 (aug stages) or float32 (post-normalize),
// C-contiguous.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Bilinear resize, half-pixel centers (cv2 INTER_LINEAR convention),
// float arithmetic. uint8 -> uint8 with round-half-away like cv2's
// fixed-point rounding (within +-1 LSB of cv2).
void resize_bilinear_u8(const uint8_t* src, int h, int w, int c,
                        uint8_t* dst, int oh, int ow) {
  const float sy = (float)h / oh;
  const float sx = (float)w / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float ty = fy - y0;
    int y0c = std::max(0, std::min(y0, h - 1));
    int y1c = std::max(0, std::min(y0 + 1, h - 1));
    if (fy < 0) { ty = 0.f; }
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float tx = fx - x0;
      int x0c = std::max(0, std::min(x0, w - 1));
      int x1c = std::max(0, std::min(x0 + 1, w - 1));
      if (fx < 0) { tx = 0.f; }
      const uint8_t* p00 = src + (y0c * w + x0c) * c;
      const uint8_t* p01 = src + (y0c * w + x1c) * c;
      const uint8_t* p10 = src + (y1c * w + x0c) * c;
      const uint8_t* p11 = src + (y1c * w + x1c) * c;
      uint8_t* o = dst + (y * ow + x) * c;
      for (int k = 0; k < c; ++k) {
        float v = (1 - ty) * ((1 - tx) * p00[k] + tx * p01[k]) +
                  ty * ((1 - tx) * p10[k] + tx * p11[k]);
        o[k] = (uint8_t)std::min(255.f, std::max(0.f, v + 0.5f));
      }
    }
  }
}

// Nearest resize for label masks (cv2 INTER_NEAREST convention:
// src = floor(dst * scale)).
void resize_nearest_i32(const int32_t* src, int h, int w, int32_t* dst,
                        int oh, int ow) {
  const float sy = (float)h / oh;
  const float sx = (float)w / ow;
  for (int y = 0; y < oh; ++y) {
    int yy = std::min((int)(y * sy), h - 1);
    const int32_t* row = src + yy * w;
    for (int x = 0; x < ow; ++x) {
      dst[y * ow + x] = row[std::min((int)(x * sx), w - 1)];
    }
  }
}

// Fused normalize + pad: (img - mean)/std into a pre-sized float32
// canvas; the padded region stays at pad_value.
void normalize_pad_f32(const uint8_t* src, int h, int w,
                       const float* mean, const float* stdinv,
                       float* dst, int oh, int ow, float pad_value) {
  for (int i = 0; i < oh * ow * 3; ++i) dst[i] = pad_value;
  for (int y = 0; y < h; ++y) {
    const uint8_t* s = src + y * w * 3;
    float* o = dst + y * ow * 3;
    for (int x = 0; x < w; ++x) {
      o[x * 3 + 0] = (s[x * 3 + 0] - mean[0]) * stdinv[0];
      o[x * 3 + 1] = (s[x * 3 + 1] - mean[1]) * stdinv[1];
      o[x * 3 + 2] = (s[x * 3 + 2] - mean[2]) * stdinv[2];
    }
  }
}

// cat_max_ratio constraint check for RandomCrop
// (reference datasets/ade20k.py:162-202): returns 1 if the most frequent
// non-ignore class in the crop occupies < max_ratio of valid pixels.
int crop_cat_ok(const int32_t* mask, int h, int w, int top, int left,
                int ch, int cw, int num_classes, int ignore_index,
                float max_ratio) {
  // classes are < num_classes; small fixed histogram
  int64_t hist[512];
  std::memset(hist, 0, sizeof(hist));
  int64_t valid = 0;
  for (int y = top; y < top + ch; ++y) {
    const int32_t* row = mask + y * w;
    for (int x = left; x < left + cw; ++x) {
      int v = row[x];
      if (v != ignore_index && v >= 0 && v < num_classes && v < 512) {
        ++hist[v];
        ++valid;
      }
    }
  }
  if (valid == 0) return 1;  // only ignore pixels: max_ratio = 0 < cat_max
  int64_t mx = 0;
  for (int i = 0; i < std::min(num_classes, 512); ++i)
    mx = std::max(mx, hist[i]);
  return ((double)mx / (double)valid) < max_ratio ? 1 : 0;
}

// RGB<->HSV helpers matching OpenCV's uint8 conventions
// (H in [0,180), S,V in [0,255]).
static inline void rgb2hsv_px(float r, float g, float b, float* hsv) {
  float mx = std::max(r, std::max(g, b));
  float mn = std::min(r, std::min(g, b));
  float d = mx - mn;
  float hch;
  if (d == 0.f) hch = 0.f;
  else if (mx == r) hch = 60.f * (g - b) / d;
  else if (mx == g) hch = 120.f + 60.f * (b - r) / d;
  else hch = 240.f + 60.f * (r - g) / d;
  if (hch < 0) hch += 360.f;
  hsv[0] = hch * 0.5f;                       // [0, 180)
  hsv[1] = mx == 0.f ? 0.f : 255.f * d / mx; // [0, 255]
  hsv[2] = mx;
}

static inline void hsv2rgb_px(float h, float s, float v, uint8_t* rgb) {
  h = h * 2.f;  // back to degrees
  s /= 255.f;
  float cc = v * s;
  float hh = h / 60.f;
  float xx = cc * (1.f - std::fabs(std::fmod(hh, 2.f) - 1.f));
  float m = v - cc;
  float r, g, b;
  if (hh < 1) { r = cc; g = xx; b = 0; }
  else if (hh < 2) { r = xx; g = cc; b = 0; }
  else if (hh < 3) { r = 0; g = cc; b = xx; }
  else if (hh < 4) { r = 0; g = xx; b = cc; }
  else if (hh < 5) { r = xx; g = 0; b = cc; }
  else { r = cc; g = 0; b = xx; }
  rgb[0] = (uint8_t)std::min(255.f, std::max(0.f, r + m + 0.5f));
  rgb[1] = (uint8_t)std::min(255.f, std::max(0.f, g + m + 0.5f));
  rgb[2] = (uint8_t)std::min(255.f, std::max(0.f, b + m + 0.5f));
}

// Fused photometric distortion (reference datasets/ade20k.py:205-244):
// brightness delta, contrast alpha (order by mode), saturation factor,
// hue shift — one pass per pixel instead of five full-image ops.
// Disabled steps: pass delta=0 / alpha=1 / sat=1 / hue=0.
void photometric_distortion_u8(uint8_t* img, int h, int w,
                               float brightness_delta, float contrast_alpha,
                               float saturation, float hue_delta,
                               int contrast_first) {
  const int n = h * w;
  for (int i = 0; i < n; ++i) {
    uint8_t* px = img + i * 3;
    float r = px[0] + brightness_delta;
    float g = px[1] + brightness_delta;
    float b = px[2] + brightness_delta;
    if (contrast_first) { r *= contrast_alpha; g *= contrast_alpha; b *= contrast_alpha; }
    // quantize like the reference's uint8 round-trips
    r = std::min(255.f, std::max(0.f, r));
    g = std::min(255.f, std::max(0.f, g));
    b = std::min(255.f, std::max(0.f, b));
    r = (float)(uint8_t)(r); g = (float)(uint8_t)(g); b = (float)(uint8_t)(b);
    float hsv[3];
    rgb2hsv_px(r, g, b, hsv);
    hsv[1] = std::min(255.f, std::max(0.f, hsv[1] * saturation));
    hsv[0] = std::fmod(hsv[0] + hue_delta + 180.f, 180.f);
    uint8_t rgb[3];
    hsv2rgb_px(hsv[0], hsv[1], hsv[2], rgb);
    if (!contrast_first) {
      float rr = rgb[0] * contrast_alpha;
      float gg = rgb[1] * contrast_alpha;
      float bb = rgb[2] * contrast_alpha;
      px[0] = (uint8_t)std::min(255.f, std::max(0.f, rr));
      px[1] = (uint8_t)std::min(255.f, std::max(0.f, gg));
      px[2] = (uint8_t)std::min(255.f, std::max(0.f, bb));
    } else {
      px[0] = rgb[0]; px[1] = rgb[1]; px[2] = rgb[2];
    }
  }
}

// Per-class intersection/union counters for streaming mIoU on the host
// (reference new_train.py:276-309) — avoids two numpy bincount passes.
void intersect_union_i32(const int32_t* pred, const int32_t* label, int n,
                         int num_classes, int ignore_index,
                         int64_t* inter, int64_t* union_, int64_t* area_label) {
  for (int i = 0; i < n; ++i) {
    int l = label[i];
    if (l == ignore_index || l < 0 || l >= num_classes) continue;
    int p = pred[i];
    ++area_label[l];
    if (p >= 0 && p < num_classes) {
      if (p == l) { ++inter[l]; ++union_[l]; }
      else { ++union_[l]; ++union_[p]; }
    }
  }
}

}  // extern "C"
