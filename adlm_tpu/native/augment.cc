// Native data-path core: image/label augmentation for the input
// pipeline.
//
// The reference feeds its GPU from torch DataLoader workers running
// cv2/PIL python per sample (reference segmentation/dataset.py:119-173).
// This library performs the same per-sample transform chain —
// scale-jitter bilinear resize, nearest label resize, pad-to-window,
// crop, horizontal flip, normalize — in C++, callable via ctypes, so
// host-side preprocessing keeps up with the TPU at production batch
// sizes.
//
// Semantics:
//  * image resize: classic half-pixel-center bilinear (cv2.INTER_LINEAR
//    semantics — what the reference uses; NOT PIL's antialiased reduce)
//  * label resize: PIL NEAREST mapping src = floor((i + 0.5) * in/out)
//    (what the reference's resize_label uses)
//  * randomness stays in Python: scale / crop offsets / flip arrive as
//    arguments, keeping parity tests deterministic.
//
// Build: see build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Bilinear resize uint8 HWC -> float32 HWC, half-pixel centers,
// edge-clamped (cv2.INTER_LINEAR semantics).
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        float* dst, int dh, int dw) {
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * scale_y - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), sh - 1);
    int y1c = std::min(std::max(y0 + 1, 0), sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * scale_x - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), sw - 1);
      int x1c = std::min(std::max(x0 + 1, 0), sw - 1);
      const uint8_t* p00 = src + (y0c * sw + x0c) * c;
      const uint8_t* p01 = src + (y0c * sw + x1c) * c;
      const uint8_t* p10 = src + (y1c * sw + x0c) * c;
      const uint8_t* p11 = src + (y1c * sw + x1c) * c;
      float* out = dst + (y * dw + x) * c;
      for (int ch = 0; ch < c; ++ch) {
        float top = p00[ch] * (1.0f - wx) + p01[ch] * wx;
        float bot = p10[ch] * (1.0f - wx) + p11[ch] * wx;
        out[ch] = top * (1.0f - wy) + bot * wy;
      }
    }
  }
}

// Nearest label resize: src = floor((i + 0.5) * in/out).  Matches PIL
// NEAREST except at exact-integer sampling centers, where PIL's pick
// depends on its internal float rounding (see ops/resize.py docstring).
void resize_nearest_i32(const int32_t* src, int sh, int sw,
                        int32_t* dst, int dh, int dw) {
  const double scale_y = static_cast<double>(sh) / dh;
  const double scale_x = static_cast<double>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    int sy = std::min(static_cast<int>((y + 0.5) * scale_y), sh - 1);
    for (int x = 0; x < dw; ++x) {
      int sx = std::min(static_cast<int>((x + 0.5) * scale_x), sw - 1);
      dst[y * dw + x] = src[sy * sw + sx];
    }
  }
}

// Full training-sample transform (reference dataset.py:119-173):
//   scaled = bilinear(img, round(h*scale), round(w*scale)) / 255 (or raw)
//   label  = nearest(label, same)
//   pad bottom/right to window with mean / 0
//   crop [start_h:start_h+wh, start_w:start_w+ww]
//   optional hflip
//   normalize (img - mean) / std   (skipped when `normalize` == 0)
// Caller passes scaled dims (sh2, sw2) explicitly (int(h*scale)).
void augment_sample(const uint8_t* img, const int32_t* label,
                    int h, int w, int channels,
                    int sh2, int sw2,
                    int window_h, int window_w,
                    int start_h, int start_w,
                    int flip, int cells, int normalize,
                    const float* mean, const float* stddev,
                    float* scratch_img, int32_t* scratch_label,
                    float* out_img, int32_t* out_label) {
  // 1. resize into scratch (sh2 x sw2); the reference resizes the
  // UINT8 image (cv2 rounds to uint8) before dividing by 255 —
  // replicate the quantization (round half-to-even like saturate_cast)
  resize_bilinear_u8(img, h, w, channels, scratch_img, sh2, sw2);
  for (int i = 0; i < sh2 * sw2 * channels; ++i) {
    float v = std::nearbyint(scratch_img[i]);
    scratch_img[i] = std::min(std::max(v, 0.0f), 255.0f);
  }
  resize_nearest_i32(label, h, w, scratch_label, sh2, sw2);
  const float inv255 = cells ? 1.0f : (1.0f / 255.0f);

  // 2-4. pad+crop+flip fused: walk output pixels, map to scratch coords
  for (int y = 0; y < window_h; ++y) {
    int sy = start_h + y;
    for (int x = 0; x < window_w; ++x) {
      int sx = start_w + x;
      int ox = flip ? (window_w - 1 - x) : x;
      float* out = out_img + (y * window_w + ox) * channels;
      int32_t* outl = out_label + y * window_w + ox;
      if (sy < sh2 && sx < sw2) {
        const float* in = scratch_img + (sy * sw2 + sx) * channels;
        for (int ch = 0; ch < channels; ++ch) {
          float v = in[ch] * inv255;
          out[ch] = normalize ? (v - mean[ch]) / stddev[ch] : v;
        }
        *outl = scratch_label[sy * sw2 + sx];
      } else {  // padding: image = dataset mean, label = 0
        for (int ch = 0; ch < channels; ++ch) {
          float v = mean[ch];
          out[ch] = normalize ? (v - mean[ch]) / stddev[ch] : v;
        }
        *outl = 0;
      }
    }
  }
}

}  // extern "C"
