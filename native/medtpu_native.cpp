// med_tpu native runtime helpers.
//
// The reference repo (GonzaloPlaaza/Multimodal-Error-Detection) is pure
// Python; its performance-critical *host-side* loops are reimplemented here
// in C++ and exposed over a C ABI consumed via ctypes
// (med_tpu/utils/native.py). Device compute stays in JAX/XLA/Pallas.
//
//  - window_scan:        sequential sliding-window scan
//                        (reference MED/dataset/dataset_utils.py:214-239)
//  - siamese_train_pairs: O(n^2) training-pair construction
//                        (reference MED/dataset/dataset_utils.py:588-672)
//  - preprocess_frames:  resize 240x240 -> center-crop 224 -> /255 ->
//                        normalize (reference preprocessing_utils.py:72-79
//                        + resnet_finetuning.ipynb transform)
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// Emit window start indices for one subject's gesture vector.
// A window [s, s+window) is emitted iff g[s] == g[s+window-1]; on emission
// the scan advances by `stride`, otherwise by 1. Scanning stops once
// s >= n - window. Returns the number of starts written to `out`.
int64_t window_scan(const int32_t* g, int64_t n, int64_t start,
                    int64_t window, int64_t stride, int64_t* out) {
  int64_t count = 0;
  int64_t s = start;
  while (s < n - window) {
    if (g[s] != g[s + window - 1]) {
      s += 1;
      continue;
    }
    out[count++] = s;
    s += stride;
  }
  return count;
}

// Training-pair construction for the siamese models.
//
// Pairs (i, j) with j >= i+2 are created when the windows belong to
// different subjects, different gestures, or different instances of the same
// gesture (an intervening window with another gesture exists). Label 0 =
// both clean, 1 = exactly one erroneous; both-erroneous pairs are skipped.
// Instance counters replicate the reference's bookkeeping: instance_1
// resets to 0 on subject change and increments on gesture change;
// instance_2 starts at 1 for every i and is only updated for j > i+2.
//
// Writes up to `capacity` pairs; returns the number written.
int64_t siamese_train_pairs(const int32_t* gest, const int32_t* err,
                            const int32_t* subj, int64_t n,
                            int64_t* pos1, int64_t* pos2,
                            int32_t* inst1, int32_t* inst2,
                            int32_t* label, int64_t capacity) {
  // Precompute gesture-run ids: a run ends when subject or gesture changes.
  // Two same-subject same-gesture windows are in different instances iff
  // their run ids differ.
  int64_t* run = new int64_t[n];
  int64_t run_id = 0;
  for (int64_t k = 0; k < n; ++k) {
    if (k > 0 && (subj[k] != subj[k - 1] || gest[k] != gest[k - 1])) ++run_id;
    run[k] = run_id;
  }

  int64_t count = 0;
  int32_t instance_count_1 = 0;
  for (int64_t i = 0; i < n && count < capacity; ++i) {
    if (i != 0) {
      if (subj[i] != subj[i - 1]) instance_count_1 = 0;
      else if (gest[i] != gest[i - 1]) ++instance_count_1;
    }
    int32_t instance_count_2 = 1;
    for (int64_t j = i + 2; j < n && count < capacity; ++j) {
      if (j != i + 2) {
        if (subj[j] != subj[j - 1]) instance_count_2 = 0;
        else if (gest[j] != gest[j - 1]) ++instance_count_2;
      }
      bool create = false;
      if (subj[i] != subj[j]) create = true;
      else if (gest[i] != gest[j]) create = true;
      else if (run[i] != run[j]) create = true;  // same gesture, new instance
      if (!create) continue;

      int32_t lab;
      if (err[i] == 0 && err[j] == 0) lab = 0;
      else if ((err[i] == 1 && err[j] == 0) || (err[i] == 0 && err[j] == 1)) lab = 1;
      else continue;  // both erroneous

      pos1[count] = i;
      pos2[count] = j;
      inst1[count] = instance_count_1;
      inst2[count] = instance_count_2;
      label[count] = lab;
      ++count;
    }
  }
  delete[] run;
  return count;
}

// Bilinear resize (H, W) -> (240, 240), center-crop to 224x224, scale to
// [0, 1], and channel-normalize. Input uint8 NHWC, output float32 NHWC.
void preprocess_frames(const uint8_t* frames, int64_t n, int64_t h, int64_t w,
                       const float* mean, const float* stdv, float* out) {
  const int RH = 240, RW = 240, C = 224;
  const int y0 = (RH - C) / 2, x0 = (RW - C) / 2;
  const float sy = static_cast<float>(h) / RH;
  const float sx = static_cast<float>(w) / RW;
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3] = {1.0f / stdv[0], 1.0f / stdv[1], 1.0f / stdv[2]};

  for (int64_t f = 0; f < n; ++f) {
    const uint8_t* src = frames + f * h * w * 3;
    float* dst = out + f * C * C * 3;
    for (int oy = 0; oy < C; ++oy) {
      // Map through the crop back to resized, then to source coordinates
      // (half-pixel-centered bilinear, matching common resize semantics).
      float fy = (oy + y0 + 0.5f) * sy - 0.5f;
      fy = std::max(0.0f, std::min(fy, static_cast<float>(h - 1)));
      int64_t iy0 = static_cast<int64_t>(fy);
      int64_t iy1 = std::min(iy0 + 1, h - 1);
      float wy = fy - iy0;
      for (int ox = 0; ox < C; ++ox) {
        float fx = (ox + x0 + 0.5f) * sx - 0.5f;
        fx = std::max(0.0f, std::min(fx, static_cast<float>(w - 1)));
        int64_t ix0 = static_cast<int64_t>(fx);
        int64_t ix1 = std::min(ix0 + 1, w - 1);
        float wx = fx - ix0;
        for (int c = 0; c < 3; ++c) {
          float v00 = src[(iy0 * w + ix0) * 3 + c];
          float v01 = src[(iy0 * w + ix1) * 3 + c];
          float v10 = src[(iy1 * w + ix0) * 3 + c];
          float v11 = src[(iy1 * w + ix1) * 3 + c];
          float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                    v10 * wy * (1 - wx) + v11 * wy * wx;
          dst[(oy * C + ox) * 3 + c] = (v * inv255 - mean[c]) * inv_std[c];
        }
      }
    }
  }
}

}  // extern "C"
