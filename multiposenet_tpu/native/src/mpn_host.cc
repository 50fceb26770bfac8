// Native host-side kernels for the multiposenet_tpu data/runtime layer.
//
// The TPU compute path is XLA/Pallas; this library covers the host-side hot
// loops the reference implemented natively or leaned on C extensions for:
//
//   mpn_rle_decode        COCO RLE -> mask (pycocotools' C rleDecode role;
//                         dominates DetectionDataset item cost)
//   mpn_cpu_nms           greedy +1px-IoU NMS, the host fallback twin of the
//                         on-device kernels (reference lib/nms/src/nms.c:4-69
//                         behavior, fresh implementation)
//   mpn_put_gaussian_maps accumulate-and-clip keypoint heatmap targets
//                         (reference datasets/coco_data/heatmap.py:20-41),
//                         for host pipelines/fixtures
//
// Build: `make -C multiposenet_tpu/native` -> libmpn_host.so (ctypes).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// counts: run lengths of alternating 0/1 in column-major order.
// out: h*w row-major uint8 buffer (caller-allocated, zeroed here).
void mpn_rle_decode(const int64_t* counts, int64_t n_counts, int64_t h,
                    int64_t w, uint8_t* out) {
  // decode contiguously into a column-major scratch (runs are memset-able),
  // then transpose — avoids per-pixel div/mod on the scattered writes
  const int64_t total = h * w;
  std::vector<uint8_t> cm(static_cast<size_t>(total), 0);
  int64_t pos = 0;
  uint8_t val = 0;
  for (int64_t i = 0; i < n_counts && pos < total; ++i) {
    int64_t run = counts[i];
    if (run > total - pos) run = total - pos;
    if (val) std::memset(cm.data() + pos, 1, static_cast<size_t>(run));
    pos += run;
    val ^= 1;
  }
  // cm is (w, h) row-major == (h, w) column-major; transpose into out
  for (int64_t c = 0; c < w; ++c) {
    const uint8_t* src = cm.data() + c * h;
    uint8_t* dst = out + c;
    for (int64_t r = 0; r < h; ++r) dst[r * w] = src[r];
  }
}

// Decode COCO's LEB128-style compressed counts string.
// out_counts: caller-allocated buffer of at least strlen(s) entries.
// Returns the number of counts decoded.
int64_t mpn_rle_counts_from_string(const char* s, int64_t len,
                                   int64_t* out_counts) {
  int64_t n = 0;
  int64_t i = 0;
  while (i < len) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more && i < len) {
      const int64_t c = static_cast<int64_t>(s[i]) - 48;
      x |= (c & 0x1F) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    if (n > 2) x += out_counts[n - 2];
    out_counts[n++] = x;
  }
  return n;
}

// boxes: (n, 4) x1,y1,x2,y2 float32, MUST be sorted by score descending.
// keep: caller-allocated n int64; returns number kept.
// IoU uses the legacy +1px convention; suppression is strict `>` to match
// the on-device kernels (ops/nms.py).
int64_t mpn_cpu_nms(const float* boxes, int64_t n, float thresh,
                    int64_t* keep) {
  std::vector<uint8_t> suppressed(static_cast<size_t>(n), 0);
  std::vector<float> areas(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) {
    const float* b = boxes + 4 * i;
    areas[i] = (b[2] - b[0] + 1.0f) * (b[3] - b[1] + 1.0f);
  }
  int64_t num_keep = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (suppressed[i]) continue;
    keep[num_keep++] = i;
    const float* bi = boxes + 4 * i;
    for (int64_t j = i + 1; j < n; ++j) {
      if (suppressed[j]) continue;
      const float* bj = boxes + 4 * j;
      const float xx1 = std::max(bi[0], bj[0]);
      const float yy1 = std::max(bi[1], bj[1]);
      const float xx2 = std::min(bi[2], bj[2]);
      const float yy2 = std::min(bi[3], bj[3]);
      const float iw = std::max(0.0f, xx2 - xx1 + 1.0f);
      const float ih = std::max(0.0f, yy2 - yy1 + 1.0f);
      const float inter = iw * ih;
      const float iou = inter / (areas[i] + areas[j] - inter);
      if (iou > thresh) suppressed[j] = 1;
    }
  }
  return num_keep;
}

// joints: (p, j, 3) float32 [x, y, v]; draw iff v <= 1.
// out: (grid_h, grid_w, j) float32, caller-zeroed or not (we overwrite).
// Matches putGaussianMaps: grid = i*stride + stride/2 - 0.5,
// exponent cutoff ln(100), per-channel sum clipped at 1.
void mpn_put_gaussian_maps(const float* joints, int64_t num_people,
                           int64_t num_joints, int64_t grid_h, int64_t grid_w,
                           int64_t stride, float sigma, float* out) {
  const float start = stride / 2.0f - 0.5f;
  const float denom = 2.0f * sigma * sigma;
  const float cutoff = 4.6052f;
  std::memset(out, 0,
              sizeof(float) * static_cast<size_t>(grid_h) * grid_w * num_joints);
  for (int64_t p = 0; p < num_people; ++p) {
    for (int64_t j = 0; j < num_joints; ++j) {
      const float* row = joints + (p * num_joints + j) * 3;
      if (row[2] > 1.0f) continue;
      const float cx = row[0], cy = row[1];
      for (int64_t gy = 0; gy < grid_h; ++gy) {
        const float y = gy * static_cast<float>(stride) + start;
        const float dy2 = (y - cy) * (y - cy);
        float* out_row = out + (gy * grid_w) * num_joints + j;
        for (int64_t gx = 0; gx < grid_w; ++gx) {
          const float x = gx * static_cast<float>(stride) + start;
          const float e = (dy2 + (x - cx) * (x - cx)) / denom;
          if (e <= cutoff) {
            float v = out_row[gx * num_joints] + std::exp(-e);
            out_row[gx * num_joints] = v > 1.0f ? 1.0f : v;
          }
        }
      }
    }
  }
}

}  // extern "C"
