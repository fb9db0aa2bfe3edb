// frameproc: multithreaded host-side frame preprocessing.
//
// Native replacement for the decode/resize path the reference delegates to
// ffmpeg's scaler and torchvision's C++ video_reader (data/utils.py:51-66,
// 106-113): aspect-preserving bilinear resize to max-side `resolution`,
// center zero-padding to a square, HWC-uint8 -> CHW-uint8 transpose, batched
// over frames with a simple thread pool. Output feeds jax.device_put
// directly (normalization runs fused on-device, models/siglip.py).
//
// Exposed via ctypes (videollm_online_tpu/data/frameproc.py).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Bilinear resize one channel-interleaved HWC uint8 image.
void resize_bilinear_hwc(const uint8_t* src, int sh, int sw, uint8_t* dst,
                         int dh, int dw, int channels) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    const float fy = (y + 0.5f) * sy - 0.5f;
    const int y0 = std::max(0, std::min(sh - 1, static_cast<int>(fy)));
    const int y1 = std::min(sh - 1, y0 + 1);
    const float wy = std::max(0.0f, std::min(1.0f, fy - y0));
    for (int x = 0; x < dw; ++x) {
      const float fx = (x + 0.5f) * sx - 0.5f;
      const int x0 = std::max(0, std::min(sw - 1, static_cast<int>(fx)));
      const int x1 = std::min(sw - 1, x0 + 1);
      const float wx = std::max(0.0f, std::min(1.0f, fx - x0));
      for (int c = 0; c < channels; ++c) {
        const float v00 = src[(y0 * sw + x0) * channels + c];
        const float v01 = src[(y0 * sw + x1) * channels + c];
        const float v10 = src[(y1 * sw + x0) * channels + c];
        const float v11 = src[(y1 * sw + x1) * channels + c];
        const float top = v00 + (v01 - v00) * wx;
        const float bot = v10 + (v11 - v10) * wx;
        dst[(y * dw + x) * channels + c] =
            static_cast<uint8_t>(top + (bot - top) * wy + 0.5f);
      }
    }
  }
}

void process_one(const uint8_t* src, int sh, int sw, uint8_t* dst, int res) {
  // aspect-preserving target size (max side = res)
  int th, tw;
  if (sw >= sh) {
    tw = res;
    th = std::max(1, sh * res / sw);
  } else {
    th = res;
    tw = std::max(1, sw * res / sh);
  }
  std::vector<uint8_t> resized(static_cast<size_t>(th) * tw * 3);
  resize_bilinear_hwc(src, sh, sw, resized.data(), th, tw, 3);
  // center pad + HWC->CHW
  const int oy = (res - th) / 2;
  const int ox = (res - tw) / 2;
  std::memset(dst, 0, static_cast<size_t>(3) * res * res);
  for (int c = 0; c < 3; ++c) {
    uint8_t* plane = dst + static_cast<size_t>(c) * res * res;
    for (int y = 0; y < th; ++y) {
      uint8_t* row = plane + static_cast<size_t>(oy + y) * res + ox;
      const uint8_t* srow = resized.data() + (static_cast<size_t>(y) * tw) * 3;
      for (int x = 0; x < tw; ++x) row[x] = srow[x * 3 + c];
    }
  }
}

}  // namespace

extern "C" {

// frames: (n, sh, sw, 3) uint8 HWC -> out: (n, 3, res, res) uint8 CHW
void preprocess_frames(const uint8_t* frames, int n, int sh, int sw,
                       uint8_t* out, int res, int num_threads) {
  const size_t in_stride = static_cast<size_t>(sh) * sw * 3;
  const size_t out_stride = static_cast<size_t>(3) * res * res;
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i)
      process_one(frames + i * in_stride, sh, sw, out + i * out_stride, res);
    return;
  }
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      process_one(frames + i * in_stride, sh, sw, out + i * out_stride, res);
    }
  };
  std::vector<std::thread> pool;
  const int nt = std::min(num_threads, n);
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
