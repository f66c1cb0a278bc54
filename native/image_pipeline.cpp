// Native host data pipeline for unigen_tpu.
//
// The reference's data path leans on Python/PIL/cv2 per-sample work inside
// torch DataLoader workers (reference src/dataloader.py). Feeding a TPU at
// batch-16/512^2 needs the host preprocessing off the GIL: this library does
// the per-image hot loops (bilinear resize, [-1,1] CHW normalisation, Sobel
// edge extraction, Gaussian blur, grayscale) in C++ with a std::thread
// parallel-for over the batch. Exposed as a plain C ABI for ctypes.
//
// Build: native/build.sh  ->  libunigen_data.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline uint8_t clamp_u8(float v) {
  return static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, v)));
}

void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  if (n_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> threads;
  std::atomic<int> next{0};
  int workers = std::min(n_threads, n);
  for (int t = 0; t < workers; ++t) {
    threads.emplace_back([&]() {
      while (true) {
        int i = next.fetch_add(1);
        if (i >= n) break;
        fn(i);
      }
    });
  }
  for (auto& th : threads) th.join();
}

void resize_bilinear_one(const uint8_t* src, int h, int w, uint8_t* dst,
                         int oh, int ow, int c) {
  const float sy = static_cast<float>(h) / oh;
  const float sx = static_cast<float>(w) / ow;
  for (int y = 0; y < oh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, static_cast<int>(std::floor(fy)));
    int y1 = std::min(h - 1, y0 + 1);
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < ow; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, static_cast<int>(std::floor(fx)));
      int x1 = std::min(w - 1, x0 + 1);
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int k = 0; k < c; ++k) {
        float v00 = src[(y0 * w + x0) * c + k];
        float v01 = src[(y0 * w + x1) * c + k];
        float v10 = src[(y1 * w + x0) * c + k];
        float v11 = src[(y1 * w + x1) * c + k];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(y * ow + x) * c + k] = clamp_u8(v + 0.5f);
      }
    }
  }
}

void normalize_chw_one(const uint8_t* src, float* dst, int h, int w, int c) {
  // HWC uint8 -> CHW float32 in [-1, 1]
  for (int k = 0; k < c; ++k)
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x)
        dst[k * h * w + y * w + x] =
            src[(y * w + x) * c + k] * (1.0f / 127.5f) - 1.0f;
}

void grayscale_one(const uint8_t* src, uint8_t* dst, int h, int w) {
  for (int i = 0; i < h * w; ++i) {
    float g = 0.299f * src[i * 3] + 0.587f * src[i * 3 + 1] +
              0.114f * src[i * 3 + 2];
    uint8_t v = clamp_u8(g);
    dst[i * 3] = dst[i * 3 + 1] = dst[i * 3 + 2] = v;
  }
}

void sobel_one(const uint8_t* src, uint8_t* dst, int h, int w,
               float threshold) {
  // luminance -> |sobel| -> thresholded edge map replicated to 3 channels
  std::vector<float> lum(h * w);
  for (int i = 0; i < h * w; ++i)
    lum[i] = 0.299f * src[i * 3] + 0.587f * src[i * 3 + 1] +
             0.114f * src[i * 3 + 2];
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int ym = std::max(0, y - 1), yp = std::min(h - 1, y + 1);
      int xm = std::max(0, x - 1), xp = std::min(w - 1, x + 1);
      float gx = lum[ym * w + xp] + 2 * lum[y * w + xp] + lum[yp * w + xp] -
                 lum[ym * w + xm] - 2 * lum[y * w + xm] - lum[yp * w + xm];
      float gy = lum[yp * w + xm] + 2 * lum[yp * w + x] + lum[yp * w + xp] -
                 lum[ym * w + xm] - 2 * lum[ym * w + x] - lum[ym * w + xp];
      float mag = std::sqrt(gx * gx + gy * gy);
      uint8_t v = mag > threshold ? 255 : 0;
      int i = y * w + x;
      dst[i * 3] = dst[i * 3 + 1] = dst[i * 3 + 2] = v;
    }
  }
}

void blur_one(const uint8_t* src, uint8_t* dst, int h, int w, float sigma) {
  int radius = std::max(1, static_cast<int>(sigma * 2.0f));
  std::vector<float> kernel(2 * radius + 1);
  float sum = 0;
  for (int i = -radius; i <= radius; ++i) {
    kernel[i + radius] = std::exp(-0.5f * i * i / (sigma * sigma));
    sum += kernel[i + radius];
  }
  for (auto& k : kernel) k /= sum;
  std::vector<float> tmp(h * w * 3);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      for (int c = 0; c < 3; ++c) {
        float acc = 0;
        for (int i = -radius; i <= radius; ++i) {
          int xx = std::min(w - 1, std::max(0, x + i));
          acc += kernel[i + radius] * src[(y * w + xx) * 3 + c];
        }
        tmp[(y * w + x) * 3 + c] = acc;
      }
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      for (int c = 0; c < 3; ++c) {
        float acc = 0;
        for (int i = -radius; i <= radius; ++i) {
          int yy = std::min(h - 1, std::max(0, y + i));
          acc += kernel[i + radius] * tmp[(yy * w + x) * 3 + c];
        }
        dst[(y * w + x) * 3 + c] = clamp_u8(acc);
      }
}

}  // namespace

extern "C" {

void resize_bilinear_batch(const uint8_t* src, int n, int h, int w, int c,
                           uint8_t* dst, int oh, int ow, int n_threads) {
  parallel_for(n, n_threads, [&](int i) {
    resize_bilinear_one(src + static_cast<int64_t>(i) * h * w * c, h, w,
                        dst + static_cast<int64_t>(i) * oh * ow * c, oh, ow, c);
  });
}

void normalize_chw_batch(const uint8_t* src, int n, int h, int w, int c,
                         float* dst, int n_threads) {
  parallel_for(n, n_threads, [&](int i) {
    normalize_chw_one(src + static_cast<int64_t>(i) * h * w * c,
                      dst + static_cast<int64_t>(i) * c * h * w, h, w, c);
  });
}

void grayscale_batch(const uint8_t* src, int n, int h, int w, uint8_t* dst,
                     int n_threads) {
  parallel_for(n, n_threads, [&](int i) {
    grayscale_one(src + static_cast<int64_t>(i) * h * w * 3,
                  dst + static_cast<int64_t>(i) * h * w * 3, h, w);
  });
}

void sobel_batch(const uint8_t* src, int n, int h, int w, uint8_t* dst,
                 float threshold, int n_threads) {
  parallel_for(n, n_threads, [&](int i) {
    sobel_one(src + static_cast<int64_t>(i) * h * w * 3,
              dst + static_cast<int64_t>(i) * h * w * 3, h, w, threshold);
  });
}

void gaussian_blur_batch(const uint8_t* src, int n, int h, int w, uint8_t* dst,
                         float sigma, int n_threads) {
  parallel_for(n, n_threads, [&](int i) {
    blur_one(src + static_cast<int64_t>(i) * h * w * 3,
             dst + static_cast<int64_t>(i) * h * w * 3, h, w, sigma);
  });
}

}  // extern "C"
