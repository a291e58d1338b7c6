// Native host-side batch ops for the input pipeline.
//
// The reference delegates its host data path to torch's C++ DataLoader and
// PIL; this framework's equivalent native layer provides the two hot
// per-sample operations after image decode:
//   - crop + bilinear/box resize on uint8 HWC (the RandomResizedCrop body),
//   - parallel batch collation (gather N HWC images into one NHWC buffer).
//
// Threading: a small persistent pool; callers pass num_threads.
// Exposed as a plain C ABI consumed via ctypes (cotnet_tpu/data/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Job {
  const uint8_t* src;
  int sh, sw;            // source dims
  int cx, cy, cw, ch;    // crop box
  uint8_t* dst;
  int oh, ow;            // output dims
};

// PIL-convention bilinear: sample at pixel centers of the crop box mapped
// onto the output grid (matches Image.resize(box=...) with BILINEAR for
// scale factors near 1; for heavy downscale PIL uses a wider support —
// callers wanting exact PIL output keep the PIL path).
void resize_one(const Job& j) {
  const float sx = static_cast<float>(j.cw) / j.ow;
  const float sy = static_cast<float>(j.ch) / j.oh;
  for (int oy = 0; oy < j.oh; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f + j.cy;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y0c = std::min(std::max(y0, 0), j.sh - 1);
    int y1c = std::min(std::max(y0 + 1, 0), j.sh - 1);
    uint8_t* drow = j.dst + static_cast<size_t>(oy) * j.ow * 3;
    const uint8_t* r0 = j.src + static_cast<size_t>(y0c) * j.sw * 3;
    const uint8_t* r1 = j.src + static_cast<size_t>(y1c) * j.sw * 3;
    for (int ox = 0; ox < j.ow; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f + j.cx;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x0c = std::min(std::max(x0, 0), j.sw - 1);
      int x1c = std::min(std::max(x0 + 1, 0), j.sw - 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = r0[x0c * 3 + c], v01 = r0[x1c * 3 + c];
        float v10 = r1[x0c * 3 + c], v11 = r1[x1c * 3 + c];
        float top = v00 + (v01 - v00) * wx;
        float bot = v10 + (v11 - v10) * wx;
        float v = top + (bot - top) * wy;
        drow[ox * 3 + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

void run_parallel(const std::vector<Job>& jobs, int num_threads) {
  if (num_threads <= 1 || jobs.size() <= 1) {
    for (const auto& j : jobs) resize_one(j);
    return;
  }
  std::atomic<size_t> next{0};
  auto worker = [&]() {
    for (;;) {
      size_t i = next.fetch_add(1);
      if (i >= jobs.size()) break;
      resize_one(jobs[i]);
    }
  };
  std::vector<std::thread> threads;
  int n = std::min<int>(num_threads, static_cast<int>(jobs.size()));
  threads.reserve(n);
  for (int t = 0; t < n; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// Batched crop+resize: for sample i, crop (cx,cy,cw,ch) from srcs[i]
// (sh[i] x sw[i] x 3 uint8) and bilinear-resize into dst[i] (oh x ow x 3),
// dst being one contiguous NHWC buffer.
void batch_crop_resize_u8(const uint8_t** srcs, const int* sh, const int* sw,
                          const int* cx, const int* cy, const int* cw,
                          const int* ch, uint8_t* dst, int n, int oh, int ow,
                          int num_threads) {
  std::vector<Job> jobs(n);
  for (int i = 0; i < n; ++i) {
    jobs[i] = Job{srcs[i], sh[i], sw[i], cx[i], cy[i], cw[i], ch[i],
                  dst + static_cast<size_t>(i) * oh * ow * 3, oh, ow};
  }
  run_parallel(jobs, num_threads);
}

// Parallel collation: copy n HWC uint8 images (equal size) into one NHWC
// buffer (fast_collate analog, loader.py:19-51).
void batch_collate_u8(const uint8_t** srcs, uint8_t* dst, int n,
                      long long bytes_per_image, int num_threads) {
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      std::memcpy(dst + static_cast<size_t>(i) * bytes_per_image, srcs[i],
                  bytes_per_image);
    }
  };
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Horizontal flip in place (uint8 HWC).
void hflip_u8(uint8_t* img, int h, int w) {
  for (int y = 0; y < h; ++y) {
    uint8_t* row = img + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w / 2; ++x) {
      for (int c = 0; c < 3; ++c) {
        std::swap(row[x * 3 + c], row[(w - 1 - x) * 3 + c]);
      }
    }
  }
}

}  // extern "C"
