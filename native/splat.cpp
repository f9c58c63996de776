// Native label-regeneration kernel: multithreaded z-buffer point splatting.
//
// The host-side hot loop of the data pipeline (pose_estimation_tpu/data/
// synthetic.py:render_frame) regenerates per-pixel labels (depth, object-
// frame coordinate map, camera-frame normals, region ids) by splatting the
// object's dense surface points under the ground-truth pose. The numpy
// implementation sorts 20k points per frame per sample; this C++ version
// does the projection + z-test in parallel chunks with atomic depth
// compare-exchange, then resolves labels in a second pass.
//
// Replaces (architecturally) the reference's reliance on precomputed
// offline label pickles (dataset/linemod/batchdataset.py:200-210) and its
// external native preprocessing (OpenCV warpAffine) with an in-repo native
// runtime component. Exposed via a C ABI for ctypes (no pybind11 in the
// image).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC -pthread).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct Frame {
  const float* points;    // [m, 3] object-frame surface points
  const float* normals;   // [m, 3]
  const int32_t* regions; // [m] nearest-FPS-center id per point (1-based)
  int m;
  const float* r;         // [9] row-major rotation
  const float* t;         // [3]
  const float* k;         // [9] row-major intrinsics
  int h, w;
  // outputs
  float* depth;           // [h*w]
  float* coord;           // [h*w*3]
  float* normal;          // [h*w*3]
  int32_t* region;        // [h*w]
  uint8_t* mask;          // [h*w]
};

// Pack depth (float, positive) and point index into one 64-bit word so a
// single atomic min resolves both the z-test and the winner id. Positive
// IEEE floats compare like their bit patterns, so (depth_bits << 32 | idx)
// ordered ascending gives nearest-point-wins.
inline uint64_t pack(float depth, uint32_t idx) {
  uint32_t bits;
  std::memcpy(&bits, &depth, 4);
  return (static_cast<uint64_t>(bits) << 32) | idx;
}

void splat_chunk(const Frame& f, std::atomic<uint64_t>* zbuf, int begin,
                 int end) {
  const float fx = f.k[0], cx = f.k[2], fy = f.k[4], cy = f.k[5];
  for (int i = begin; i < end; ++i) {
    const float* p = f.points + 3 * i;
    const float x = f.r[0] * p[0] + f.r[1] * p[1] + f.r[2] * p[2] + f.t[0];
    const float y = f.r[3] * p[0] + f.r[4] * p[1] + f.r[5] * p[2] + f.t[1];
    const float z = f.r[6] * p[0] + f.r[7] * p[1] + f.r[8] * p[2] + f.t[2];
    if (z <= 1e-6f) continue;
    const int u = static_cast<int>(std::lround(x / z * fx + cx));
    const int v = static_cast<int>(std::lround(y / z * fy + cy));
    if (u < 0 || u >= f.w || v < 0 || v >= f.h) continue;
    const int pix = v * f.w + u;
    const uint64_t cand = pack(z, static_cast<uint32_t>(i));
    uint64_t cur = zbuf[pix].load(std::memory_order_relaxed);
    while (cand < cur &&
           !zbuf[pix].compare_exchange_weak(cur, cand,
                                            std::memory_order_relaxed)) {
    }
  }
}

void resolve_chunk(const Frame& f, const std::atomic<uint64_t>* zbuf,
                   int begin, int end) {
  for (int pix = begin; pix < end; ++pix) {
    const uint64_t word = zbuf[pix].load(std::memory_order_relaxed);
    if (word == UINT64_MAX) {
      f.depth[pix] = 0.f;
      f.mask[pix] = 0;
      f.region[pix] = 0;
      std::memset(f.coord + 3 * pix, 0, 12);
      std::memset(f.normal + 3 * pix, 0, 12);
      continue;
    }
    const uint32_t bits = static_cast<uint32_t>(word >> 32);
    float depth;
    std::memcpy(&depth, &bits, 4);
    const uint32_t i = static_cast<uint32_t>(word & 0xffffffffu);
    f.depth[pix] = depth;
    f.mask[pix] = 1;
    f.region[pix] = f.regions[i];
    std::memcpy(f.coord + 3 * pix, f.points + 3 * i, 12);
    const float* n = f.normals + 3 * i;
    float* out_n = f.normal + 3 * pix;
    out_n[0] = f.r[0] * n[0] + f.r[1] * n[1] + f.r[2] * n[2];
    out_n[1] = f.r[3] * n[0] + f.r[4] * n[1] + f.r[5] * n[2];
    out_n[2] = f.r[6] * n[0] + f.r[7] * n[1] + f.r[8] * n[2];
  }
}

void run_parallel(int total, int num_threads,
                  const std::function<void(int, int)>& fn) {
  if (num_threads <= 1) {
    fn(0, total);
    return;
  }
  std::vector<std::thread> ts;
  const int chunk = (total + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    const int b = t * chunk;
    const int e = std::min(total, b + chunk);
    if (b >= e) break;
    ts.emplace_back(fn, b, e);
  }
  for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// Splat one frame. All pointers are caller-allocated contiguous float32 /
// int32 / uint8 numpy buffers. Returns number of visible pixels.
int splat_frame(const float* points, const float* normals,
                const int32_t* regions, int m, const float* r,
                const float* t, const float* k, int h, int w,
                float* out_depth, float* out_coord, float* out_normal,
                int32_t* out_region, uint8_t* out_mask, int num_threads) {
  Frame f{points, normals, regions, m, r, t, k, h, w,
          out_depth, out_coord, out_normal, out_region, out_mask};
  std::vector<std::atomic<uint64_t>> zbuf(static_cast<size_t>(h) * w);
  for (auto& z : zbuf) z.store(UINT64_MAX, std::memory_order_relaxed);

  run_parallel(m, num_threads,
               [&](int b, int e) { splat_chunk(f, zbuf.data(), b, e); });
  std::atomic<int> visible{0};
  run_parallel(h * w, num_threads, [&](int b, int e) {
    resolve_chunk(f, zbuf.data(), b, e);
    int count = 0;
    for (int i = b; i < e; ++i) count += f.mask[i];
    visible.fetch_add(count, std::memory_order_relaxed);
  });
  return visible.load();
}

// Batched variant: splat `n` frames (shared object geometry, per-frame
// poses), parallelized across frames — the data-loader inner loop.
void splat_batch(const float* points, const float* normals,
                 const int32_t* regions, int m, const float* rs,
                 const float* ts, const float* k, int h, int w, int n,
                 float* out_depth, float* out_coord, float* out_normal,
                 int32_t* out_region, uint8_t* out_mask, int num_threads) {
  run_parallel(n, num_threads, [&](int b, int e) {
    for (int i = b; i < e; ++i) {
      const size_t px = static_cast<size_t>(h) * w;
      splat_frame(points, normals, regions, m, rs + 9 * i, ts + 3 * i, k,
                  h, w, out_depth + px * i, out_coord + 3 * px * i,
                  out_normal + 3 * px * i, out_region + px * i,
                  out_mask + px * i, /*num_threads=*/1);
    }
  });
}

}  // extern "C"
