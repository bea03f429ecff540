// sleepgen native data-loader core.
//
// The reference feeds its trainers through torch DataLoader with 25 worker
// processes (config/config_aekl_eeg.yaml:6) — the "native" part of its
// input pipeline is torch's C++ loader. sleepgen's equivalent: the window
// assembly hot path (per-recording normalize once, then per-epoch random
// crop + border-pad gather into a dense batch buffer) implemented in C++
// with a thread pool, exposed over a C ABI for ctypes.
//
// Functions:
//   sg_normalize_recording: x*(1+factor) then min-max to [0,1]
//     (MONAI ScaleIntensity chain, src/dataset/dataset.py:14-15)
//   sg_gather_windows: out[i] = pad_36(rec_i[start_i : start_i+window])
//     (RandSpatialCropD + BorderPadD, dataset.py:16-18)
#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

template <typename Fn>
void parallel_for(int64_t n, Fn&& fn) {
  int n_threads = std::min<int64_t>(hardware_threads(), n);
  if (n_threads <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&] {
      for (int64_t i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// raw (float64, len n) -> out (float32, len n), x*(1+factor) then minmax.
void sg_normalize_recording(const double* raw, int64_t n, double factor,
                            float* out) {
  double lo = raw[0], hi = raw[0];
  for (int64_t i = 1; i < n; ++i) {
    lo = std::min(lo, raw[i]);
    hi = std::max(hi, raw[i]);
  }
  // the (1+factor) scale cancels in min-max; kept for semantic parity
  const double scale = 1.0 + factor;
  lo *= scale;
  hi *= scale;
  const double denom = hi - lo;
  if (denom == 0.0) {
    std::memset(out, 0, sizeof(float) * n);
    return;
  }
  const double inv = 1.0 / denom;
  for (int64_t i = 0; i < n; ++i) {
    out[i] = static_cast<float>((raw[i] * scale - lo) * inv);
  }
}

// Gather one padded window per recording into a dense (n_rec, window+2*pad)
// float32 buffer. recordings: array of n_rec pointers to float32 data.
void sg_gather_windows(const float* const* recordings, const int64_t* starts,
                       int64_t n_rec, int64_t window, int64_t pad,
                       float* out) {
  const int64_t out_len = window + 2 * pad;
  parallel_for(n_rec, [&](int64_t i) {
    float* dst = out + i * out_len;
    std::memset(dst, 0, sizeof(float) * pad);
    std::memcpy(dst + pad, recordings[i] + starts[i], sizeof(float) * window);
    std::memset(dst + pad + window, 0, sizeof(float) * pad);
  });
}

// Batched gather of many windows from one long recording (SHHS-scale
// epoching): out[k] = rec[starts[k] : starts[k]+window], no padding.
void sg_gather_epochs(const float* rec, const int64_t* starts, int64_t n_win,
                      int64_t window, float* out) {
  parallel_for(n_win, [&](int64_t k) {
    std::memcpy(out + k * window, rec + starts[k], sizeof(float) * window);
  });
}

}  // extern "C"
