// Native window-gather: the host-side hot loop of the data pipeline.
//
// The reference's equivalent is per-sample cv2.imread + python loops inside
// torch DataLoader workers (reference src/dataset.py:104-110, hot loop 1).
// Here per-shot frames are contiguous uint8 arrays (possibly memory-mapped);
// gathering a (B, L) window batch is pure memory movement, so it is done
// with multithreaded memcpy: each thread copies a contiguous span of
// windows, touching every frame exactly once and driving page-in of
// memmapped shots in parallel.
//
// Built as a plain shared library; bound from Python with ctypes
// (kstar_tpu/data/native.py). No Python.h dependency.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

extern "C" {

// frames      : (n_frames, frame_bytes) contiguous uint8
// indices     : (n_windows * win_len) flattened frame indices (row-major)
// out         : (n_windows, win_len, frame_bytes) contiguous uint8
void gather_windows_u8(const uint8_t* frames, int64_t n_frames,
                       int64_t frame_bytes, const int64_t* indices,
                       int64_t n_windows, int64_t win_len, uint8_t* out,
                       int32_t n_threads) {
  if (n_windows <= 0 || win_len <= 0) return;
  if (n_frames <= 0) {
    // nothing to gather from: zero-fill rather than clamping indices to
    // frame -1 (an out-of-bounds read before the buffer)
    std::memset(out, 0,
                static_cast<size_t>(n_windows * win_len * frame_bytes));
    return;
  }
  n_threads = std::max<int32_t>(1, n_threads);
  n_threads = static_cast<int32_t>(
      std::min<int64_t>(n_threads, n_windows));

  auto worker = [&](int64_t w0, int64_t w1) {
    for (int64_t w = w0; w < w1; ++w) {
      uint8_t* dst = out + w * win_len * frame_bytes;
      const int64_t* idx = indices + w * win_len;
      for (int64_t t = 0; t < win_len; ++t) {
        int64_t f = idx[t];
        if (f < 0) f = 0;
        if (f >= n_frames) f = n_frames - 1;
        std::memcpy(dst + t * frame_bytes, frames + f * frame_bytes,
                    static_cast<size_t>(frame_bytes));
      }
    }
  };

  if (n_threads == 1) {
    worker(0, n_windows);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  int64_t per = (n_windows + n_threads - 1) / n_threads;
  for (int32_t i = 0; i < n_threads; ++i) {
    int64_t w0 = i * per;
    int64_t w1 = std::min<int64_t>(w0 + per, n_windows);
    if (w0 >= w1) break;
    threads.emplace_back(worker, w0, w1);
  }
  for (auto& t : threads) t.join();
}

// Scaled float gather for 0D tables: out[w, t, :] = data[indices[w*L+t], :]
void gather_windows_f32(const float* data, int64_t n_rows, int64_t row_floats,
                        const int64_t* indices, int64_t n_windows,
                        int64_t win_len, float* out, int32_t n_threads) {
  gather_windows_u8(reinterpret_cast<const uint8_t*>(data), n_rows,
                    row_floats * static_cast<int64_t>(sizeof(float)), indices,
                    n_windows, win_len, reinterpret_cast<uint8_t*>(out),
                    n_threads);
}

}  // extern "C"
