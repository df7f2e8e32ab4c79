// Native data-loader core for protoasnet_tpu.
//
// The reference's data path is pure-Python (scipy/skimage per __getitem__,
// as_dataloader.py:184-231). Here the two host-side hot loops run in C++:
//
//   * resize_area_u8 — per-frame spatial resize used when packing the
//     CineStore (area average for downscale with exact fractional edge
//     weights, bilinear half-pixel for upscale), multithreaded over frames.
//   * gather_windows — batched padded window extraction from the packed
//     uint8 store (pure memcpy), the per-step host work.
//
// Built as a shared library (make -C native) and bound via ctypes
// (protoasnet_tpu/data/native.py); NumPy fallbacks keep the framework
// functional without a compiler.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Area-average resize of one (h, w) uint8 frame to (out_h, out_w).
static void resize_area_frame(const uint8_t* src, int h, int w, uint8_t* dst,
                              int out_h, int out_w) {
  const double sy = static_cast<double>(h) / out_h;
  const double sx = static_cast<double>(w) / out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    const double y0 = oy * sy, y1 = (oy + 1) * sy;
    const int iy0 = static_cast<int>(y0);
    const int iy1 = std::min(static_cast<int>(std::ceil(y1)), h);
    for (int ox = 0; ox < out_w; ++ox) {
      const double x0 = ox * sx, x1 = (ox + 1) * sx;
      const int ix0 = static_cast<int>(x0);
      const int ix1 = std::min(static_cast<int>(std::ceil(x1)), w);
      double acc = 0.0, area = 0.0;
      for (int iy = iy0; iy < iy1; ++iy) {
        const double wy =
            std::min<double>(iy + 1, y1) - std::max<double>(iy, y0);
        const uint8_t* row = src + static_cast<int64_t>(iy) * w;
        for (int ix = ix0; ix < ix1; ++ix) {
          const double wx =
              std::min<double>(ix + 1, x1) - std::max<double>(ix, x0);
          acc += wy * wx * row[ix];
          area += wy * wx;
        }
      }
      dst[static_cast<int64_t>(oy) * out_w + ox] =
          static_cast<uint8_t>(acc / area + 0.5);
    }
  }
}

// Bilinear (half-pixel centers) resize of one frame, for upscaling.
static void resize_bilinear_frame(const uint8_t* src, int h, int w,
                                  uint8_t* dst, int out_h, int out_w) {
  const double sy = static_cast<double>(h) / out_h;
  const double sx = static_cast<double>(w) / out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    double fy = (oy + 0.5) * sy - 0.5;
    fy = std::max(0.0, std::min(fy, h - 1.0));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, h - 1);
    const double dy = fy - y0;
    for (int ox = 0; ox < out_w; ++ox) {
      double fx = (ox + 0.5) * sx - 0.5;
      fx = std::max(0.0, std::min(fx, w - 1.0));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, w - 1);
      const double dx = fx - x0;
      const double v =
          (1 - dy) * ((1 - dx) * src[(int64_t)y0 * w + x0] +
                      dx * src[(int64_t)y0 * w + x1]) +
          dy * ((1 - dx) * src[(int64_t)y1 * w + x0] +
                dx * src[(int64_t)y1 * w + x1]);
      dst[static_cast<int64_t>(oy) * out_w + ox] =
          static_cast<uint8_t>(v + 0.5);
    }
  }
}

// Resize a (t, h, w) uint8 video to (t, out, out), threaded over frames.
void resize_video_u8(const uint8_t* src, int t, int h, int w, uint8_t* dst,
                     int out, int num_threads) {
  const bool down = h > out || w > out;
  auto worker = [&](int lo, int hi) {
    for (int i = lo; i < hi; ++i) {
      const uint8_t* s = src + static_cast<int64_t>(i) * h * w;
      uint8_t* d = dst + static_cast<int64_t>(i) * out * out;
      if (down)
        resize_area_frame(s, h, w, d, out, out);
      else
        resize_bilinear_frame(s, h, w, d, out, out);
    }
  };
  num_threads = std::max(1, num_threads);
  if (num_threads == 1 || t < 2 * num_threads) {
    worker(0, t);
    return;
  }
  std::vector<std::thread> threads;
  const int per = (t + num_threads - 1) / num_threads;
  for (int k = 0; k < num_threads; ++k) {
    const int lo = k * per, hi = std::min(t, lo + per);
    if (lo < hi) threads.emplace_back(worker, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// Gather padded uint8 windows from the packed store.
//   store:      (total_frames, frame_px) flattened
//   offsets:    (num_videos,) first-frame index per video
//   video_idx / starts / ends: (batch,) window specs
//   out:        (batch, t_max, frame_px), zero-padded beyond the window
void gather_windows(const uint8_t* store, const int64_t* offsets,
                    const int32_t* video_idx, const int32_t* starts,
                    const int32_t* ends, int batch, int t_max,
                    int64_t frame_px, uint8_t* out) {
  for (int b = 0; b < batch; ++b) {
    const int64_t base = offsets[video_idx[b]];
    const int n = ends[b] - starts[b];
    uint8_t* dst = out + static_cast<int64_t>(b) * t_max * frame_px;
    std::memcpy(dst, store + (base + starts[b]) * frame_px,
                static_cast<size_t>(n) * frame_px);
    std::memset(dst + static_cast<int64_t>(n) * frame_px, 0,
                static_cast<size_t>(t_max - n) * frame_px);
  }
}

}  // extern "C"
