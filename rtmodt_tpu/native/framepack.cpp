// Native frame packer: BGR chunk -> letterbox-resized planar I420.
//
// The ingest stage of the streaming pipeline (the C++ data-loader analog of
// the reference's OpenCV/FFmpeg decode path, SURVEY.md N5): bilinear resize
// of each BGR frame to the model content size and BT.601 conversion to
// planar Y/U/V, for a whole chunk of frames in ONE call - multithreaded in
// C++, so Python's GIL is released for the entire chunk instead of
// per-OpenCV-call.
//
// Color constants are the exact inverse of the device decode in
// rtmodt_tpu/ops/yuv.py (R = Y + 1.403 Vc etc.), so pack -> unpack is
// numerically closed.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

// Bilinear sample of one BGR pixel row-major (h, w, 3).
inline void sample_bilinear(const uint8_t* img, int h, int w, float fy, float fx,
                            float* bgr) {
  const int x0 = std::max(0, std::min(w - 1, static_cast<int>(fx)));
  const int y0 = std::max(0, std::min(h - 1, static_cast<int>(fy)));
  const int x1 = std::min(w - 1, x0 + 1);
  const int y1 = std::min(h - 1, y0 + 1);
  const float ax = fx - x0;
  const float ay = fy - y0;
  const float w00 = (1 - ax) * (1 - ay), w01 = ax * (1 - ay);
  const float w10 = (1 - ax) * ay, w11 = ax * ay;
  const uint8_t* p00 = img + (static_cast<size_t>(y0) * w + x0) * 3;
  const uint8_t* p01 = img + (static_cast<size_t>(y0) * w + x1) * 3;
  const uint8_t* p10 = img + (static_cast<size_t>(y1) * w + x0) * 3;
  const uint8_t* p11 = img + (static_cast<size_t>(y1) * w + x1) * 3;
  for (int c = 0; c < 3; ++c) {
    bgr[c] = w00 * p00[c] + w01 * p01[c] + w10 * p10[c] + w11 * p11[c];
  }
}

inline uint8_t clamp_u8(float v) {
  return static_cast<uint8_t>(std::max(0.f, std::min(255.f, v + 0.5f)));
}

void pack_one(const uint8_t* frame, int src_h, int src_w, int ch, int cw,
              uint8_t* y_out, uint8_t* u_out, uint8_t* v_out) {
  const float sy = static_cast<float>(src_h) / ch;
  const float sx = static_cast<float>(src_w) / cw;
  std::vector<float> rrow(cw), grow(cw), brow(cw);
  std::vector<float> r_even;  // cached even row for chroma averaging
  r_even.resize(0);
  std::vector<float> re(cw), ge(cw), be(cw);

  for (int yy = 0; yy < ch; ++yy) {
    const float fy = (yy + 0.5f) * sy - 0.5f;
    for (int xx = 0; xx < cw; ++xx) {
      const float fx = (xx + 0.5f) * sx - 0.5f;
      float bgr[3];
      sample_bilinear(frame, src_h, src_w, std::max(0.f, fy), std::max(0.f, fx), bgr);
      brow[xx] = bgr[0];
      grow[xx] = bgr[1];
      rrow[xx] = bgr[2];
      const float lum = 0.299f * bgr[2] + 0.587f * bgr[1] + 0.114f * bgr[0];
      y_out[static_cast<size_t>(yy) * cw + xx] = clamp_u8(lum);
    }
    if ((yy & 1) == 0) {
      re = rrow; ge = grow; be = brow;
    } else {
      // chroma from the 2x2 average (standard 4:2:0 siting)
      uint8_t* urow = u_out + static_cast<size_t>(yy / 2) * (cw / 2);
      uint8_t* vrow = v_out + static_cast<size_t>(yy / 2) * (cw / 2);
      for (int xx = 0; xx < cw; xx += 2) {
        const float r4 = 0.25f * (re[xx] + re[xx + 1] + rrow[xx] + rrow[xx + 1]);
        const float g4 = 0.25f * (ge[xx] + ge[xx + 1] + grow[xx] + grow[xx + 1]);
        const float b4 = 0.25f * (be[xx] + be[xx + 1] + brow[xx] + brow[xx + 1]);
        const float lum4 = 0.299f * r4 + 0.587f * g4 + 0.114f * b4;
        urow[xx / 2] = clamp_u8((b4 - lum4) / 1.773f + 128.f);
        vrow[xx / 2] = clamp_u8((r4 - lum4) / 1.403f + 128.f);
      }
    }
  }
}

}  // namespace

extern "C" {

// frames: (n, src_h, src_w, 3) BGR uint8 contiguous.
// y: (n, ch, cw); u, v: (n, ch/2, cw/2) preallocated outputs.
void pack_i420_chunk(const uint8_t* frames, int n, int src_h, int src_w,
                     int ch, int cw, uint8_t* y, uint8_t* u, uint8_t* v,
                     int num_threads) {
  const size_t fstride = static_cast<size_t>(src_h) * src_w * 3;
  const size_t ystride = static_cast<size_t>(ch) * cw;
  const size_t cstride = ystride / 4;
  const int workers = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([=]() {
      for (int i = t; i < n; i += workers) {
        pack_one(frames + i * fstride, src_h, src_w, ch, cw,
                 y + i * ystride, u + i * cstride, v + i * cstride);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
