// m3f native data loader: threaded JPEG decode + resize + prefetch.
//
// Capability parity: the reference's input pipeline is torch
// DataLoader(num_workers=N) — fork-isolated Python workers whose actual
// decode work happens in C++ (libjpeg via PIL/cv2) (SURVEY.md §1 L2, §3.2
// "DataLoader workers ... JPEG decode+mel slice = host hot loop").
// TPU-native replacement: one in-process C++ thread pool that decodes a
// whole window-sequence batch per call (GIL released for the entire call),
// plus a ring-buffer prefetcher so host decode overlaps device compute
// (SURVEY §7 step 6: "preprocessing never bottlenecks the model").
//
// C ABI (ctypes-friendly), no C++ types across the boundary:
//   m3f_decode_jpeg_batch(paths, n, out, H, W, n_threads) -> n_failed
//     paths: array of n NUL-terminated file paths
//     out:   caller-allocated uint8 buffer [n, H, W, 3] (RGB)
//     a failed/missing file leaves its slot zeroed and counts in the return
//   m3f_loader_self_test() -> 42
//
// Build: make -C native/loader  (g++ -O3 -shared -fPIC -pthread -ljpeg)

#include <atomic>
#include <condition_variable>
#include <functional>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG file to RGB.  If the image is exactly out_w×out_h it is
// decoded STRAIGHT into `direct` (no scratch, no copy — the common case for
// pre-cropped 112×112 faces); otherwise it lands in `pixels` for resizing.
// Returns false on failure; *w/*h get the source dimensions.
bool decode_jpeg_file(const char* path, std::vector<uint8_t>& pixels,
                      uint8_t* direct, int out_w, int out_h, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *w = cinfo.output_width;
  *h = cinfo.output_height;
  const int stride = *w * 3;
  uint8_t* dst;
  if (direct && *w == out_w && *h == out_h) {
    dst = direct;
  } else {
    pixels.resize(static_cast<size_t>(stride) * *h);
    dst = pixels.data();
  }
  // read in max-sized batches — libjpeg-turbo SIMD paths like large requests
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rows[64];
    const unsigned remaining = cinfo.output_height - cinfo.output_scanline;
    const unsigned batch = remaining < 64 ? remaining : 64;
    for (unsigned i = 0; i < batch; ++i)
      rows[i] = dst + static_cast<size_t>(cinfo.output_scanline + i) * stride;
    jpeg_read_scanlines(&cinfo, rows, batch);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize RGB uint8 (src WxH -> dst out_w x out_h), matching
// cv2.INTER_LINEAR's half-pixel-center sampling convention.
void resize_bilinear(const uint8_t* src, int sw, int sh, uint8_t* dst,
                     int dw, int dh) {
  if (sw == dw && sh == dh) {
    memcpy(dst, src, static_cast<size_t>(sw) * sh * 3);
    return;
  }
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > sh - 2) y0 = sh - 2;
    if (y0 < 0) y0 = 0;
    // clamp the weight to [0,1]: when fy falls past the last source row the
    // raw fy-y0 would extrapolate (>1) and the uint8 cast below would wrap
    float wy = fy - y0;
    if (wy > 1.0f) wy = 1.0f;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      if (x0 > sw - 2) x0 = sw - 2;
      if (x0 < 0) x0 = 0;
      float wx = fx - x0;
      if (wx > 1.0f) wx = 1.0f;
      // degenerate 1-px-wide/tall sources: neighbor indices clamp to the
      // same row/col instead of dereferencing past the buffer (ADVICE r1)
      const int y1 = (y0 + 1 < sh) ? y0 + 1 : y0;
      const int x1 = (x0 + 1 < sw) ? x0 + 1 : x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * sw + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * sw + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * sw + x1) * 3;
      uint8_t* o = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        const float v0 = p00[c] + (p01[c] - p00[c]) * wx;
        const float v1 = p10[c] + (p11[c] - p10[c]) * wx;
        float v = v0 + (v1 - v0) * wy + 0.5f;
        if (v < 0.0f) v = 0.0f;
        if (v > 255.0f) v = 255.0f;
        o[c] = static_cast<uint8_t>(v);
      }
    }
  }
}

// Simple work-stealing-free parallel for: items [0, n) over k threads.
void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  if (n_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next{0};
  auto worker = [&] {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      fn(i);
    }
  };
  std::vector<std::thread> threads;
  const int k = std::min(n_threads, n);
  threads.reserve(k - 1);
  for (int t = 1; t < k; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// Decode n JPEGs into out[n, H, W, 3] RGB.  ok_out[i] (may be null) gets
// 1 on success, 0 on a missing/undecodable file (slot is zeroed).
// Returns the number of failures.
int m3f_decode_jpeg_batch(const char** paths, int n, uint8_t* out, int out_h,
                          int out_w, int n_threads, uint8_t* ok_out) {
  std::atomic<int> failed{0};
  const size_t img_bytes = static_cast<size_t>(out_h) * out_w * 3;
  parallel_for(n, n_threads, [&](int i) {
    uint8_t* slot = out + i * img_bytes;
    bool ok = false;
    if (paths[i] && paths[i][0]) {  // empty path = intentionally missing
      thread_local std::vector<uint8_t> scratch;
      int w = 0, h = 0;
      if (decode_jpeg_file(paths[i], scratch, slot, out_w, out_h, &w, &h)) {
        if (w != out_w || h != out_h)
          resize_bilinear(scratch.data(), w, h, slot, out_w, out_h);
        ok = true;
      }
    }
    if (!ok) {
      memset(slot, 0, img_bytes);
      failed.fetch_add(1);
    }
    if (ok_out) ok_out[i] = ok ? 1 : 0;
  });
  return failed.load();
}

int m3f_loader_self_test() { return 42; }

}  // extern "C"
