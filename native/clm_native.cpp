// clm_native — native host-side data loader for clip_lora_match_tpu.
//
// The reference feeds its encoder through Python/PIL in DataLoader workers
// (ref:datasets/dataset.py:58-89). At TPU ingest rates (≥5k images/sec/chip,
// BASELINE.md) the Python image path becomes the bottleneck, so the decode →
// resize → center-crop → normalize pipeline is implemented here in C++:
//
//  - JPEG decode via libjpeg(-turbo);
//  - separable convolution resampling with the cubic kernel (a = -0.5) and
//    support scaling on downscale — the same resampling algorithm PIL uses
//    for Image.resize(..., BICUBIC), so outputs match the Python pipeline
//    to within fixed-point rounding;
//  - shortest-edge resize semantics + center crop (matching
//    clip_lora_match_tpu.preprocess.image);
//  - CLIP mean/std normalization to float32 NHWC;
//  - a std::thread pool over the batch.
//
// Exposed as a tiny C ABI for ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -fPIC -shared -o libclm_native.so \
//            clm_native.cpp -ljpeg -lpthread

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

// ---------------------------------------------------------------------------
// JPEG decoding
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to RGB8. Returns true on success.
//
// target_short > 0 enables DCT-domain scaling (libjpeg scale_num/scale_denom,
// N/8 steps): decode at the smallest scale whose SHORT side still covers
// target_short, then let the caller's cubic resample close the gap. For a
// 4000px photo headed to 224 this skips ~7/8 of the IDCT and feeds the
// resampler ~1/64 of the pixels — the decode is the measured bottleneck of
// the jpeg→embedding path on this host (BENCH r3: 425 img/s, TPU side ~11k).
bool decode_jpeg(const char* path, std::vector<uint8_t>& rgb, int& w, int& h,
                 int target_short = 0) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (target_short > 0) {
    // smallest N/8 in 1..8 whose scaled short side >= target_short (never
    // upscale in the DCT domain; scale 8/8 = full decode)
    for (int s = 1; s <= 8; ++s) {
      cinfo.scale_num = s;
      cinfo.scale_denom = 8;
      jpeg_calc_output_dimensions(&cinfo);
      if (static_cast<int>(
              cinfo.output_width < cinfo.output_height ? cinfo.output_width
                                                       : cinfo.output_height) >=
          target_short)
        break;
    }
  }
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// ---------------------------------------------------------------------------
// PIL-algorithm separable resampling, cubic kernel a = -0.5
// ---------------------------------------------------------------------------

inline double cubic_filter(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}
constexpr double kCubicSupport = 2.0;

struct ResampleCoeffs {
  std::vector<int> bounds_min;   // first input pixel per output pixel
  std::vector<int> bounds_size;  // number of taps
  std::vector<double> weights;   // ksize taps per output pixel
  int ksize = 0;
};

// Mirror of PIL's precompute_coeffs: center/support/window math, normalized
// weights, clamped windows.
ResampleCoeffs precompute_coeffs(int in_size, int out_size) {
  ResampleCoeffs rc;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = kCubicSupport * filterscale;
  rc.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  rc.bounds_min.resize(out_size);
  rc.bounds_size.resize(out_size);
  rc.weights.assign(static_cast<size_t>(out_size) * rc.ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* w = &rc.weights[static_cast<size_t>(xx) * rc.ksize];
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      double weight = cubic_filter((x + xmin - center + 0.5) / filterscale);
      w[x] = weight;
      ww += weight;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax; ++x) w[x] /= ww;
    rc.bounds_min[xx] = xmin;
    rc.bounds_size[xx] = xmax;
  }
  return rc;
}

inline uint8_t clip8(double v) {
  if (v < 0.0) return 0;
  if (v > 255.0) return 255;
  return static_cast<uint8_t>(v + 0.5);
}

// Horizontal then vertical pass, RGB8 in/out.
void resample(const std::vector<uint8_t>& in, int in_w, int in_h,
              std::vector<uint8_t>& out, int out_w, int out_h) {
  ResampleCoeffs rx = precompute_coeffs(in_w, out_w);
  std::vector<uint8_t> tmp(static_cast<size_t>(out_w) * in_h * 3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = in.data() + static_cast<size_t>(y) * in_w * 3;
    uint8_t* orow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      const double* w = &rx.weights[static_cast<size_t>(xx) * rx.ksize];
      int xmin = rx.bounds_min[xx], n = rx.bounds_size[xx];
      double acc[3] = {0, 0, 0};
      for (int x = 0; x < n; ++x) {
        const uint8_t* px = row + static_cast<size_t>(xmin + x) * 3;
        acc[0] += px[0] * w[x];
        acc[1] += px[1] * w[x];
        acc[2] += px[2] * w[x];
      }
      orow[xx * 3 + 0] = clip8(acc[0]);
      orow[xx * 3 + 1] = clip8(acc[1]);
      orow[xx * 3 + 2] = clip8(acc[2]);
    }
  }
  ResampleCoeffs ry = precompute_coeffs(in_h, out_h);
  out.resize(static_cast<size_t>(out_w) * out_h * 3);
  for (int yy = 0; yy < out_h; ++yy) {
    const double* w = &ry.weights[static_cast<size_t>(yy) * ry.ksize];
    int ymin = ry.bounds_min[yy], n = ry.bounds_size[yy];
    uint8_t* orow = out.data() + static_cast<size_t>(yy) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      double acc[3] = {0, 0, 0};
      for (int y = 0; y < n; ++y) {
        const uint8_t* px =
            tmp.data() + (static_cast<size_t>(ymin + y) * out_w + xx) * 3;
        acc[0] += px[0] * w[y];
        acc[1] += px[1] * w[y];
        acc[2] += px[2] * w[y];
      }
      orow[xx * 3 + 0] = clip8(acc[0]);
      orow[xx * 3 + 1] = clip8(acc[1]);
      orow[xx * 3 + 2] = clip8(acc[2]);
    }
  }
}

// Full pipeline for one image → float32 (size, size, 3) normalized.
bool preprocess_one(const char* path, int size, const float* mean,
                    const float* stddev, float* out, int dct_scale) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(path, rgb, w, h, dct_scale ? size : 0)) return false;
  // shortest-edge resize (truncating long edge like the Python pipeline)
  int nw, nh;
  if (w <= h) {
    nw = size;
    nh = std::max(size, static_cast<int>(static_cast<int64_t>(h) * size / w));
  } else {
    nh = size;
    nw = std::max(size, static_cast<int>(static_cast<int64_t>(w) * size / h));
  }
  std::vector<uint8_t> resized;
  if (nw == w && nh == h) {
    resized = std::move(rgb);
  } else {
    resample(rgb, w, h, resized, nw, nh);
  }
  // center crop
  int left = (nw - size) / 2;
  int top = (nh - size) / 2;
  for (int y = 0; y < size; ++y) {
    const uint8_t* row =
        resized.data() + (static_cast<size_t>(top + y) * nw + left) * 3;
    float* orow = out + static_cast<size_t>(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      for (int c = 0; c < 3; ++c) {
        float v = row[x * 3 + c] / 255.0f;
        orow[x * 3 + c] = (v - mean[c]) / stddev[c];
      }
    }
  }
  return true;
}

// Decode → resize → center-crop only, uint8 RGB out (normalization happens
// on-device: feeding uint8 is 4x less host→device traffic than fp32, which
// dominates end-to-end throughput through the TPU relay).
bool preprocess_one_u8(const char* path, int size, uint8_t* out,
                       int dct_scale) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(path, rgb, w, h, dct_scale ? size : 0)) return false;
  int nw, nh;
  if (w <= h) {
    nw = size;
    nh = std::max(size, static_cast<int>(static_cast<int64_t>(h) * size / w));
  } else {
    nh = size;
    nw = std::max(size, static_cast<int>(static_cast<int64_t>(w) * size / h));
  }
  std::vector<uint8_t> resized;
  if (nw == w && nh == h) {
    resized = std::move(rgb);
  } else {
    resample(rgb, w, h, resized, nw, nh);
  }
  int left = (nw - size) / 2;
  int top = (nh - size) / 2;
  for (int y = 0; y < size; ++y) {
    const uint8_t* row =
        resized.data() + (static_cast<size_t>(top + y) * nw + left) * 3;
    std::memcpy(out + static_cast<size_t>(y) * size * 3, row,
                static_cast<size_t>(size) * 3);
  }
  return true;
}

}  // namespace

extern "C" {

// uint8 variant of clm_preprocess_batch: out is (n, size, size, 3) uint8 RGB
// resized+cropped but NOT normalized.
int clm_preprocess_batch_u8(const char** paths, int n, int size,
                            unsigned char* out, int num_threads,
                            unsigned char* ok, int dct_scale) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0), good(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* dst = out + static_cast<size_t>(i) * size * size * 3;
      bool success = preprocess_one_u8(paths[i], size, dst, dct_scale);
      ok[i] = success ? 1 : 0;
      if (success) good.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = std::min(num_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return good.load();
}

// Preprocess a batch of JPEG files into out (n, size, size, 3) float32 NHWC.
// ok[i] = 1 on success, 0 on failure (caller falls back to PIL for that row).
// Returns the number of successfully processed images.
int clm_preprocess_batch(const char** paths, int n, int size,
                         const float* mean, const float* stddev, float* out,
                         int num_threads, unsigned char* ok, int dct_scale) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0), good(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* dst = out + static_cast<size_t>(i) * size * size * 3;
      bool success = preprocess_one(paths[i], size, mean, stddev, dst,
                                    dct_scale);
      ok[i] = success ? 1 : 0;
      if (success) good.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  int nt = std::min(num_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return good.load();
}

// Version probe for the ctypes wrapper.
int clm_native_version() { return 3; }

}  // extern "C"
