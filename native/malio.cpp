// malio: native IO runtime for mal_tpu.
//
// The reference feeds its trainers through torch DataLoader worker processes
// (PIL decode + ANTIALIAS resize, `manydepth/datasets/mono_dataset.py`) and a
// numpy velodyne->depth projector (`manydepth/kitti_utils.py:50-102`). This
// library provides the same capabilities as a self-contained C++ runtime:
//
//   - JPEG/PNG decode (libjpeg / libpng)
//   - PIL-compatible Lanczos-3 ("ANTIALIAS") separable resize
//   - a pthread worker pool for batched decode+resize straight into one
//     contiguous float32 NHWC buffer (zero Python-side image work)
//   - velodyne point projection with nearest-depth dedupe
//
// Exposed through a small C ABI consumed via ctypes (mal_tpu/data/native.py).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, 8-bit
};

// ---------------------------------------------------------------- decode
bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->c = 3;
  out->data.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  if (fread(magic, 1, 8, f) != 8) {
    fclose(f);
    return false;
  }
  rewind(f);
  bool ok;
  if (magic[0] == 0x89 && magic[1] == 'P')
    ok = decode_png(f, out);
  else
    ok = decode_jpeg(f, out);
  fclose(f);
  return ok;
}

// ------------------------------------------------ PIL-compatible Lanczos
// Matches PIL's Image.resize(..., LANCZOS): per-output-pixel windowed sinc
// with support 3*scale (downscale) and normalized weights.
double lanczos3(double x) {
  if (x <= -3.0 || x >= 3.0) return 0.0;
  if (x == 0.0) return 1.0;
  double px = M_PI * x;
  return 3.0 * std::sin(px) * std::sin(px / 3.0) / (px * px);
}

struct FilterTable {
  int ksize;                 // max taps per output pixel
  std::vector<int> bounds;   // (xmin, xcount) per output pixel
  std::vector<double> coef;  // ksize coefficients per output pixel
};

FilterTable build_filter(int in_size, int out_size) {
  FilterTable t;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 3.0 * filterscale;
  t.ksize = int(std::ceil(support)) * 2 + 1;
  t.bounds.resize(out_size * 2);
  t.coef.resize(size_t(out_size) * t.ksize, 0.0);
  for (int i = 0; i < out_size; ++i) {
    double center = (i + 0.5) * scale;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5));
    double ww = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double w = lanczos3((x - center + 0.5) / filterscale);
      t.coef[size_t(i) * t.ksize + (x - xmin)] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax - xmin; ++x)
        t.coef[size_t(i) * t.ksize + x] /= ww;
    t.bounds[i * 2] = xmin;
    t.bounds[i * 2 + 1] = xmax - xmin;
  }
  return t;
}

// PIL runs 8-bit images through fixed-point coefficients (PRECISION_BITS)
// with a uint8 intermediate between the horizontal and vertical passes —
// replicate that exactly for bit-identical output (Pillow Resample.c).
constexpr int kPrecisionBits = 32 - 8 - 2;

std::vector<int32_t> quantize(const FilterTable& t, int out_size) {
  std::vector<int32_t> q(size_t(out_size) * t.ksize);
  for (size_t i = 0; i < q.size(); ++i) {
    double v = t.coef[i];
    q[i] = int32_t(v < 0 ? v * (1 << kPrecisionBits) - 0.5
                         : v * (1 << kPrecisionBits) + 0.5);
  }
  return q;
}

inline uint8_t clip8(int64_t v) {
  v >>= kPrecisionBits;
  return uint8_t(std::min<int64_t>(255, std::max<int64_t>(0, v)));
}

// resize HWC u8 -> HWC float32 in [0,1], bit-identical to PIL LANCZOS
void resize_lanczos(const Image& img, int out_w, int out_h, float* out) {
  FilterTable fx = build_filter(img.w, out_w);
  FilterTable fy = build_filter(img.h, out_h);
  std::vector<int32_t> cfx = quantize(fx, out_w);
  std::vector<int32_t> cfy = quantize(fy, out_h);

  // horizontal pass -> uint8 intermediate (h, out_w, 3)
  std::vector<uint8_t> tmp(size_t(img.h) * out_w * 3);
  const int64_t half = int64_t(1) << (kPrecisionBits - 1);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* row = img.data.data() + size_t(y) * img.w * 3;
    for (int ox = 0; ox < out_w; ++ox) {
      int xmin = fx.bounds[ox * 2], cnt = fx.bounds[ox * 2 + 1];
      const int32_t* cf = cfx.data() + size_t(ox) * fx.ksize;
      int64_t acc[3] = {half, half, half};
      for (int k = 0; k < cnt; ++k) {
        const uint8_t* px = row + size_t(xmin + k) * 3;
        acc[0] += int64_t(cf[k]) * px[0];
        acc[1] += int64_t(cf[k]) * px[1];
        acc[2] += int64_t(cf[k]) * px[2];
      }
      uint8_t* o = tmp.data() + (size_t(y) * out_w + ox) * 3;
      o[0] = clip8(acc[0]);
      o[1] = clip8(acc[1]);
      o[2] = clip8(acc[2]);
    }
  }
  // vertical pass -> uint8 then [0,1] float
  for (int oy = 0; oy < out_h; ++oy) {
    int ymin = fy.bounds[oy * 2], cnt = fy.bounds[oy * 2 + 1];
    const int32_t* cf = cfy.data() + size_t(oy) * fy.ksize;
    for (int ox = 0; ox < out_w; ++ox) {
      int64_t acc[3] = {half, half, half};
      for (int k = 0; k < cnt; ++k) {
        const uint8_t* px = tmp.data() + (size_t(ymin + k) * out_w + ox) * 3;
        acc[0] += int64_t(cf[k]) * px[0];
        acc[1] += int64_t(cf[k]) * px[1];
        acc[2] += int64_t(cf[k]) * px[2];
      }
      float* o = out + (size_t(oy) * out_w + ox) * 3;
      o[0] = float(clip8(acc[0])) / 255.0f;
      o[1] = float(clip8(acc[1])) / 255.0f;
      o[2] = float(clip8(acc[2])) / 255.0f;
    }
  }
}

}  // namespace

extern "C" {

// Decode one image and resize to (w, h); out: float32 HWC [0,1].
// flip != 0 mirrors horizontally (the do_flip augmentation).
// Returns 0 on success.
int malio_load_image(const char* path, int w, int h, int flip, float* out) {
  Image img;
  if (!decode_file(path, &img)) return 1;
  if (flip) {
    for (int y = 0; y < img.h; ++y) {
      uint8_t* row = img.data.data() + size_t(y) * img.w * 3;
      for (int x = 0; x < img.w / 2; ++x)
        for (int c = 0; c < 3; ++c)
          std::swap(row[x * 3 + c], row[(img.w - 1 - x) * 3 + c]);
    }
  }
  resize_lanczos(img, w, h, out);
  return 0;
}

// Batched threaded load: n images into out (n, h, w, 3) float32.
// paths: array of n C strings; flips: n ints. Returns #failures.
int malio_load_batch(const char** paths, const int* flips, int n, int w,
                     int h, int num_threads, float* out) {
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (malio_load_image(paths[i], w, h, flips[i],
                           out + size_t(i) * w * h * 3) != 0)
        failures.fetch_add(1);
    }
  };
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Project velodyne points into the image plane with nearest-depth dedupe
// (`manydepth/kitti_utils.py:50-102`). points: (n, 4) float32 [x y z 1]
// (already reflectance-replaced); P: (3, 4) row-major velo->image.
// out: (H, W) float32 depth, 0 where empty.
void malio_velodyne_depth(const float* points, int n, const float* P, int H,
                          int W, float* out) {
  std::memset(out, 0, sizeof(float) * size_t(H) * W);
  for (int i = 0; i < n; ++i) {
    const float* p = points + size_t(i) * 4;
    if (p[0] < 0) continue;  // behind the camera plane
    float x = P[0] * p[0] + P[1] * p[1] + P[2] * p[2] + P[3];
    float y = P[4] * p[0] + P[5] * p[1] + P[6] * p[2] + P[7];
    float z = P[8] * p[0] + P[9] * p[1] + P[10] * p[2] + P[11];
    if (z <= 0) continue;
    int u = int(std::lround(x / z)) - 1;
    int v = int(std::lround(y / z)) - 1;
    if (u < 0 || u >= W || v < 0 || v >= H) continue;
    float& d = out[size_t(v) * W + u];
    if (d == 0.0f || z < d) d = z;  // keep the closest point
  }
}

}  // extern "C"
