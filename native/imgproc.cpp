// llava-reward-tpu native image pipeline.
//
// Replaces the role of torchvision's C++ ops + PIL in the reference's data
// path (SURVEY.md §2b: processing_phi3_v.py:60-104 resize/pad/normalize,
// vision_process.py image fetch), which SURVEY.md §3.4 identifies as the
// eval-time bottleneck. Provides:
//   - JPEG/PNG decode (libjpeg / libpng)
//   - separable antialiased resampling (PIL-style triangle / Catmull-Rom
//     style cubic with a=-0.5 matching Pillow BICUBIC, float path)
//   - CLIP normalisation to channels-last float32
//   - a fused phi3v HD transform: decode -> HD resize -> white pad ->
//     normalize, one call per image, thread-pooled batch entry point.
//
// C ABI only; Python binds via ctypes (no pybind11 in the image).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------- decode

struct jerr_mgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void jerr_exit(j_common_ptr cinfo) {
  jerr_mgr* e = reinterpret_cast<jerr_mgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decode JPEG bytes to RGB8. Returns 0 on success; fills *out_h/*out_w.
// If out == nullptr, only reports dimensions.
int lrt_decode_jpeg(const uint8_t* data, int64_t len, uint8_t* out,
                    int32_t* out_h, int32_t* out_w) {
  jpeg_decompress_struct cinfo;
  jerr_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *out_h = static_cast<int32_t>(cinfo.output_height);
  *out_w = static_cast<int32_t>(cinfo.output_width);
  if (!out) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  const int stride = cinfo.output_width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

struct PngReadCtx {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

static void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadCtx* c = static_cast<PngReadCtx*>(png_get_io_ptr(png));
  if (c->pos + n > c->len) {
    png_error(png, "short read");
  }
  memcpy(out, c->data + c->pos, n);
  c->pos += n;
}

int lrt_decode_png(const uint8_t* data, int64_t len, uint8_t* out,
                   int32_t* out_h, int32_t* out_w) {
  if (len < 8 || png_sig_cmp(data, 0, 8)) return -1;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  PngReadCtx ctx{data, static_cast<size_t>(len), 0};
  png_set_read_fn(png, &ctx, png_read_fn);
  png_read_info(png, info);
  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  *out_h = static_cast<int32_t>(h);
  *out_w = static_cast<int32_t>(w);
  if (!out) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
  }
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// ---------------------------------------------------------------- resample

// PIL-style antialiased separable resampling (float path).
struct Filter {
  double support;
  double (*fn)(double);
};

static double triangle_filter(double x) {
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

static double cubic_filter(double x) {  // Pillow BICUBIC: a = -0.5
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Coeffs {
  std::vector<int> bounds;     // 2 per output pixel: (xmin, xmax)
  std::vector<float> k;        // ksize per output pixel
  int ksize;
};

static Coeffs precompute(int in_size, int out_size, const Filter& f) {
  Coeffs c;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = f.support * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.ksize = ksize;
  c.bounds.resize(out_size * 2);
  c.k.resize(static_cast<size_t>(out_size) * ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(std::max(0.0, center - support + 0.5));
    int xmax = static_cast<int>(std::min(static_cast<double>(in_size), center + support + 0.5));
    xmax -= xmin;
    float* kp = &c.k[static_cast<size_t>(xx) * ksize];
    std::vector<double> tmpw(xmax);
    for (int x = 0; x < xmax; ++x) {
      double w = f.fn((x + xmin - center + 0.5) * ss);
      tmpw[x] = w;
      ww += w;
    }
    for (int x = 0; x < xmax; ++x)
      kp[x] = static_cast<float>(tmpw[x] / (ww != 0.0 ? ww : 1.0));
    c.bounds[xx * 2] = xmin;
    c.bounds[xx * 2 + 1] = xmax;
  }
  return c;
}

// Resample RGB8 (h, w, 3) -> float32 (out_h, out_w, 3), channels-last.
// mode: 0 = bilinear (triangle), 1 = bicubic.
int lrt_resize_rgb8_f32(const uint8_t* src, int32_t h, int32_t w,
                        float* dst, int32_t out_h, int32_t out_w, int32_t mode) {
  Filter f = mode == 1 ? Filter{2.0, cubic_filter} : Filter{1.0, triangle_filter};
  Coeffs cx = precompute(w, out_w, f);
  Coeffs cy = precompute(h, out_h, f);

  // vertical-first: (h, w, 3) u8 -> (out_h, w, 3) float, contiguous rows
  // vectorise cleanly; then horizontal on short rows
  std::vector<float> tmp(static_cast<size_t>(out_h) * w * 3);
  const int W3 = w * 3;
  for (int yy = 0; yy < out_h; ++yy) {
    int ymin = cy.bounds[yy * 2], ymax = cy.bounds[yy * 2 + 1];
    const float* kp = &cy.k[static_cast<size_t>(yy) * cy.ksize];
    float* __restrict orow = tmp.data() + static_cast<size_t>(yy) * W3;
    const uint8_t* __restrict r0 = src + static_cast<size_t>(ymin) * W3;
    {
      const float k0 = kp[0];
      for (int x = 0; x < W3; ++x) orow[x] = r0[x] * k0;
    }
    for (int y = 1; y < ymax; ++y) {
      const uint8_t* __restrict row = src + static_cast<size_t>(ymin + y) * W3;
      const float ky = kp[y];
      for (int x = 0; x < W3; ++x) orow[x] += row[x] * ky;
    }
  }
  // horizontal pass
  for (int yy = 0; yy < out_h; ++yy) {
    const float* __restrict irow = tmp.data() + static_cast<size_t>(yy) * W3;
    float* __restrict orow = dst + static_cast<size_t>(yy) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      int xmin = cx.bounds[xx * 2], xmax = cx.bounds[xx * 2 + 1];
      const float* kp = &cx.k[static_cast<size_t>(xx) * cx.ksize];
      float a0 = 0, a1 = 0, a2 = 0;
      const float* px = irow + static_cast<size_t>(xmin) * 3;
      for (int x = 0; x < xmax; ++x) {
        const float kx = kp[x];
        a0 += px[0] * kx;
        a1 += px[1] * kx;
        a2 += px[2] * kx;
        px += 3;
      }
      orow[xx * 3 + 0] = a0;
      orow[xx * 3 + 1] = a1;
      orow[xx * 3 + 2] = a2;
    }
  }
  return 0;
}

// ---------------------------------------------------------------- fused HD

// Fused phi3v HD transform for ONE image already decoded to RGB8:
// transpose-if-portrait -> bilinear resize to (new_h, new_w) -> white pad
// top/bottom to pad_h -> transpose back -> CLIP-normalise.
// dst: float32 (final_h, final_w, 3) channels-last.
// Geometry (new_w, new_h, pad_h, transposed) is computed by the Python side
// (preprocess/phi3v_processor.py hd_transform_scale) and passed in.
int lrt_phi3v_hd_normalize(const uint8_t* src, int32_t h, int32_t w,
                           int32_t transposed, int32_t new_h, int32_t new_w,
                           int32_t pad_h, const float* mean, const float* std_,
                           float* dst) {
  // optional transpose (portrait -> landscape)
  std::vector<uint8_t> t;
  const uint8_t* img = src;
  int ih = h, iw = w;
  if (transposed) {
    t.resize(static_cast<size_t>(h) * w * 3);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x)
        for (int ch = 0; ch < 3; ++ch)
          t[(static_cast<size_t>(x) * h + y) * 3 + ch] =
              src[(static_cast<size_t>(y) * w + x) * 3 + ch];
    img = t.data();
    ih = w;
    iw = h;
  }

  std::vector<float> resized(static_cast<size_t>(new_h) * new_w * 3);
  lrt_resize_rgb8_f32(img, ih, iw, resized.data(), new_h, new_w, /*bilinear*/ 0);

  int top = (pad_h - new_h) / 2;
  // normalise as a fused multiply-add: (v/255 - mean)/std = v*scale + bias
  float nscale[3], nbias[3], white[3];
  for (int ch = 0; ch < 3; ++ch) {
    nscale[ch] = 1.0f / (255.0f * std_[ch]);
    nbias[ch] = -mean[ch] / std_[ch];
    white[ch] = 255.0f * nscale[ch] + nbias[ch];
  }
  if (!transposed) {
    for (int y = 0; y < pad_h; ++y) {
      float* __restrict orow = dst + static_cast<size_t>(y) * new_w * 3;
      if (y < top || y >= top + new_h) {
        for (int x = 0; x < new_w; ++x) {
          orow[x * 3 + 0] = white[0];
          orow[x * 3 + 1] = white[1];
          orow[x * 3 + 2] = white[2];
        }
      } else {
        const float* __restrict irow =
            resized.data() + static_cast<size_t>(y - top) * new_w * 3;
        for (int x = 0; x < new_w; ++x) {
          orow[x * 3 + 0] = irow[x * 3 + 0] * nscale[0] + nbias[0];
          orow[x * 3 + 1] = irow[x * 3 + 1] * nscale[1] + nbias[1];
          orow[x * 3 + 2] = irow[x * 3 + 2] * nscale[2] + nbias[2];
        }
      }
    }
  } else {
    // final shape is (new_w, pad_h, 3): transpose back, row-major writes
    for (int x = 0; x < new_w; ++x) {
      float* __restrict o = dst + static_cast<size_t>(x) * pad_h * 3;
      for (int y = 0; y < pad_h; ++y) {
        if (y < top || y >= top + new_h) {
          o[y * 3 + 0] = white[0];
          o[y * 3 + 1] = white[1];
          o[y * 3 + 2] = white[2];
        } else {
          const float* p = resized.data() +
                           (static_cast<size_t>(y - top) * new_w + x) * 3;
          o[y * 3 + 0] = p[0] * nscale[0] + nbias[0];
          o[y * 3 + 1] = p[1] * nscale[1] + nbias[1];
          o[y * 3 + 2] = p[2] * nscale[2] + nbias[2];
        }
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------- batch

typedef struct {
  const uint8_t* data;
  int64_t len;
  int32_t transposed, new_h, new_w, pad_h;
  float* dst;       // (final_h, final_w, 3)
  int32_t status;
} LrtHdTask;

// Thread-pooled: decode (JPEG, falling back to PNG) + fused HD transform
// for a batch of images.
int lrt_phi3v_hd_batch(LrtHdTask* tasks, int32_t n, const float* mean,
                       const float* std_, int32_t num_threads) {
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      LrtHdTask& t = tasks[i];
      int32_t h = 0, w = 0;
      if (lrt_decode_jpeg(t.data, t.len, nullptr, &h, &w) != 0 &&
          lrt_decode_png(t.data, t.len, nullptr, &h, &w) != 0) {
        t.status = -1;
        continue;
      }
      std::vector<uint8_t> rgb(static_cast<size_t>(h) * w * 3);
      if (lrt_decode_jpeg(t.data, t.len, rgb.data(), &h, &w) != 0 &&
          lrt_decode_png(t.data, t.len, rgb.data(), &h, &w) != 0) {
        t.status = -1;
        continue;
      }
      t.status = lrt_phi3v_hd_normalize(rgb.data(), h, w, t.transposed, t.new_h,
                                        t.new_w, t.pad_h, mean, std_, t.dst);
    }
  };
  int nt = std::max(1, std::min<int32_t>(num_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int i = 0; i < nt; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  for (int i = 0; i < n; ++i)
    if (tasks[i].status != 0) return -1;
  return 0;
}

}  // extern "C"
