// mstgan_native — native runtime components for the TPU style-transfer
// framework.
//
// The reference project's "runtime" is per-image Python/PIL work inside its
// batch loop (batch_process_images.py:186-238 and the dataset transform,
// pretrain.py:32-37). This library is the TPU-native equivalent: a threaded
// JPEG/PNG decode + Lanczos-resize + canvas-paste pipeline that fills uint8
// batches for the device without touching Python per image, plus the
// felzenszwalb segmentation inner loop (union-find over sorted edges) that
// is the host-side hot spot of the local-style pipeline.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 mstgan_native.cpp
//        -o libmstgan_native.so -ljpeg -lpng -lpthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <csetjmp>

namespace {

// ---------------------------------------------------------------------------
// decoding
// ---------------------------------------------------------------------------

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // H*W*3
  bool ok = false;
};

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

Image decode_jpeg(FILE* f) {
  Image out;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out.w = cinfo.output_width;
  out.h = cinfo.output_height;
  out.rgb.resize(size_t(out.w) * out.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.rgb.data() + size_t(cinfo.output_scanline) * out.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out.ok = true;
  return out;
}

Image decode_png(FILE* f) {
  Image out;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return out;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return out;
  }
  // constructed BEFORE setjmp: longjmp past a vector's initialization is
  // UB and leaks its buffer; constructed-then-jumped-over objects in scope
  // are destroyed on the normal return below.
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return out;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  // force 8-bit RGB
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (png_get_bit_depth(png, info) == 16) png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out.w = png_get_image_width(png, info);
  out.h = png_get_image_height(png, info);
  out.rgb.resize(size_t(out.w) * out.h * 3);
  rows.resize(out.h);
  for (int y = 0; y < out.h; ++y)
    rows[y] = out.rgb.data() + size_t(y) * out.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  out.ok = true;
  return out;
}

Image decode_file(const char* path) {
  Image out;
  FILE* f = fopen(path, "rb");
  if (!f) return out;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    out = decode_jpeg(f);
  } else if (n >= 8 && !png_sig_cmp(magic, 0, 8)) {
    out = decode_png(f);
  }
  fclose(f);
  return out;
}

// ---------------------------------------------------------------------------
// Lanczos-3 resize (PIL-compatible: support scales with downscale factor)
// ---------------------------------------------------------------------------

inline double lanczos3(double x) {
  if (x == 0.0) return 1.0;
  x = std::abs(x);
  if (x >= 3.0) return 0.0;
  double px = M_PI * x;
  return 3.0 * std::sin(px) * std::sin(px / 3.0) / (px * px);
}

// Precomputed 1-D resampling taps for one axis (PIL ImagingResampleHorizontal
// equivalent).
struct Taps {
  int ksize;
  std::vector<int> bounds;      // 2 per output px: start, count
  std::vector<double> weights;  // ksize per output px
};

Taps compute_taps(int in_size, int out_size) {
  Taps t;
  double scale = double(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 3.0 * filterscale;
  t.ksize = int(std::ceil(support)) * 2 + 1;
  t.bounds.resize(size_t(out_size) * 2);
  t.weights.resize(size_t(out_size) * t.ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0;
    int xmin = std::max(0, int(center - support + 0.5));
    int xmax = std::min(in_size, int(center + support + 0.5)) - xmin;
    double* w = &t.weights[size_t(xx) * t.ksize];
    for (int x = 0; x < xmax; ++x) {
      double v = lanczos3((x + xmin - center + 0.5) / filterscale);
      w[x] = v;
      ww += v;
    }
    if (ww != 0.0)
      for (int x = 0; x < xmax; ++x) w[x] /= ww;
    t.bounds[size_t(xx) * 2] = xmin;
    t.bounds[size_t(xx) * 2 + 1] = xmax;
  }
  return t;
}

inline uint8_t clip8(double v) {
  return uint8_t(std::min(255.0, std::max(0.0, v + 0.5)));
}

// Resize RGB uint8 (h,w) -> (nh,nw)
std::vector<uint8_t> lanczos_resize(const uint8_t* src, int h, int w,
                                    int nh, int nw) {
  Taps tx = compute_taps(w, nw);
  Taps ty = compute_taps(h, nh);
  // horizontal pass into double buffer (h, nw, 3)
  std::vector<double> tmp(size_t(h) * nw * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + size_t(y) * w * 3;
    double* orow = tmp.data() + size_t(y) * nw * 3;
    for (int x = 0; x < nw; ++x) {
      int xmin = tx.bounds[size_t(x) * 2];
      int cnt = tx.bounds[size_t(x) * 2 + 1];
      const double* wts = &tx.weights[size_t(x) * tx.ksize];
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < cnt; ++k) {
        const uint8_t* p = row + size_t(xmin + k) * 3;
        acc[0] += p[0] * wts[k];
        acc[1] += p[1] * wts[k];
        acc[2] += p[2] * wts[k];
      }
      orow[x * 3] = acc[0];
      orow[x * 3 + 1] = acc[1];
      orow[x * 3 + 2] = acc[2];
    }
  }
  // vertical pass
  std::vector<uint8_t> out(size_t(nh) * nw * 3);
  for (int y = 0; y < nh; ++y) {
    int ymin = ty.bounds[size_t(y) * 2];
    int cnt = ty.bounds[size_t(y) * 2 + 1];
    const double* wts = &ty.weights[size_t(y) * ty.ksize];
    uint8_t* orow = out.data() + size_t(y) * nw * 3;
    for (int x = 0; x < nw; ++x) {
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < cnt; ++k) {
        const double* p = tmp.data() + (size_t(ymin + k) * nw + x) * 3;
        acc[0] += p[0] * wts[k];
        acc[1] += p[1] * wts[k];
        acc[2] += p[2] * wts[k];
      }
      orow[x * 3] = clip8(acc[0]);
      orow[x * 3 + 1] = clip8(acc[1]);
      orow[x * 3 + 2] = clip8(acc[2]);
    }
  }
  return out;
}

}  // namespace

extern "C" {

// Decode one image; returns 1 on success. Caller provides the canvas buffer
// (canvas*canvas*3). orig_wh receives the source dimensions.
int mstgan_decode_canvas(const char* path, int canvas, uint8_t fill,
                         uint8_t* out, int* orig_wh) {
  Image img = decode_file(path);
  if (!img.ok) return 0;
  orig_wh[0] = img.w;
  orig_wh[1] = img.h;
  int nw, nh;
  if (img.w > img.h) {
    nw = canvas;
    nh = int(img.h * (double(canvas) / img.w));
  } else {
    nh = canvas;
    nw = int(img.w * (double(canvas) / img.h));
  }
  nw = std::max(nw, 1);
  nh = std::max(nh, 1);
  std::vector<uint8_t> resized = lanczos_resize(img.rgb.data(), img.h, img.w,
                                                nh, nw);
  std::memset(out, fill, size_t(canvas) * canvas * 3);
  int ox = (canvas - nw) / 2, oy = (canvas - nh) / 2;
  for (int y = 0; y < nh; ++y)
    std::memcpy(out + (size_t(oy + y) * canvas + ox) * 3,
                resized.data() + size_t(y) * nw * 3, size_t(nw) * 3);
  return 1;
}

// Threaded batch decode: paths is n pointers; out is (n, canvas, canvas, 3);
// orig_whs is (n, 2); ok flags (n). Returns count of successes.
int mstgan_decode_canvas_batch(const char** paths, int n, int canvas,
                               uint8_t fill, uint8_t* out, int* orig_whs,
                               uint8_t* ok, int num_threads) {
  std::atomic<int> next(0), good(0);
  int nt = std::max(1, std::min(num_threads, n));
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      int r = mstgan_decode_canvas(paths[i], canvas, fill,
                                   out + size_t(i) * canvas * canvas * 3,
                                   orig_whs + size_t(i) * 2);
      ok[i] = uint8_t(r);
      if (r) good.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return good.load();
}

// Plain resize for the save path (restore to original size).
int mstgan_resize(const uint8_t* src, int h, int w, uint8_t* dst, int nh,
                  int nw) {
  auto out = lanczos_resize(src, h, w, nh, nw);
  std::memcpy(dst, out.data(), out.size());
  return 1;
}

// ---------------------------------------------------------------------------
// felzenszwalb segmentation (the union-find hot loop)
// ---------------------------------------------------------------------------

namespace {
struct DSU {
  std::vector<int> parent, rank_;
  std::vector<int64_t> size;
  explicit DSU(int n) : parent(n), rank_(n, 0), size(n, 1) {
    std::iota(parent.begin(), parent.end(), 0);
  }
  int find(int x) {
    int root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int nx = parent[x];
      parent[x] = root;
      x = nx;
    }
    return root;
  }
  int unite(int a, int b) {
    int ra = find(a), rb = find(b);
    if (ra == rb) return ra;
    if (rank_[ra] < rank_[rb]) std::swap(ra, rb);
    parent[rb] = ra;
    size[ra] += size[rb];
    if (rank_[ra] == rank_[rb]) rank_[ra]++;
    return ra;
  }
};
}  // namespace

// img: (h, w, 3) float32 ALREADY smoothed and scaled to [0,1] by the caller
// (the Python wrapper does the gaussian pre-smoothing on device).
// labels_out: (h, w) int32. Returns number of segments.
int mstgan_felzenszwalb(const float* img, int h, int w, float scale,
                        int min_size, int32_t* labels_out) {
  const int n = h * w;
  struct Edge {
    float wgt;
    int a, b;
  };
  std::vector<Edge> edges;
  edges.reserve(size_t(n) * 4);
  auto diff = [&](int ia, int ib) {
    const float* pa = img + size_t(ia) * 3;
    const float* pb = img + size_t(ib) * 3;
    float d0 = pa[0] - pb[0], d1 = pa[1] - pb[1], d2 = pa[2] - pb[2];
    return std::sqrt(d0 * d0 + d1 * d1 + d2 * d2);
  };
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int i = y * w + x;
      if (x + 1 < w) edges.push_back({diff(i, i + 1), i, i + 1});
      if (y + 1 < h) edges.push_back({diff(i, i + w), i, i + w});
      if (x + 1 < w && y + 1 < h)
        edges.push_back({diff(i, i + w + 1), i, i + w + 1});
      if (x > 0 && y + 1 < h)
        edges.push_back({diff(i, i + w - 1), i, i + w - 1});
    }
  }
  std::stable_sort(edges.begin(), edges.end(),
                   [](const Edge& a, const Edge& b) { return a.wgt < b.wgt; });
  DSU dsu(n);
  std::vector<float> threshold(n, scale);
  for (const Edge& e : edges) {
    int ra = dsu.find(e.a), rb = dsu.find(e.b);
    if (ra == rb) continue;
    if (e.wgt <= threshold[ra] && e.wgt <= threshold[rb]) {
      int r = dsu.unite(ra, rb);
      threshold[r] = e.wgt + scale / dsu.size[r];
    }
  }
  for (const Edge& e : edges) {
    int ra = dsu.find(e.a), rb = dsu.find(e.b);
    if (ra != rb && (dsu.size[ra] < min_size || dsu.size[rb] < min_size))
      dsu.unite(ra, rb);
  }
  // relabel 0..k-1
  std::vector<int32_t> remap(n, -1);
  int32_t k = 0;
  for (int i = 0; i < n; ++i) {
    int r = dsu.find(i);
    if (remap[r] < 0) remap[r] = k++;
    labels_out[i] = remap[r];
  }
  return k;
}

}  // extern "C"
