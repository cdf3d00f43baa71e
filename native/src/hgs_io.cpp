// hgs_io: native image data plane for horizongs_tpu.
//
// The reference framework's data loader is a Python thread pool over PIL
// (`utils/camera_utils.py:69-90`, `scene/dataset_readers.py` thread-pool
// camera loading); at city scale (thousands of 1080p+ frames loaded and
// resized up front) decode+resize dominates scene build. This library
// provides the native equivalent: libjpeg/libpng decode, antialiased
// separable triangle resize (PIL-style), float RGBA normalization, and a
// std::thread prefetch pool — exposed as a plain C API consumed via
// ctypes (no pybind11 in this environment).
//
// All functions return 0 on success, negative error codes otherwise.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int ERR_OPEN = -1;
constexpr int ERR_DECODE = -2;
constexpr int ERR_FORMAT = -3;
constexpr int ERR_ARG = -4;

struct ImageU8 {
  int w = 0, h = 0, c = 0;     // c in {1, 3, 4}
  std::vector<uint8_t> data;   // h * w * c
};

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* mgr = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(mgr->setjmp_buffer, 1);
}

int decode_jpeg(FILE* f, ImageU8* out) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return ERR_DECODE;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = cinfo.num_components == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = cinfo.output_components;
  out->data.resize(size_t(out->w) * out->h * out->c);
  const size_t stride = size_t(out->w) * out->c;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

int decode_png(FILE* f, ImageU8* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return ERR_DECODE;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return ERR_DECODE;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return ERR_DECODE;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);

  const int c = png_get_channels(png, info);
  out->w = int(w);
  out->h = int(h);
  out->c = c == 2 ? 2 : c;  // gray+alpha kept as 2, handled by caller
  out->data.resize(size_t(w) * h * c);
  std::vector<png_bytep> rows(h);
  const size_t stride = size_t(w) * c;
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + y * stride;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

int decode_any(const char* path, ImageU8* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return ERR_OPEN;
  uint8_t magic[8] = {0};
  const size_t got = fread(magic, 1, 8, f);
  rewind(f);
  int rc = ERR_FORMAT;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF) {
    rc = decode_jpeg(f, out);
  } else if (got >= 8 && !memcmp(magic, "\x89PNG\r\n\x1a\n", 8)) {
    rc = decode_png(f, out);
  }
  fclose(f);
  return rc;
}

// ---------------------------------------------------------------------------
// Antialiased separable triangle resize (PIL-style BILINEAR):
// kernel support scales with the downscale factor, so minification
// averages instead of aliasing. Operates u8 -> f32 planes.
// ---------------------------------------------------------------------------

struct Taps {
  std::vector<int> start;      // first source index per target index
  std::vector<int> count;      // taps per target index
  std::vector<float> weight;   // flattened weights, max_taps per target
  int max_taps = 0;
};

Taps make_taps(int src, int dst) {
  Taps t;
  const double scale = double(src) / dst;
  const double support = scale > 1.0 ? scale : 1.0;
  t.max_taps = int(std::ceil(support)) * 2 + 1;
  t.start.resize(dst);
  t.count.resize(dst);
  t.weight.assign(size_t(dst) * t.max_taps, 0.0f);
  for (int i = 0; i < dst; ++i) {
    const double center = (i + 0.5) * scale;
    int lo = int(std::floor(center - support));
    int hi = int(std::ceil(center + support));
    if (lo < 0) lo = 0;
    if (hi > src) hi = src;
    double sum = 0.0;
    const int n = hi - lo;
    for (int k = 0; k < n; ++k) {
      const double x = (lo + k + 0.5 - center) / (scale > 1.0 ? scale : 1.0);
      const double wgt = x > -1.0 && x < 1.0 ? 1.0 - std::fabs(x) : 0.0;
      t.weight[size_t(i) * t.max_taps + k] = float(wgt);
      sum += wgt;
    }
    if (sum <= 0.0) {  // degenerate: nearest
      const int c = std::min(src - 1, std::max(0, int(center)));
      lo = c;
      t.weight[size_t(i) * t.max_taps] = 1.0f;
      sum = 1.0;
      t.count[i] = 1;
      t.start[i] = lo;
      continue;
    }
    const float inv = float(1.0 / sum);
    for (int k = 0; k < n; ++k) t.weight[size_t(i) * t.max_taps + k] *= inv;
    t.start[i] = lo;
    t.count[i] = n;
  }
  return t;
}

// resize one image (any channel count) u8 (h,w,c) -> f32 (th,tw,c)/255
void resize_f32(const ImageU8& img, int tw, int th, float* out) {
  const int c = img.c;
  const Taps tx = make_taps(img.w, tw);
  const Taps ty = make_taps(img.h, th);
  // horizontal pass: (h, w, c) u8 -> (h, tw, c) f32
  std::vector<float> tmp(size_t(img.h) * tw * c);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* srow = img.data.data() + size_t(y) * img.w * c;
    float* drow = tmp.data() + size_t(y) * tw * c;
    for (int x = 0; x < tw; ++x) {
      const int s0 = tx.start[x], n = tx.count[x];
      const float* wgt = tx.weight.data() + size_t(x) * tx.max_taps;
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int k = 0; k < n; ++k)
          acc += wgt[k] * srow[(s0 + k) * c + ch];
        drow[x * c + ch] = acc;
      }
    }
  }
  // vertical pass: (h, tw, c) -> (th, tw, c), normalize to [0,1]
  const float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < th; ++y) {
    const int s0 = ty.start[y], n = ty.count[y];
    const float* wgt = ty.weight.data() + size_t(y) * ty.max_taps;
    float* drow = out + size_t(y) * tw * c;
    for (int x = 0; x < tw * c; ++x) {
      float acc = 0.0f;
      for (int k = 0; k < n; ++k)
        acc += wgt[k] * tmp[size_t(s0 + k) * tw * c + x];
      drow[x] = acc * inv255;
    }
  }
}

// expand decoded (th, tw, c) floats into RGBA (th, tw, 4)
void to_rgba(const float* src, int n_px, int c, float* dst) {
  for (int i = 0; i < n_px; ++i) {
    const float* s = src + size_t(i) * c;
    float* d = dst + size_t(i) * 4;
    switch (c) {
      case 1: d[0] = d[1] = d[2] = s[0]; d[3] = 1.0f; break;
      case 2: d[0] = d[1] = d[2] = s[0]; d[3] = s[1]; break;
      case 3: d[0] = s[0]; d[1] = s[1]; d[2] = s[2]; d[3] = 1.0f; break;
      default: d[0] = s[0]; d[1] = s[1]; d[2] = s[2]; d[3] = s[3]; break;
    }
  }
}

int load_resize_rgba(const char* path, int tw, int th, float* out_rgba) {
  if (!path || !out_rgba || tw <= 0 || th <= 0) return ERR_ARG;
  ImageU8 img;
  const int rc = decode_any(path, &img);
  if (rc != 0) return rc;
  std::vector<float> resized(size_t(th) * tw * img.c);
  resize_f32(img, tw, th, resized.data());
  to_rgba(resized.data(), tw * th, img.c, out_rgba);
  return 0;
}

// ---------------------------------------------------------------------------
// Prefetch pool
// ---------------------------------------------------------------------------

struct Job {
  std::string path;
  int tw, th;
  float* out;         // caller-owned (th, tw, 4) f32 buffer
  int ticket;
};

struct Pool {
  std::vector<std::thread> workers;
  std::deque<Job> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::condition_variable cv_done;
  std::vector<int> status;  // per ticket: 1 pending, 0 ok, <0 error
  bool stop = false;

  explicit Pool(int n_threads) {
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { run(); });
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto& w : workers) w.join();
  }

  int submit(const char* path, int tw, int th, float* out) {
    std::lock_guard<std::mutex> lk(mu);
    const int ticket = int(status.size());
    status.push_back(1);
    queue.push_back(Job{path, tw, th, out, ticket});
    cv.notify_one();
    return ticket;
  }

  int wait(int ticket) {
    std::unique_lock<std::mutex> lk(mu);
    if (ticket < 0 || ticket >= int(status.size())) return ERR_ARG;
    cv_done.wait(lk, [&] { return status[ticket] != 1; });
    return status[ticket];
  }

  void run() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = std::move(queue.front());
        queue.pop_front();
      }
      const int rc = load_resize_rgba(job.path.c_str(), job.tw, job.th,
                                      job.out);
      {
        std::lock_guard<std::mutex> lk(mu);
        status[job.ticket] = rc;
      }
      cv_done.notify_all();
    }
  }
};

}  // namespace

extern "C" {

// header-only probe: image dimensions + channels without full decode
int hgs_image_info(const char* path, int* w, int* h, int* c) {
  FILE* f = fopen(path, "rb");
  if (!f) return ERR_OPEN;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  int rc = ERR_FORMAT;
  if (got >= 8 && !memcmp(magic, "\x89PNG\r\n\x1a\n", 8)) {
    // IHDR: length(4) "IHDR"(4) w(4) h(4) depth(1) color(1)
    uint8_t ihdr[18];
    if (fseek(f, 8, SEEK_SET) == 0 && fread(ihdr, 1, 18, f) == 18 &&
        !memcmp(ihdr + 4, "IHDR", 4)) {
      *w = (ihdr[8] << 24) | (ihdr[9] << 16) | (ihdr[10] << 8) | ihdr[11];
      *h = (ihdr[12] << 24) | (ihdr[13] << 16) | (ihdr[14] << 8) | ihdr[15];
      const int color = ihdr[17];
      *c = color == 2 ? 3 : color == 6 ? 4 : color == 4 ? 2 : 1;
      rc = 0;
    }
  } else if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8) {
    rewind(f);
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_exit;
    if (!setjmp(jerr.setjmp_buffer)) {
      jpeg_create_decompress(&cinfo);
      jpeg_stdio_src(&cinfo, f);
      jpeg_read_header(&cinfo, TRUE);
      *w = cinfo.image_width;
      *h = cinfo.image_height;
      *c = cinfo.num_components;
      rc = 0;
    } else {
      rc = ERR_DECODE;
    }
    jpeg_destroy_decompress(&cinfo);
  }
  fclose(f);
  return rc;
}

// decode + antialiased resize + normalize into caller's (th, tw, 4) f32
int hgs_load_resize_rgba(const char* path, int tw, int th, float* out_rgba) {
  return load_resize_rgba(path, tw, th, out_rgba);
}

// ---------------------------------------------------------------------------
// COLMAP points3D.bin parser. Record layout (variable length):
//   uint64 point_id; double xyz[3]; uint8 rgb[3]; double error;
//   uint64 track_len; { int32 image_id; int32 point2d_idx } * track_len
// The Python reference walks this with per-point struct.unpack
// (`preprocess/read_write_model.py`); at city scale (millions of
// points) that's tens of seconds — this is one fread + pointer walk.
// ---------------------------------------------------------------------------

static int read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return ERR_OPEN;
  fseek(f, 0, SEEK_END);
  const long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf->resize(size_t(sz));
  const size_t got = fread(buf->data(), 1, size_t(sz), f);
  fclose(f);
  return got == size_t(sz) ? 0 : ERR_DECODE;
}

int hgs_colmap_points3d_count(const char* path, long long* n_out) {
  std::vector<uint8_t> buf;
  const int rc = read_file(path, &buf);
  if (rc != 0) return rc;
  if (buf.size() < 8) return ERR_FORMAT;
  uint64_t n;
  memcpy(&n, buf.data(), 8);
  *n_out = (long long)n;
  return 0;
}

// Fills caller-allocated ids (n), xyz (n*3), rgb (n*3), err (n).
// track_total_out, if non-null, receives the summed track length.
int hgs_colmap_points3d_read(const char* path, long long n,
                             long long* ids, double* xyz, uint8_t* rgb,
                             double* err, long long* track_total_out) {
  std::vector<uint8_t> buf;
  const int rc = read_file(path, &buf);
  if (rc != 0) return rc;
  if (buf.size() < 8) return ERR_FORMAT;
  uint64_t n_file;
  memcpy(&n_file, buf.data(), 8);
  if ((long long)n_file != n) return ERR_ARG;
  const uint8_t* p = buf.data() + 8;
  const uint8_t* end = buf.data() + buf.size();
  long long track_total = 0;
  for (long long i = 0; i < n; ++i) {
    if (p + 8 + 24 + 3 + 8 + 8 > end) return ERR_FORMAT;
    memcpy(&ids[i], p, 8);
    p += 8;
    memcpy(&xyz[i * 3], p, 24);
    p += 24;
    memcpy(&rgb[i * 3], p, 3);
    p += 3;
    memcpy(&err[i], p, 8);
    p += 8;
    uint64_t tlen;
    memcpy(&tlen, p, 8);
    p += 8;
    if (p + tlen * 8 > end) return ERR_FORMAT;
    p += tlen * 8;
    track_total += (long long)tlen;
  }
  if (track_total_out) *track_total_out = track_total;
  return 0;
}

void* hgs_pool_create(int n_threads) {
  if (n_threads <= 0) n_threads = int(std::thread::hardware_concurrency());
  if (n_threads <= 0) n_threads = 4;
  return new Pool(n_threads);
}

int hgs_pool_submit(void* pool, const char* path, int tw, int th,
                    float* out_rgba) {
  if (!pool) return ERR_ARG;
  return static_cast<Pool*>(pool)->submit(path, tw, th, out_rgba);
}

int hgs_pool_wait(void* pool, int ticket) {
  if (!pool) return ERR_ARG;
  return static_cast<Pool*>(pool)->wait(ticket);
}

void hgs_pool_destroy(void* pool) {
  delete static_cast<Pool*>(pool);
}

}  // extern "C"
