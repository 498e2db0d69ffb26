// Native frame loader: threaded JPEG/PNG decode + letterbox resize +
// normalize, feeding the TPU streaming pipeline.
//
// TPU-native counterpart of the reference's native data path (the reference
// relies on torch DataLoader's C++ workers + cv2; this environment has
// neither). Workers decode ahead into a bounded ring of float buffers so
// host preprocessing overlaps device compute (the "double-buffered frame
// queue" of BASELINE.json's north star). Exposed via a plain C ABI consumed
// with ctypes (no pybind11 in this image).
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC, links libjpeg/libpng).

#include <cstddef>
#include <cstdio>
#include <csetjmp>
#include <cmath>
#include <algorithm>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
  bool ok = false;
};

bool has_suffix(const std::string& s, const char* suf) {
  size_t n = strlen(suf), m = s.size();
  if (m < n) return false;
  for (size_t i = 0; i < n; i++) {
    char a = s[m - n + i], b = suf[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != b) return false;
  }
  return true;
}

Image decode_jpeg(const std::string& path) {
  Image im;
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return im;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = [](j_common_ptr ci) { longjmp(*(jmp_buf*)ci->client_data, 1); };
  jmp_buf env;
  cinfo.client_data = &env;
  if (setjmp(env)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return im;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  im.w = cinfo.output_width;
  im.h = cinfo.output_height;
  im.rgb.resize((size_t)im.w * im.h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = im.rgb.data() + (size_t)cinfo.output_scanline * im.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  im.ok = true;
  return im;
}

Image decode_png(const std::string& path) {
  Image im;
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return im;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return im;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  im.w = png_get_image_width(png, info);
  im.h = png_get_image_height(png, info);
  im.rgb.resize((size_t)im.w * im.h * 3);
  std::vector<png_bytep> rows(im.h);
  for (int y = 0; y < im.h; y++)
    rows[y] = im.rgb.data() + (size_t)y * im.w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  im.ok = true;
  return im;
}

// bilinear resize + letterbox (or stretch) + /255 normalize into float out
void resize_norm(const Image& im, float* out, int oh, int ow, bool scale_fill,
                 float pad_val) {
  float gx, gy;
  int uw, uh, px = 0, py = 0;
  if (scale_fill) {
    uw = ow; uh = oh;
    gx = (float)im.w / ow;
    gy = (float)im.h / oh;
  } else {
    float gain = std::min((float)oh / im.h, (float)ow / im.w);
    uw = (int)(im.w * gain + 0.5f);
    uh = (int)(im.h * gain + 0.5f);
    px = (ow - uw) / 2;
    py = (oh - uh) / 2;
    gx = (float)im.w / uw;
    gy = (float)im.h / uh;
    for (size_t i = 0; i < (size_t)oh * ow * 3; i++) out[i] = pad_val;
  }
  for (int y = 0; y < uh; y++) {
    float sy = (y + 0.5f) * gy - 0.5f;
    int y0 = (int)floorf(sy);
    float ty = sy - y0;
    int y0c = y0 < 0 ? 0 : (y0 >= im.h ? im.h - 1 : y0);
    int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= im.h ? im.h - 1 : y0 + 1);
    const uint8_t* r0 = im.rgb.data() + (size_t)y0c * im.w * 3;
    const uint8_t* r1 = im.rgb.data() + (size_t)y1c * im.w * 3;
    float* orow = out + ((size_t)(y + py) * ow + px) * 3;
    for (int x = 0; x < uw; x++) {
      float sx = (x + 0.5f) * gx - 0.5f;
      int x0 = (int)floorf(sx);
      float tx = sx - x0;
      int x0c = x0 < 0 ? 0 : (x0 >= im.w ? im.w - 1 : x0);
      int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= im.w ? im.w - 1 : x0 + 1);
      for (int c = 0; c < 3; c++) {
        float v00 = r0[x0c * 3 + c], v01 = r0[x1c * 3 + c];
        float v10 = r1[x0c * 3 + c], v11 = r1[x1c * 3 + c];
        float v = (v00 * (1 - tx) + v01 * tx) * (1 - ty) +
                  (v10 * (1 - tx) + v11 * tx) * ty;
        orow[x * 3 + c] = v * (1.0f / 255.0f);
      }
    }
  }
}

struct Slot {
  std::vector<float> buf;
  int orig_h = 0, orig_w = 0;
  int ok = 0;
  std::atomic<int> ready{0};
};

struct Loader {
  std::vector<std::string> paths;
  int oh, ow;
  bool scale_fill;
  int n_ring;
  std::vector<Slot> ring;
  std::atomic<size_t> next_job{0};
  size_t next_out = 0;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_space, cv_ready;
  std::atomic<bool> stop{false};

  Loader(std::vector<std::string> p, int oh_, int ow_, int threads,
         bool fill)
      : paths(std::move(p)), oh(oh_), ow(ow_), scale_fill(fill),
        n_ring(std::max(2 * threads, 4)), ring(n_ring) {
    for (auto& s : ring) s.buf.resize((size_t)oh * ow * 3);
    for (int t = 0; t < threads; t++)
      workers.emplace_back([this] { work(); });
  }

  ~Loader() {
    stop = true;
    cv_space.notify_all();
    for (auto& w : workers) w.join();
  }

  void work() {
    while (!stop) {
      size_t j = next_job.fetch_add(1);
      if (j >= paths.size()) return;
      Slot& s = ring[j % n_ring];
      {  // wait until the consumer has drained this slot's previous round
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] {
          return stop || (j < next_out + (size_t)n_ring);
        });
        if (stop) return;
      }
      Image im = has_suffix(paths[j], ".png") ? decode_png(paths[j])
                                              : decode_jpeg(paths[j]);
      if (im.ok) {
        resize_norm(im, s.buf.data(), oh, ow, scale_fill, 114.0f / 255.0f);
        s.orig_h = im.h;
        s.orig_w = im.w;
        s.ok = 1;
      } else {
        s.ok = 0;
      }
      s.ready.store((int)(j + 1), std::memory_order_release);
      cv_ready.notify_all();
    }
  }

  // returns 1 on success, 0 on decode failure, -1 at end of stream
  int next(float* out, int* orig_h, int* orig_w) {
    if (next_out >= paths.size()) return -1;
    size_t j = next_out;
    Slot& s = ring[j % n_ring];
    {
      std::unique_lock<std::mutex> lk(mu);
      cv_ready.wait(lk, [&] {
        return s.ready.load(std::memory_order_acquire) == (int)(j + 1);
      });
    }
    int ok = s.ok;
    if (ok) {
      memcpy(out, s.buf.data(), s.buf.size() * sizeof(float));
      *orig_h = s.orig_h;
      *orig_w = s.orig_w;
    }
    {
      std::lock_guard<std::mutex> lk(mu);
      next_out = j + 1;
    }
    cv_space.notify_all();
    return ok;
  }
};

}  // namespace

extern "C" {

void* fl_create(const char** paths, int n, int out_h, int out_w,
                int n_threads, int scale_fill) {
  std::vector<std::string> p(paths, paths + n);
  return new Loader(std::move(p), out_h, out_w,
                    n_threads > 0 ? n_threads : 2, scale_fill != 0);
}

int fl_next(void* h, float* out, int* orig_h, int* orig_w) {
  return static_cast<Loader*>(h)->next(out, orig_h, orig_w);
}

void fl_destroy(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"
