// Native data loader: multi-threaded PNG/JPEG decode -> grayscale float.
//
// The reference's input pipeline decodes up to 550K frames through PIL one
// image at a time on the Python side (data_preprocessing.py:297,326,403).
// This loader is the TPU framework's native equivalent: a C++ decode +
// normalize stage feeding the host->device prefetcher, parallel across a
// thread pool, exposed to Python via ctypes (see
// iris_style_transfer_tpu/data/native_loader.py).
//
// Build: make -C native   (links libpng + libjpeg + libz + pthread)

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// Decode one image file (PNG or JPEG by magic) to grayscale float32 in
// [0,1], row-major (h, w). `out` must hold max_h*max_w floats. Returns 0
// on success and writes the actual dimensions; nonzero on failure.
int istl_decode_gray(const char* path, float* out, int* out_h, int* out_w,
                     int max_h, int max_w);

// Same, but raw 8-bit gray (the files' native depth) — no /255 convert.
// Keeps host memory and host->device traffic 4x smaller; the device
// programs dequantize (see ops/image.py:to_unit_float).
int istl_decode_gray_u8(const char* path, uint8_t* out, int* out_h,
                        int* out_w, int max_h, int max_w);

// Decode `n` same-sized images in parallel into a contiguous
// (n, h, w) float32 buffer. Files whose dimensions differ from (h, w)
// fail. Returns the number of failures (0 == all good).
int istl_decode_batch(const char** paths, int n, float* out, int h, int w,
                      int threads);

// u8 batch variant of the above.
int istl_decode_batch_u8(const char** paths, int n, uint8_t* out, int h,
                         int w, int threads);
}

namespace {

constexpr double kGrayR = 0.299, kGrayG = 0.587, kGrayB = 0.114;

// NOTE on error handling: both libpng and libjpeg report errors by
// longjmp (libjpeg's DEFAULT handler instead calls exit(), which would
// kill the whole training process on one corrupt file — a custom
// error_exit below restores the documented "nonzero on failure"
// contract).  Because longjmp skips destructors (UB for non-trivial
// ones), all buffers that live across decode calls are raw malloc'd
// pointers declared volatile and freed on both exits.

int decode_png(FILE* fp, uint8_t* out, int* out_h, int* out_w, int max_h,
               int max_w) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return 2;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 2;
  }
  uint8_t* volatile buf = nullptr;
  png_bytep* volatile rows = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    free(buf);
    free(rows);
    png_destroy_read_struct(&png, &info, nullptr);
    return 3;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  if ((int)h > max_h || (int)w > max_w) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 4;
  }
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  // normalize to 8-bit gray (PIL 'L' semantics: ITU-R 601 luma);
  // transparency is discarded (PIL convert('L') does not composite),
  // so alpha is stripped UNCONDITIONALLY — gating it on the
  // pre-transform color type missed gray+tRNS inputs
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  png_set_interlace_handling(png);  // de-interlace Adam7 inputs
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  buf = (uint8_t*)malloc(rowbytes * h);
  rows = (png_bytep*)malloc(sizeof(png_bytep) * h);
  if (!buf || !rows) {
    free(buf);
    free(rows);
    png_destroy_read_struct(&png, &info, nullptr);
    return 2;
  }
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = buf + (size_t)y * rowbytes;
  // whole-image read: handles interlaced files transparently
  png_read_image(png, const_cast<png_bytep*>(rows));
  png_read_end(png, nullptr);

  for (png_uint_32 y = 0; y < h; ++y) {
    const uint8_t* src = buf + (size_t)y * rowbytes;
    uint8_t* dst = out + (size_t)y * w;
    if (channels == 1) {
      memcpy(dst, src, w);
    } else {  // RGB
      for (png_uint_32 x = 0; x < w; ++x) {
        const uint8_t* p = &src[(size_t)x * channels];
        double g = kGrayR * p[0] + kGrayG * p[1] + kGrayB * p[2];
        dst[x] = (uint8_t)(g + 0.5);
      }
    }
  }
  free(buf);
  free(rows);
  png_destroy_read_struct(&png, &info, nullptr);
  *out_h = (int)h;
  *out_w = (int)w;
  return 0;
}

struct JpegErr {
  jpeg_error_mgr mgr;  // must be first: cinfo.err points here
  jmp_buf jb;
};

void jpeg_error_trap(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jb, 1);
}

int decode_jpeg(FILE* fp, uint8_t* out, int* out_h, int* out_w, int max_h,
                int max_w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  // libjpeg's default error_exit calls exit(): one corrupt frame in a
  // 550K-frame dataset would take down the process from a worker thread.
  // Trap to setjmp instead and report the documented nonzero rc.
  jerr.mgr.error_exit = jpeg_error_trap;
  uint8_t* volatile row = nullptr;
  if (setjmp(jerr.jb)) {
    free(row);
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  cinfo.out_color_space = JCS_GRAYSCALE;  // libjpeg does the luma transform
  jpeg_start_decompress(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  if (h > max_h || w > max_w) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 4;
  }
  row = (uint8_t*)malloc(w);
  if (!row) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  while ((int)cinfo.output_scanline < h) {
    int y = cinfo.output_scanline;
    uint8_t* rowp = row;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    memcpy(out + (size_t)y * w, row, w);
  }
  jpeg_finish_decompress(&cinfo);
  free(row);
  row = nullptr;
  // truncated files are only a WARNING to libjpeg (it pads the missing
  // scanlines with gray and reports success); PIL raises on truncation,
  // so count warnings as failure rather than return silently-corrupt data
  long warnings = jerr.mgr.num_warnings;
  jpeg_destroy_decompress(&cinfo);
  if (warnings) return 6;
  *out_h = h;
  *out_w = w;
  return 0;
}

}  // namespace

int istl_decode_gray_u8(const char* path, uint8_t* out, int* out_h,
                        int* out_w, int max_h, int max_w) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return 1;
  uint8_t magic[4] = {0};
  if (fread(magic, 1, 4, fp) != 4) {
    fclose(fp);
    return 1;
  }
  rewind(fp);
  int rc;
  if (magic[0] == 0x89 && magic[1] == 'P') {
    rc = decode_png(fp, out, out_h, out_w, max_h, max_w);
  } else if (magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg(fp, out, out_h, out_w, max_h, max_w);
  } else {
    rc = 5;  // unknown format
  }
  fclose(fp);
  return rc;
}

int istl_decode_gray(const char* path, float* out, int* out_h, int* out_w,
                     int max_h, int max_w) {
  // f32 view of the same decode: u8 core + one convert pass (identical
  // values to the historical float path: u8/255.0f, RGB luma via u8)
  uint8_t* tmp = (uint8_t*)malloc((size_t)max_h * max_w);
  if (!tmp) return 2;
  int rc = istl_decode_gray_u8(path, tmp, out_h, out_w, max_h, max_w);
  if (rc == 0) {
    size_t total = (size_t)(*out_h) * (size_t)(*out_w);
    for (size_t i = 0; i < total; ++i) out[i] = tmp[i] / 255.0f;
  }
  free(tmp);
  return rc;
}

namespace {

template <typename T, typename DecodeFn>
int decode_batch_impl(const char** paths, int n, T* out, int h, int w,
                      int threads, DecodeFn decode_one) {
  if (threads < 1) threads = 1;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int ih = 0, iw = 0;
      int rc = decode_one(paths[i], out + (size_t)i * h * w, &ih, &iw, h, w);
      if (rc != 0 || ih != h || iw != w) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}

}  // namespace

int istl_decode_batch(const char** paths, int n, float* out, int h, int w,
                      int threads) {
  return decode_batch_impl(paths, n, out, h, w, threads, istl_decode_gray);
}

int istl_decode_batch_u8(const char** paths, int n, uint8_t* out, int h,
                         int w, int threads) {
  return decode_batch_impl(paths, n, out, h, w, threads,
                           istl_decode_gray_u8);
}
