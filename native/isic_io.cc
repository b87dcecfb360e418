// Native host-side input pipeline: JPEG/PNG decode + mask-centroid crop +
// staging resize, in one pass without Python overhead.
//
// The reference's input path is pure Python (cv2 per sample inside
// DermDataset.__getitem__, dataset.py:21-56) and is the throughput bottleneck
// of its hot loop (SURVEY.md §3.1).  This worker is the framework's native
// runtime slot for IO: decode via libjpeg/libpng, the reference's exact crop
// math (centroid of mask>0, min(H,W) square, edge clamping), nearest mask
// resize on geometry mismatch, bilinear (half-pixel, cv2.INTER_LINEAR
// convention) staging resize, and a pthread fan-out for multi-core hosts.
//
// C ABI (ctypes-friendly):
//   isic_decode_crop(image_path, mask_path, staging_h, staging_w,
//                    out_image[h*w*3], out_mask[h*w])         -> 0 | -errno
//   isic_decode_crop_batch(paths..., n, ..., n_threads)       -> 0 | -count
//
// Build: g++ -O2 -shared -fPIC -o libisic_io.so isic_io.cc -ljpeg -lpng -lpthread

#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <pthread.h>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

// -------- decoders ---------------------------------------------------------

bool decode_jpeg_rgb(const char* path, std::vector<uint8_t>* out, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
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
  out->resize(size_t(*h) * *w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool decode_png_gray(const char* path, std::vector<uint8_t>* out, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);
  // normalize anything to 8-bit gray
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (depth == 16) png_set_strip_16(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  if (depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  png_read_update_info(png, info);
  out->resize(size_t(*h) * *w);
  std::vector<png_bytep> rows(*h);
  for (int r = 0; r < *h; ++r) rows[r] = out->data() + size_t(r) * *w;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

// -------- geometry ---------------------------------------------------------

void resize_nearest_gray(const std::vector<uint8_t>& src, int sh, int sw,
                         uint8_t* dst, int dh, int dw) {
  for (int y = 0; y < dh; ++y) {
    // cv2 INTER_NEAREST source index convention: floor(y * sh / dh)
    int sy = std::min(int(float(y) * sh / dh), sh - 1);
    for (int x = 0; x < dw; ++x) {
      int sx = std::min(int(float(x) * sw / dw), sw - 1);
      dst[size_t(y) * dw + x] = src[size_t(sy) * sw + sx];
    }
  }
}

// bilinear with half-pixel centers (cv2.INTER_LINEAR convention), channels=C
template <int C>
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  const float sy_ratio = float(sh) / dh;
  const float sx_ratio = float(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy_ratio - 0.5f;
    int y0 = int(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(std::max(y0 + 1, 0), sh - 1);
    y0 = std::min(std::max(y0, 0), sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx_ratio - 0.5f;
      int x0 = int(std::floor(fx));
      float wx = fx - x0;
      int x1 = std::min(std::max(x0 + 1, 0), sw - 1);
      x0 = std::min(std::max(x0, 0), sw - 1);
      for (int c = 0; c < C; ++c) {
        float v00 = src[(size_t(y0) * sw + x0) * C + c];
        float v01 = src[(size_t(y0) * sw + x1) * C + c];
        float v10 = src[(size_t(y1) * sw + x0) * C + c];
        float v11 = src[(size_t(y1) * sw + x1) * C + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(size_t(y) * dw + x) * C + c] = uint8_t(v + 0.5f);
      }
    }
  }
}

}  // namespace

namespace {

// Shared decode: image + (resized) mask; do_crop applies the reference's
// mask-centroid min(H,W) square crop, otherwise the full frame is staged
// (the radiomics path operates on the uncropped image,
// RadiomicExtractor.py:29-35).
int decode_common(const char* image_path, const char* mask_path,
                  int staging_h, int staging_w, uint8_t* out_image,
                  uint8_t* out_mask, int do_crop) {
  if (!out_image || !out_mask) return -2;
  std::vector<uint8_t> img;
  int h = 0, w = 0;
  if (!decode_jpeg_rgb(image_path, &img, &h, &w)) return -1;

  std::vector<uint8_t> mask;
  int mh = 0, mw = 0;
  bool has_mask = mask_path && mask_path[0] &&
                  strcmp(mask_path, "no_mask") != 0 &&
                  decode_png_gray(mask_path, &mask, &mh, &mw);
  if (!has_mask) {
    mask.assign(size_t(h) * w, 0);
    mh = h;
    mw = w;
  } else if (mh != h || mw != w) {  // reference: nearest resize to image dims
    std::vector<uint8_t> resized(size_t(h) * w);
    resize_nearest_gray(mask, mh, mw, resized.data(), h, w);
    mask.swap(resized);
    mh = h;
    mw = w;
  }

  if (!do_crop) {
    if (h == staging_h && w == staging_w) {
      memcpy(out_image, img.data(), img.size());
      memcpy(out_mask, mask.data(), mask.size());
    } else {
      resize_bilinear<3>(img.data(), h, w, out_image, staging_h, staging_w);
      resize_nearest_gray(mask, h, w, out_mask, staging_h, staging_w);
    }
    return 0;
  }

  // centroid of mask>0; image center when empty (dataset.py:64-70)
  int64_t sum_x = 0, sum_y = 0, count = 0;
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      if (mask[size_t(y) * w + x] > 0) {
        sum_x += x;
        sum_y += y;
        ++count;
      }
  int cx = count ? int(double(sum_x) / count) : w / 2;
  int cy = count ? int(double(sum_y) / count) : h / 2;

  const int crop = h < w ? h : w;  // min(H, W) override (dataset.py:93)
  int half = crop / 2;
  int x1 = cx - half;
  if (x1 < 0) x1 = 0;
  int y1 = cy - half;
  if (y1 < 0) y1 = 0;
  if (x1 > w - crop) x1 = w - crop;
  if (y1 > h - crop) y1 = h - crop;

  std::vector<uint8_t> crop_img(size_t(crop) * crop * 3);
  std::vector<uint8_t> crop_mask(size_t(crop) * crop);
  for (int y = 0; y < crop; ++y) {
    memcpy(crop_img.data() + size_t(y) * crop * 3,
           img.data() + (size_t(y1 + y) * w + x1) * 3, size_t(crop) * 3);
    memcpy(crop_mask.data() + size_t(y) * crop,
           mask.data() + size_t(y1 + y) * w + x1, crop);
  }

  if (crop == staging_h && crop == staging_w) {
    memcpy(out_image, crop_img.data(), crop_img.size());
    memcpy(out_mask, crop_mask.data(), crop_mask.size());
  } else {
    resize_bilinear<3>(crop_img.data(), crop, crop, out_image, staging_h,
                       staging_w);
    resize_nearest_gray(crop_mask, crop, crop, out_mask, staging_h, staging_w);
  }
  return 0;
}

struct BatchJob {
  const char** image_paths;
  const char** mask_paths;
  int n, staging_h, staging_w;
  uint8_t* out_images;
  uint8_t* out_masks;
  int begin, step;
  int do_crop;
  int failures;
};

void* batch_worker(void* arg) {
  BatchJob* job = static_cast<BatchJob*>(arg);
  size_t img_stride = size_t(job->staging_h) * job->staging_w * 3;
  size_t mask_stride = size_t(job->staging_h) * job->staging_w;
  for (int i = job->begin; i < job->n; i += job->step) {
    int rc = decode_common(job->image_paths[i],
                           job->mask_paths ? job->mask_paths[i] : nullptr,
                           job->staging_h, job->staging_w,
                           job->out_images + size_t(i) * img_stride,
                           job->out_masks + size_t(i) * mask_stride,
                           job->do_crop);
    if (rc != 0) ++job->failures;
  }
  return nullptr;
}

int batch_common(const char** image_paths, const char** mask_paths, int n,
                 int staging_h, int staging_w, uint8_t* out_images,
                 uint8_t* out_masks, int n_threads, int do_crop) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<BatchJob> jobs(n_threads);
  std::vector<pthread_t> threads(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    jobs[t] = {image_paths, mask_paths, n, staging_h, staging_w,
               out_images, out_masks, t, n_threads, do_crop, 0};
    pthread_create(&threads[t], nullptr, batch_worker, &jobs[t]);
  }
  int failures = 0;
  for (int t = 0; t < n_threads; ++t) {
    pthread_join(threads[t], nullptr);
    failures += jobs[t].failures;
  }
  return failures == 0 ? 0 : -failures;
}

}  // namespace

extern "C" {

// Returns 0 on success; -1 image decode failed; -2 output args invalid.
int isic_decode_crop(const char* image_path, const char* mask_path,
                     int staging_h, int staging_w, uint8_t* out_image,
                     uint8_t* out_mask) {
  return decode_common(image_path, mask_path, staging_h, staging_w, out_image,
                       out_mask, /*do_crop=*/1);
}

// Full-frame variant (no centroid crop) for the radiomics path.
int isic_decode_full(const char* image_path, const char* mask_path,
                     int staging_h, int staging_w, uint8_t* out_image,
                     uint8_t* out_mask) {
  return decode_common(image_path, mask_path, staging_h, staging_w, out_image,
                       out_mask, /*do_crop=*/0);
}

// Returns 0 on success or -(number of failed samples).
int isic_decode_crop_batch(const char** image_paths, const char** mask_paths,
                           int n, int staging_h, int staging_w,
                           uint8_t* out_images, uint8_t* out_masks,
                           int n_threads) {
  return batch_common(image_paths, mask_paths, n, staging_h, staging_w,
                      out_images, out_masks, n_threads, /*do_crop=*/1);
}

int isic_decode_full_batch(const char** image_paths, const char** mask_paths,
                           int n, int staging_h, int staging_w,
                           uint8_t* out_images, uint8_t* out_masks,
                           int n_threads) {
  return batch_common(image_paths, mask_paths, n, staging_h, staging_w,
                      out_images, out_masks, n_threads, /*do_crop=*/0);
}

}  // extern "C"
