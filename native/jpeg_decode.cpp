// Native JPEG decode + resize for the frame pipelines (cremad / enrico /
// vggsound / fakenews image modalities).
//
// The reference decodes JPEGs with PIL inside DataLoader worker processes;
// this module decodes with libjpeg directly on the prefetch thread:
//  * DCT-domain downscaling (jpeg scale_num/denom) picks the largest
//    power-of-two shrink that stays >= the target, so most pixels are never
//    materialized;
//  * bilinear resize to the exact target;
//  * float32 [0, 1] RGB output (HWC), ready for normalization.
//
// Build: `make -C native` (links -ljpeg).

#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// PIL-compatible triangle ("BILINEAR") resampling of a region
// [rx0, ry0)x(rx1, ry1) of a uint8 HWC(3) image -> float32 HWC(3) in
// [0, 1].  PIL's BILINEAR is an ANTIALIASED triangle filter whose support
// scales with the downscale factor (Pillow Resample.c precompute_coeffs)
// — naive 2x2 bilinear sampling diverges badly on downscales, and
// torchvision transforms (the reference's pipelines) go through PIL.
// Separable: horizontal pass then vertical, float accumulation.
struct Coeffs {
  std::vector<int> xmin, xlen;
  std::vector<float> w;  // flattened, stride kmax
  int kmax = 0;
};

Coeffs precompute_coeffs(int in0, int in1, int out, int in_cap) {
  Coeffs c;
  double scale = (double)(in1 - in0) / out;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * filterscale;  // triangle filter support = 1
  c.kmax = (int)ceil(support) * 2 + 1;
  c.xmin.resize(out);
  c.xlen.resize(out);
  c.w.assign((size_t)out * c.kmax, 0.0f);
  for (int xx = 0; xx < out; ++xx) {
    double center = in0 + (xx + 0.5) * scale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_cap) xmax = in_cap;
    xmax -= xmin;
    double total = 0.0;
    std::vector<double> ww(xmax);
    for (int k = 0; k < xmax; ++k) {
      double t = (xmin + k - center + 0.5) / filterscale;
      double v = t < 0 ? 1.0 + t : 1.0 - t;  // triangle
      if (v < 0) v = 0;
      ww[k] = v;
      total += v;
    }
    if (total == 0.0) {
      ww.assign(xmax, 1.0);
      total = xmax;
    }
    c.xmin[xx] = xmin;
    c.xlen[xx] = xmax;
    for (int k = 0; k < xmax; ++k) {
      c.w[(size_t)xx * c.kmax + k] = (float)(ww[k] / total);
    }
  }
  return c;
}

void resize_bilinear_region(const uint8_t* src, int sh, int sw, int ry0,
                            int rx0, int ry1, int rx1, int th, int tw,
                            float* dst) {
  Coeffs cx = precompute_coeffs(rx0, rx1, tw, sw);
  Coeffs cy = precompute_coeffs(ry0, ry1, th, sh);
  // horizontal pass over the needed row range
  int ymin = cy.xmin[0];
  int ymax = cy.xmin[th - 1] + cy.xlen[th - 1];
  if (ymax > sh) ymax = sh;
  int rows = ymax - ymin;
  std::vector<float> tmp((size_t)rows * tw * 3);
  for (int y = 0; y < rows; ++y) {
    const uint8_t* srow = src + (size_t)(ymin + y) * sw * 3;
    float* trow = &tmp[(size_t)y * tw * 3];
    for (int x = 0; x < tw; ++x) {
      const float* w = &cx.w[(size_t)x * cx.kmax];
      int x0 = cx.xmin[x], n = cx.xlen[x];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int k = 0; k < n; ++k) {
        const uint8_t* p = srow + (size_t)(x0 + k) * 3;
        acc0 += w[k] * p[0];
        acc1 += w[k] * p[1];
        acc2 += w[k] * p[2];
      }
      trow[x * 3 + 0] = acc0;
      trow[x * 3 + 1] = acc1;
      trow[x * 3 + 2] = acc2;
    }
  }
  // vertical pass
  for (int y = 0; y < th; ++y) {
    const float* w = &cy.w[(size_t)y * cy.kmax];
    int y0 = cy.xmin[y] - ymin, n = cy.xlen[y];
    for (int x = 0; x < tw * 3; ++x) {
      float acc = 0;
      for (int k = 0; k < n; ++k) {
        acc += w[k] * tmp[(size_t)(y0 + k) * tw * 3 + x];
      }
      dst[(size_t)y * tw * 3 + x] = acc / 255.0f;
    }
  }
}

void resize_bilinear(const uint8_t* src, int sh, int sw, int th, int tw,
                     float* dst) {
  resize_bilinear_region(src, sh, sw, 0, 0, sh, sw, th, tw, dst);
}

// Shared decode core: full-image decode to RGB with an optional DCT-domain
// shrink chosen so REGION (rw x rh in original coords) stays >= target.
int decode_rgb(const uint8_t* data, int64_t len, int region_w, int region_h,
               int out_w, int out_h, std::vector<uint8_t>* pixels,
               int* sh_out, int* sw_out, int* denom_out) {
  std::vector<uint8_t> row;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  if (region_w <= 0) region_w = cinfo.image_width;
  if (region_h <= 0) region_h = cinfo.image_height;
  int denom = 1;
  while (denom < 8 && region_w / (denom * 2) >= out_w &&
         region_h / (denom * 2) >= out_h) {
    denom *= 2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);

  const int sw = cinfo.output_width;
  const int sh = cinfo.output_height;
  const int comps = cinfo.output_components;  // 3 after JCS_RGB
  pixels->resize((size_t)sw * sh * 3);
  row.resize((size_t)sw * comps);
  JSAMPROW rowptr = row.data();
  for (int y = 0; y < sh; ++y) {
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    if (comps == 3) {
      std::memcpy(&(*pixels)[(size_t)y * sw * 3], row.data(),
                  (size_t)sw * 3);
    } else {  // grayscale fallback
      for (int x = 0; x < sw; ++x) {
        uint8_t v = row[x * comps];
        (*pixels)[((size_t)y * sw + x) * 3 + 0] = v;
        (*pixels)[((size_t)y * sw + x) * 3 + 1] = v;
        (*pixels)[((size_t)y * sw + x) * 3 + 2] = v;
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *sh_out = sh;
  *sw_out = sw;
  *denom_out = denom;
  return 0;
}

}  // namespace

extern "C" {

// Header-only dimension probe. Returns 0 on success.
int jpeg_dims(const uint8_t* data, int64_t len, int32_t* h, int32_t* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *h = (int32_t)cinfo.image_height;
  *w = (int32_t)cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode one JPEG from memory, resize to (out_h, out_w), write float32 RGB
// [0,1] HWC into out (out_h*out_w*3 floats).  Returns 0 on success.
int decode_jpeg_resize(const uint8_t* data, int64_t len, int32_t out_h,
                       int32_t out_w, float* out) {
  std::vector<uint8_t> pixels;
  int sh = 0, sw = 0, denom = 1;
  int rc = decode_rgb(data, len, 0, 0, out_w, out_h, &pixels, &sh, &sw,
                      &denom);
  if (rc != 0) return rc;
  resize_bilinear(pixels.data(), sh, sw, out_h, out_w, out);
  return 0;
}

// Decode, crop [left, top, right, bottom) (ORIGINAL pixel coords), and
// bilinear-resize the crop to (out_h, out_w) — the RandomResizedCrop
// decode path (torchvision's crop-box resize, cremad/get_data.py:95).
// DCT-domain shrink is chosen against the CROP size; box coords scale by
// the shrink.  Returns 0 on success.
int decode_jpeg_crop_resize(const uint8_t* data, int64_t len, int32_t left,
                            int32_t top, int32_t right, int32_t bottom,
                            int32_t out_h, int32_t out_w, float* out) {
  if (right <= left || bottom <= top) return 3;
  std::vector<uint8_t> pixels;
  int sh = 0, sw = 0, denom = 1;
  int rc = decode_rgb(data, len, right - left, bottom - top, out_w, out_h,
                      &pixels, &sh, &sw, &denom);
  if (rc != 0) return rc;
  // scale the box into the decoded (possibly DCT-shrunk) frame
  float inv = 1.0f / denom;
  int ry0 = (int)(top * inv);
  int rx0 = (int)(left * inv);
  int ry1 = (int)(bottom * inv + 0.5f);
  int rx1 = (int)(right * inv + 0.5f);
  if (ry1 > sh) ry1 = sh;
  if (rx1 > sw) rx1 = sw;
  if (ry0 >= ry1) ry0 = ry1 - 1;
  if (rx0 >= rx1) rx0 = rx1 - 1;
  if (ry0 < 0) ry0 = 0;
  if (rx0 < 0) rx0 = 0;
  resize_bilinear_region(pixels.data(), sh, sw, ry0, rx0, ry1, rx1, out_h,
                         out_w, out);
  return 0;
}

}  // extern "C"
