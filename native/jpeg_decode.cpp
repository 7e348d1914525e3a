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

// bilinear resize uint8 HWC(3) -> float32 HWC(3) in [0, 1]
void resize_bilinear(const uint8_t* src, int sh, int sw, int th, int tw,
                     float* dst) {
  const float scale_y = (float)sh / th;
  const float scale_x = (float)sw / tw;
  for (int y = 0; y < th; ++y) {
    float fy = (y + 0.5f) * scale_y - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = (int)fy;
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    for (int x = 0; x < tw; ++x) {
      float fx = (x + 0.5f) * scale_x - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = (int)fx;
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0 * sw + x0) * 3 + c];
        float v01 = src[(y0 * sw + x1) * 3 + c];
        float v10 = src[(y1 * sw + x0) * 3 + c];
        float v11 = src[(y1 * sw + x1) * 3 + c];
        float top = v00 + wx * (v01 - v00);
        float bot = v10 + wx * (v11 - v10);
        dst[(y * tw + x) * 3 + c] = (top + wy * (bot - top)) / 255.0f;
      }
    }
  }
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
  // The vectors are declared BEFORE setjmp so a libjpeg error longjmp never
  // crosses their construction — destructors run on the normal return after
  // setjmp fires (UB/leak otherwise).
  std::vector<uint8_t> pixels;
  std::vector<uint8_t> row;
  int sh = 0, sw = 0;

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
  // DCT-domain shrink: largest 1/2^k that keeps both dims >= target
  int denom = 1;
  while (denom < 8 &&
         (int)cinfo.image_width / (denom * 2) >= out_w &&
         (int)cinfo.image_height / (denom * 2) >= out_h) {
    denom *= 2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);

  sw = cinfo.output_width;
  sh = cinfo.output_height;
  const int comps = cinfo.output_components;  // 3 after JCS_RGB
  pixels.resize((size_t)sw * sh * 3);
  row.resize((size_t)sw * comps);
  JSAMPROW rowptr = row.data();
  for (int y = 0; y < sh; ++y) {
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
    if (comps == 3) {
      std::memcpy(&pixels[(size_t)y * sw * 3], row.data(), (size_t)sw * 3);
    } else {  // grayscale fallback
      for (int x = 0; x < sw; ++x) {
        uint8_t v = row[x * comps];
        pixels[((size_t)y * sw + x) * 3 + 0] = v;
        pixels[((size_t)y * sw + x) * 3 + 1] = v;
        pixels[((size_t)y * sw + x) * 3 + 2] = v;
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  resize_bilinear(pixels.data(), sh, sw, out_h, out_w, out);
  return 0;
}

}  // extern "C"
