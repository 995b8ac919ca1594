// Native frame codec for the streaming server.
//
// Replaces the reference's CPU JPEG pool built on PIL
// (release_server.py:970-976): float->uint8 conversion + libjpeg(-turbo)
// encode in one GIL-free C call, so the 24-thread encode pool actually runs
// in parallel under CPython.
//
// Build: g++ -O3 -shared -fPIC frame_codec.cpp -o libframecodec.so -ljpeg

#include <cstdint>
#include <cstdio>  // jpeglib.h needs FILE
#include <cstdlib>
#include <cstring>
#include <jpeglib.h>

extern "C" {

// Encode an interleaved RGB8 image to JPEG. Returns encoded size, or -1 if
// the output buffer is too small / encode failed.
long jpeg_encode_rgb(const unsigned char* rgb, int height, int width,
                     int quality, unsigned char* out, long out_cap) {
  jpeg_compress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);

  unsigned char* mem = nullptr;
  unsigned long mem_size = 0;
  jpeg_mem_dest(&cinfo, &mem, &mem_size);

  cinfo.image_width = width;
  cinfo.image_height = height;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);

  JSAMPROW row;
  while (cinfo.next_scanline < cinfo.image_height) {
    row = const_cast<unsigned char*>(rgb) +
          static_cast<size_t>(cinfo.next_scanline) * width * 3;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);

  long n = static_cast<long>(mem_size);
  if (n > out_cap) {
    free(mem);
    return -1;
  }
  memcpy(out, mem, n);
  free(mem);
  return n;
}

// Convert a planar float frame [3, H, W] (value = v*scale + offset mapped to
// [0,255]) to interleaved RGB8 and JPEG-encode it.
long jpeg_encode_planar_float(const float* data, int height, int width,
                              int quality, float scale, float offset,
                              unsigned char* out, long out_cap) {
  const size_t plane = static_cast<size_t>(height) * width;
  unsigned char* rgb =
      static_cast<unsigned char*>(malloc(plane * 3));
  if (!rgb) return -1;
  const float* r = data;
  const float* g = data + plane;
  const float* b = data + 2 * plane;
  for (size_t i = 0; i < plane; ++i) {
    float rv = r[i] * scale + offset;
    float gv = g[i] * scale + offset;
    float bv = b[i] * scale + offset;
    rv = rv < 0.f ? 0.f : (rv > 1.f ? 1.f : rv);
    gv = gv < 0.f ? 0.f : (gv > 1.f ? 1.f : gv);
    bv = bv < 0.f ? 0.f : (bv > 1.f ? 1.f : bv);
    rgb[i * 3 + 0] = static_cast<unsigned char>(rv * 255.0f + 0.5f);
    rgb[i * 3 + 1] = static_cast<unsigned char>(gv * 255.0f + 0.5f);
    rgb[i * 3 + 2] = static_cast<unsigned char>(bv * 255.0f + 0.5f);
  }
  long n = jpeg_encode_rgb(rgb, height, width, quality, out, out_cap);
  free(rgb);
  return n;
}

}  // extern "C"
