// Native JPEG decode for the host input pipeline (SURVEY.md §3.1 hot loop).
//
// The reference's DataLoader leans on OpenCV's C++ imdecode; this is the
// rebuild's native-IO equivalent: libjpeg(-turbo) decompression straight into
// a caller-provided row-strided buffer, so the common eval/train path decodes
// JPEG bytes DIRECTLY into the padded source canvas that ships to the device
// (rsgnet_tpu/data/dataset.py::load_sample) — no intermediate PIL buffer, no
// RGB-convert copy, no canvas paste. Python keeps all geometry logic and
// falls back to PIL for anything this decoder rejects.
//
// Parity: the system libjpeg.so.62 is libjpeg-turbo (same engine Pillow
// bundles); both use the default islow-compatible IDCT and fancy upsampling,
// so outputs are expected bit-identical to PIL's `convert("RGB")` — asserted
// by tests/test_native_jpeg.py rather than assumed.

#include <cstddef>
#include <cstdio>  // jpeglib.h needs size_t/FILE declared first

#include <jpeglib.h>

#include <csetjmp>
#include <cstring>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void err_exit(j_common_ptr cinfo) {
  // default handler calls exit(); longjmp back to the call site instead
  ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(e->jb, 1);
}

void emit_silent(j_common_ptr, int) {}

}  // namespace

extern "C" {

// Return codes shared by both entry points.
enum {
  JL_OK = 0,
  JL_ERR_DECODE = 1,    // corrupt stream / unsupported source colorspace
  JL_ERR_TOO_BIG = 2,   // image exceeds (max_h, max_w); *out_h/*out_w valid
};

// Parse image dimensions without decoding. Returns JL_OK or JL_ERR_DECODE.
int jpeg_header_dims(const unsigned char* data, unsigned long len,
                     int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  ErrMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = err_exit;
  err.pub.emit_message = emit_silent;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return JL_ERR_DECODE;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  *out_h = static_cast<int>(cinfo.image_height);
  *out_w = static_cast<int>(cinfo.image_width);
  jpeg_destroy_decompress(&cinfo);
  return JL_OK;
}

// Decode RGB rows into `out` with `stride` bytes per row. The caller
// guarantees `out` holds at least image_height rows of image_width*3 bytes
// (checked against max_h/max_w before any row is written). Grayscale and
// YCbCr sources convert to RGB in-decoder; CMYK/YCCK fail -> JL_ERR_DECODE
// and the caller falls back to PIL. *out_h/*out_w are set whenever the
// header parses, including on JL_ERR_TOO_BIG.
int jpeg_decode_rgb_into(const unsigned char* data, unsigned long len,
                         unsigned char* out, int stride, int max_h, int max_w,
                         int* out_h, int* out_w) {
  jpeg_decompress_struct cinfo;
  ErrMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = err_exit;
  err.pub.emit_message = emit_silent;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return JL_ERR_DECODE;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  const int h = static_cast<int>(cinfo.image_height);
  const int w = static_cast<int>(cinfo.image_width);
  *out_h = h;
  *out_w = w;
  if (h > max_h || w > max_w || h <= 0 || w <= 0) {
    jpeg_destroy_decompress(&cinfo);
    return JL_ERR_TOO_BIG;
  }
  cinfo.out_color_space = JCS_RGB;  // gray/YCbCr -> RGB; CMYK errors out
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_components) != 3) {
    jpeg_destroy_decompress(&cinfo);
    return JL_ERR_DECODE;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return JL_OK;
}

}  // extern "C"
