// JPEG coefficient-space frame interpolation.
//
// The movie fill-up's in-between frames are linear blends of two keyframes
// (reference utils.py:167-176). The DCT is linear, so the quantized DCT
// coefficients of lerp(a, b, t) equal round(lerp(qa, qb, t)) when both
// keyframe JPEGs share one quant table — which they do, because this
// framework encodes the keyframes itself. Encoding an in-between frame
// therefore needs NO color conversion, NO subsampling and NO forward DCT:
// just an int16 lerp over the coefficient planes plus the Huffman pass
// (libjpeg jpeg_write_coefficients, the jpegtran fast path). Measured ~2x
// faster per frame than full cv2.imencode on the 1-core bench host, with
// the output being the same-quality JPEG of the blend of the *decoded*
// keyframes (PSNR vs the pixel path is bounded by keyframe quantization
// noise; asserted >40 dB in tests/test_jpeg_coef_lerp.py).
//
// Build: make -C native   (g++ -O3 -shared -fPIC -ljpeg)
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>

// the flat copies below memcpy JCOEF rows into int16_t storage and index
// them as int16_t; libjpeg only guarantees JCOEF is *at least* 16 bits
static_assert(sizeof(JCOEF) == sizeof(int16_t),
              "JCOEF must be 16-bit for the flat coefficient copies");

namespace {

struct ErrMgr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void error_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<ErrMgr*>(cinfo->err)->jb, 1);
}

void emit_nothing(j_common_ptr, int) {}

// One decoded keyframe: the decompress object is kept alive for the life
// of the pair (its virtual coefficient arrays back jpeg_write_coefficients)
// plus a pristine flat copy of every coefficient for re-lerping.
struct Source {
  jpeg_decompress_struct dinfo{};
  ErrMgr err{};
  jvirt_barray_ptr* coef = nullptr;
  bool alive = false;
  // flat pristine copies, per component: [height_in_blocks][width_in_blocks][64]
  std::vector<std::vector<int16_t>> flat;

  bool open(const uint8_t* jpg, size_t n) {
    dinfo.err = jpeg_std_error(&err.mgr);
    err.mgr.error_exit = error_exit;
    err.mgr.emit_message = emit_nothing;
    if (setjmp(err.jb)) {
      jpeg_destroy_decompress(&dinfo);
      alive = false;
      return false;
    }
    jpeg_create_decompress(&dinfo);
    alive = true;
    jpeg_mem_src(&dinfo, const_cast<unsigned char*>(jpg), n);
    if (jpeg_read_header(&dinfo, TRUE) != JPEG_HEADER_OK) return false;
    coef = jpeg_read_coefficients(&dinfo);
    if (!coef) return false;
    flat.resize(dinfo.num_components);
    for (int c = 0; c < dinfo.num_components; ++c) {
      const jpeg_component_info* ci = dinfo.comp_info + c;
      const JDIMENSION wb = ci->width_in_blocks, hb = ci->height_in_blocks;
      flat[c].resize(static_cast<size_t>(wb) * hb * DCTSIZE2);
      for (JDIMENSION r = 0; r < hb; ++r) {
        JBLOCKARRAY rows = (*dinfo.mem->access_virt_barray)(
            reinterpret_cast<j_common_ptr>(&dinfo), coef[c], r, 1, FALSE);
        std::memcpy(flat[c].data() + static_cast<size_t>(r) * wb * DCTSIZE2,
                    rows[0], sizeof(JCOEF) * wb * DCTSIZE2);
      }
    }
    return true;
  }

  ~Source() {
    if (alive) {
      if (!setjmp(err.jb)) jpeg_destroy_decompress(&dinfo);
      alive = false;
    }
  }
};

}  // namespace

struct JLPair {
  Source a, b;
};

extern "C" {

// Opens a keyframe pair. Both JPEGs must share geometry, sampling and quant
// tables (true for frames encoded by this framework's writer). Returns
// nullptr on any mismatch or parse failure — callers fall back to the
// pixel-lerp path.
JLPair* jl_pair_open(const uint8_t* jpg_a, size_t na, const uint8_t* jpg_b, size_t nb) {
  auto* p = new JLPair();
  if (!p->a.open(jpg_a, na) || !p->b.open(jpg_b, nb)) {
    delete p;
    return nullptr;
  }
  const jpeg_decompress_struct &da = p->a.dinfo, &db = p->b.dinfo;
  bool ok = da.num_components == db.num_components &&
            da.image_width == db.image_width && da.image_height == db.image_height &&
            da.jpeg_color_space == db.jpeg_color_space;
  for (int c = 0; ok && c < da.num_components; ++c) {
    const jpeg_component_info *ca = da.comp_info + c, *cb = db.comp_info + c;
    ok = ca->h_samp_factor == cb->h_samp_factor && ca->v_samp_factor == cb->v_samp_factor &&
         ca->width_in_blocks == cb->width_in_blocks &&
         ca->height_in_blocks == cb->height_in_blocks &&
         ca->quant_tbl_no == cb->quant_tbl_no;
    if (ok && ca->quant_table && cb->quant_table)
      ok = std::memcmp(ca->quant_table->quantval, cb->quant_table->quantval,
                       sizeof(ca->quant_table->quantval)) == 0;
  }
  if (!ok) {
    delete p;
    return nullptr;
  }
  return p;
}

// Encodes round((1-t)*a + t*b) in coefficient space into a malloc'd JPEG
// buffer (*out, *outn); free with jl_free. Returns 0 on success.
int jl_pair_lerp(JLPair* p, float t, uint8_t** out, size_t* outn) {
  *out = nullptr;
  *outn = 0;
  jpeg_decompress_struct& src = p->a.dinfo;
  // Overwrite A's (realized) virtual arrays with the lerped coefficients;
  // the pristine values live in the flat copies.
  if (setjmp(p->a.err.jb)) return 2;  // virt-array access failure
  const float w = t, wi = 1.0f - t;
  for (int c = 0; c < src.num_components; ++c) {
    const jpeg_component_info* ci = src.comp_info + c;
    const JDIMENSION wb = ci->width_in_blocks, hb = ci->height_in_blocks;
    const int16_t* fa = p->a.flat[c].data();
    const int16_t* fb = p->b.flat[c].data();
    for (JDIMENSION r = 0; r < hb; ++r) {
      JBLOCKARRAY rows = (*src.mem->access_virt_barray)(
          reinterpret_cast<j_common_ptr>(&src), p->a.coef[c], r, 1, TRUE);
      JCOEF* __restrict o = rows[0][0];
      const int16_t* __restrict ra = fa + static_cast<size_t>(r) * wb * DCTSIZE2;
      const int16_t* __restrict rb = fb + static_cast<size_t>(r) * wb * DCTSIZE2;
      const int64_t nn = static_cast<int64_t>(wb) * DCTSIZE2;
      for (int64_t i = 0; i < nn; ++i) {
        const float v = wi * ra[i] + w * rb[i];
        o[i] = static_cast<JCOEF>(v >= 0.0f ? v + 0.5f : v - 0.5f);
      }
    }
  }

  jpeg_compress_struct dst{};
  ErrMgr derr{};
  dst.err = jpeg_std_error(&derr.mgr);
  derr.mgr.error_exit = error_exit;
  derr.mgr.emit_message = emit_nothing;
  unsigned char* buf = nullptr;
  unsigned long bufn = 0;
  if (setjmp(derr.jb)) {
    jpeg_destroy_compress(&dst);
    if (buf) free(buf);
    return 3;
  }
  jpeg_create_compress(&dst);
  jpeg_mem_dest(&dst, &buf, &bufn);
  jpeg_copy_critical_parameters(&src, &dst);
  dst.optimize_coding = FALSE;
  jpeg_write_coefficients(&dst, p->a.coef);
  jpeg_finish_compress(&dst);
  jpeg_destroy_compress(&dst);
  *out = buf;
  *outn = bufn;
  return 0;
}

void jl_free(uint8_t* buf) { free(buf); }

void jl_pair_close(JLPair* p) { delete p; }

// Encodes a packed I420 frame (Y[h][w] ++ Cb[h/2][w/2] ++ Cr[h/2][w/2],
// JFIF full-range BT.601) straight into a baseline JPEG via libjpeg's
// raw-data mode — the color conversion and 4:2:0 subsampling already
// happened on the accelerator (holder.to_i420_device), so this skips the
// RGB→YCbCr convert + downsample passes entirely (and the keyframe
// device→host transfer is 1.5 B/px instead of 3). Output uses the default
// 2x2,1x1,1x1 sampling and jpeg_set_quality tables, i.e. the exact
// parameters of the pixel-path encoder — the coefficient-lerp pair check
// accepts mixed pairs. Requires width % 16 == 0 (chroma rows must fill
// whole DCT blocks; raw-data mode does not column-pad) and even height;
// rows are replicated to fill the final iMCU row. Returns 0 on success,
// 1 on unsupported geometry; buffer is malloc'd — free with jl_free.
int jl_encode_i420(const uint8_t* i420, int width, int height, int quality,
                   uint8_t** out, size_t* outn) {
  *out = nullptr;
  *outn = 0;
  if (width <= 0 || height <= 0 || width % 16 != 0 || height % 2 != 0) return 1;
  const uint8_t* y = i420;
  const uint8_t* cb = y + static_cast<size_t>(width) * height;
  const uint8_t* cr = cb + static_cast<size_t>(width / 2) * (height / 2);

  jpeg_compress_struct c{};
  ErrMgr err{};
  c.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = error_exit;
  err.mgr.emit_message = emit_nothing;
  unsigned char* buf = nullptr;
  unsigned long bufn = 0;
  if (setjmp(err.jb)) {
    jpeg_destroy_compress(&c);
    if (buf) free(buf);
    return 2;
  }
  jpeg_create_compress(&c);
  jpeg_mem_dest(&c, &buf, &bufn);
  c.image_width = static_cast<JDIMENSION>(width);
  c.image_height = static_cast<JDIMENSION>(height);
  c.input_components = 3;
  c.in_color_space = JCS_YCbCr;
  jpeg_set_defaults(&c);
  jpeg_set_quality(&c, quality, TRUE);
  c.raw_data_in = TRUE;
  c.comp_info[0].h_samp_factor = 2;
  c.comp_info[0].v_samp_factor = 2;
  c.comp_info[1].h_samp_factor = 1;
  c.comp_info[1].v_samp_factor = 1;
  c.comp_info[2].h_samp_factor = 1;
  c.comp_info[2].v_samp_factor = 1;
  c.optimize_coding = FALSE;
  jpeg_start_compress(&c, TRUE);
  const int ch = height / 2, cw = width / 2;
  JSAMPROW yr[16], cbr[8], crr[8];
  JSAMPARRAY planes[3] = {yr, cbr, crr};
  while (c.next_scanline < c.image_height) {
    const int base = static_cast<int>(c.next_scanline);
    for (int i = 0; i < 16; ++i) {
      int r = base + i;
      if (r >= height) r = height - 1;  // replicate-pad the last iMCU row
      yr[i] = const_cast<JSAMPROW>(y + static_cast<size_t>(r) * width);
    }
    for (int i = 0; i < 8; ++i) {
      int r = base / 2 + i;
      if (r >= ch) r = ch - 1;
      cbr[i] = const_cast<JSAMPROW>(cb + static_cast<size_t>(r) * cw);
      crr[i] = const_cast<JSAMPROW>(cr + static_cast<size_t>(r) * cw);
    }
    jpeg_write_raw_data(&c, planes, 16);
  }
  jpeg_finish_compress(&c);
  jpeg_destroy_compress(&c);
  *out = buf;
  *outn = bufn;
  return 0;
}

}  // extern "C"
