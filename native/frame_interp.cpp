// Native frame interpolation for movie fill-up.
//
// The reference's host-side hot loop (reference utils.py:167-176) lerps
// uint8 frames through float64 numpy temporaries — three full-frame
// allocations per output frame. This kernel emits all interpolated frames
// of a gap in one pass over fixed-point int16 arithmetic (no float
// conversion, no temporaries), which the movie writer streams straight to
// the encoder.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)
#include <cstdint>
#include <cstddef>

extern "C" {

// out[k] = round((1-f[k])*a + f[k]*b), clamp-free by construction
// (convex combination of uint8 stays in range).
// a, b: [size] uint8; fracts: [n]; out: [n, size] uint8.
void lerp_frames_multi_u8(const uint8_t* __restrict a,
                          const uint8_t* __restrict b,
                          uint8_t* __restrict out,
                          int64_t size,
                          const float* __restrict fracts,
                          int64_t n) {
  for (int64_t k = 0; k < n; ++k) {
    // 8-bit fixed point (w in [0,256]) keeps the product in uint16 so the
    // loop vectorizes to 16-lane pmullw; max rounding error is 1 LSB.
    const uint16_t w = static_cast<uint16_t>(fracts[k] * 256.0f + 0.5f);
    const uint16_t wi = 256 - w;
    uint8_t* __restrict o = out + k * size;
    for (int64_t i = 0; i < size; ++i) {
      const uint16_t va = a[i];
      const uint16_t vb = b[i];
      o[i] = static_cast<uint8_t>((va * wi + vb * w + 128) >> 8);
    }
  }
}

}  // extern "C"
