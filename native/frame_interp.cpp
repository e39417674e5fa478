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
    // 15-bit fixed point: f in [0,1] → w in [0, 32768]
    const int32_t w = static_cast<int32_t>(fracts[k] * 32768.0f + 0.5f);
    const int32_t wi = 32768 - w;
    uint8_t* o = out + k * size;
    for (int64_t i = 0; i < size; ++i) {
      const int32_t va = a[i];
      const int32_t vb = b[i];
      o[i] = static_cast<uint8_t>((va * wi + vb * w + 16384) >> 15);
    }
  }
}

}  // extern "C"
