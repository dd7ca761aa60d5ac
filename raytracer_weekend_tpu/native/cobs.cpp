// Native COBS codec for the pixel-stream wire protocol
// (parallel/stream.py speaks the same format; this is the fast path for
// high-rate tile streaming — the reference's framing lives in the postcard
// crate's to_vec_cobs used at discovery_app/src/bin/raytracer.rs:66,104).

#include <cstdint>

extern "C" {

// Encode `n` bytes from src into dst (capacity >= n + n/254 + 2).
// Returns encoded length (no trailing delimiter).
int32_t rtw_cobs_encode(const uint8_t* src, int32_t n, uint8_t* dst) {
  int32_t out = 0;
  int32_t code_pos = out++;
  uint8_t code = 1;
  for (int32_t i = 0; i < n; ++i) {
    if (src[i] == 0) {
      dst[code_pos] = code;
      code_pos = out++;
      code = 1;
    } else {
      dst[out++] = src[i];
      if (++code == 0xFF) {
        dst[code_pos] = code;
        code_pos = out++;
        code = 1;
      }
    }
  }
  dst[code_pos] = code;
  return out;
}

// Decode `n` encoded bytes into dst (capacity >= n). Returns decoded
// length, or -1 on malformed input.
int32_t rtw_cobs_decode(const uint8_t* src, int32_t n, uint8_t* dst) {
  int32_t out = 0;
  int32_t pos = 0;
  while (pos < n) {
    uint8_t code = src[pos];
    if (code == 0 || pos + code > n) return -1;
    for (int32_t i = 1; i < code; ++i) dst[out++] = src[pos + i];
    pos += code;
    if (code != 0xFF && pos < n) dst[out++] = 0;
  }
  return out;
}

}  // extern "C"
