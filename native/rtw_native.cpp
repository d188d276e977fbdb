// Native runtime components for rtweekend-tpu.
//
// The reference's image path is native Zig (zigimg: PNG encode,
// reference build.zig:68-73, src/main.zig:379-405, plus the inline
// tone map at main.zig:395-400). This is its native equivalent on the
// new stack: a C shared library doing
//   - tone map + quantize (scale by 1/spp, gamma-2 sqrt, clamp
//     [0, 0.999], floor(256*c)) over the accumulation buffer, and
//   - PNG encoding (8-bit RGB, zlib deflate, Paeth-filtered rows),
// called from Python via ctypes (no pybind11 in this image). The
// Python layer falls back to Pillow/zlib when the .so is absent.
//
// Build: make native   (g++ -O3 -shared -fPIC -lz)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <zlib.h>

extern "C" {

// Tone map float accumulation sums [h*w*3] -> uint8 RGB, exact formula
// of reference src/main.zig:395-400.
void rtw_tonemap(const float* accum, uint8_t* out, int64_t n_px,
                 float inv_spp) {
  for (int64_t i = 0; i < n_px * 3; ++i) {
    float c = std::sqrt(accum[i] * inv_spp);
    c = c < 0.0f ? 0.0f : (c > 0.999f ? 0.999f : c);
    out[i] = static_cast<uint8_t>(256.0f * c);
  }
}

namespace {

void put_u32_be(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(uint8_t(x >> 24));
  v.push_back(uint8_t(x >> 16));
  v.push_back(uint8_t(x >> 8));
  v.push_back(uint8_t(x));
}

void put_chunk(std::vector<uint8_t>& v, const char tag[4],
               const uint8_t* data, size_t len) {
  put_u32_be(v, uint32_t(len));
  size_t start = v.size();
  v.insert(v.end(), tag, tag + 4);
  v.insert(v.end(), data, data + len);
  uint32_t crc = crc32(0L, v.data() + start, uInt(len + 4));
  put_u32_be(v, crc);
}

inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = std::abs(p - a), pb = std::abs(p - b), pc = std::abs(p - c);
  if (pa <= pb && pa <= pc) return uint8_t(a);
  if (pb <= pc) return uint8_t(b);
  return uint8_t(c);
}

}  // namespace

// Encode uint8 RGB [h, w, 3] to an in-memory PNG. Returns the number
// of bytes written to *out_buf (caller frees with rtw_free), or -1.
// Rows are Paeth-filtered before deflate — the filter choice zigimg
// also defaults to, and it compresses renders ~30% better than none.
int64_t rtw_png_encode(const uint8_t* rgb, int32_t w, int32_t h,
                       uint8_t** out_buf, int32_t compression) {
  const size_t stride = size_t(w) * 3;
  std::vector<uint8_t> raw(size_t(h) * (stride + 1));
  std::vector<uint8_t> prev(stride, 0);
  for (int32_t y = 0; y < h; ++y) {
    const uint8_t* row = rgb + size_t(y) * stride;
    uint8_t* out = raw.data() + size_t(y) * (stride + 1);
    out[0] = 4;  // Paeth filter
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= 3 ? row[x - 3] : 0;
      int b = prev[x];
      int c = x >= 3 ? prev[x - 3] : 0;
      out[1 + x] = uint8_t(row[x] - paeth(a, b, c));
    }
    std::memcpy(prev.data(), row, stride);
  }

  uLongf comp_bound = compressBound(uLong(raw.size()));
  std::vector<uint8_t> comp(comp_bound);
  if (compress2(comp.data(), &comp_bound, raw.data(), uLong(raw.size()),
                compression) != Z_OK) {
    return -1;
  }

  std::vector<uint8_t> png;
  png.reserve(comp_bound + 128);
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  png.insert(png.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = uint8_t(uint32_t(w) >> 24); ihdr[1] = uint8_t(uint32_t(w) >> 16);
  ihdr[2] = uint8_t(uint32_t(w) >> 8);  ihdr[3] = uint8_t(w);
  ihdr[4] = uint8_t(uint32_t(h) >> 24); ihdr[5] = uint8_t(uint32_t(h) >> 16);
  ihdr[6] = uint8_t(uint32_t(h) >> 8);  ihdr[7] = uint8_t(h);
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type RGB
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  put_chunk(png, "IHDR", ihdr, 13);
  put_chunk(png, "IDAT", comp.data(), comp_bound);
  put_chunk(png, "IEND", nullptr, 0);

  uint8_t* buf = static_cast<uint8_t*>(std::malloc(png.size()));
  if (!buf) return -1;
  std::memcpy(buf, png.data(), png.size());
  *out_buf = buf;
  return int64_t(png.size());
}

void rtw_free(uint8_t* p) { std::free(p); }

// P3 PPM text encoder (BASELINE parity configs ask for PPM output).
// Returns bytes written (caller frees), or -1.
int64_t rtw_ppm_encode(const uint8_t* rgb, int32_t w, int32_t h,
                       uint8_t** out_buf) {
  std::vector<char> txt;
  txt.reserve(size_t(w) * h * 12 + 32);
  char head[64];
  int n = std::snprintf(head, sizeof head, "P3\n%d %d\n255\n", w, h);
  txt.insert(txt.end(), head, head + n);
  char line[16];
  for (int64_t i = 0; i < int64_t(w) * h; ++i) {
    const uint8_t* p = rgb + i * 3;
    n = std::snprintf(line, sizeof line, "%d %d %d\n", p[0], p[1], p[2]);
    txt.insert(txt.end(), line, line + n);
  }
  uint8_t* buf = static_cast<uint8_t*>(std::malloc(txt.size()));
  if (!buf) return -1;
  std::memcpy(buf, txt.data(), txt.size());
  *out_buf = buf;
  return int64_t(txt.size());
}

}  // extern "C"
