// MVT native codec: the byte-level hot paths of the storage layer.
//
// The reference implements its whole storage layer natively (Rust); here the
// native core covers what actually dominates build/validate wall-clock
// (SURVEY.md §2 "native components" mapping):
//
//   * crc32:        zlib-polynomial CRC-32, slice-by-8 (block checksums —
//                   reference uses crc32fast, src/builder.rs:251)
//   * pack_rows:    tile-padding packer: [n, dim] rows -> zero-padded
//                   [padded_rows, padded_dim] block (replaces the
//                   reference's per-element LE encode loop,
//                   src/builder.rs:176-191, with straight row memcpy —
//                   the layout IS the wire format)
//   * sq_norms:     per-row dequantized squared-L2 norms (f32/f16/bf16/
//                   i8/u8) for the L2/cosine kernel epilogues
//   * pack_block:   fused single pass: pack + norms + CRC over the packed
//                   bytes, one memory traversal instead of three
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).
// Build: g++ -O3 -shared -fPIC codec.cpp -o libmvtcodec.so

#include <zlib.h>

#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- crc32 ---

// zlib's crc32 (SIMD-accelerated where the system zlib supports it) keeps
// the checksum byte-compatible with the Python fallback's zlib.crc32.
uint32_t mvt_crc32(uint32_t crc, const uint8_t* buf, size_t len) {
    return (uint32_t)crc32_z((uLong)crc, buf, (z_size_t)len);
}

// ----------------------------------------------------------- pack_rows ---

// Pack [n, dim]*esz tightly-packed rows into a zeroed
// [padded_rows, padded_dim]*esz block.
void mvt_pack_rows(const uint8_t* src, uint8_t* dst, size_t n, size_t dim,
                   size_t esz, size_t padded_rows, size_t padded_dim) {
    const size_t row_in = dim * esz;
    const size_t row_out = padded_dim * esz;
    if (row_in == row_out) {
        std::memcpy(dst, src, n * row_in);
        std::memset(dst + n * row_in, 0, (padded_rows - n) * row_out);
        return;
    }
    for (size_t i = 0; i < n; i++) {
        std::memcpy(dst + i * row_out, src + i * row_in, row_in);
        std::memset(dst + i * row_out + row_in, 0, row_out - row_in);
    }
    std::memset(dst + n * row_out, 0, (padded_rows - n) * row_out);
}

// ------------------------------------------------------------ sq_norms ---

// dtype codes (must match format.constants.DataType)
enum { DT_F32 = 0, DT_F16 = 1, DT_I8 = 2, DT_U8 = 3, DT_BF16 = 7 };

static inline float half_to_float(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal: normalize
            int shift = 0;
            while (!(man & 0x400)) { man <<= 1; shift++; }
            man &= 0x3FF;
            bits = sign | ((127 - 15 - shift) << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

static inline float bf16_to_float(uint16_t h) {
    uint32_t bits = (uint32_t)h << 16;
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

// Squared L2 norms of [rows, dim] elements strided by row_stride_bytes,
// in dequantized value space: v = (raw - zero_point) * scale.
void mvt_sq_norms(const uint8_t* src, size_t rows, size_t dim,
                  size_t row_stride, int dtype, float scale, float zp,
                  float* out) {
    for (size_t i = 0; i < rows; i++) {
        const uint8_t* row = src + i * row_stride;
        double acc = 0.0;
        switch (dtype) {
            case DT_F32: {
                const float* p = (const float*)row;
                for (size_t j = 0; j < dim; j++) {
                    double v = ((double)p[j] - zp) * scale;
                    acc += v * v;
                }
                break;
            }
            case DT_F16: {
                const uint16_t* p = (const uint16_t*)row;
                for (size_t j = 0; j < dim; j++) {
                    double v = ((double)half_to_float(p[j]) - zp) * scale;
                    acc += v * v;
                }
                break;
            }
            case DT_BF16: {
                const uint16_t* p = (const uint16_t*)row;
                for (size_t j = 0; j < dim; j++) {
                    double v = ((double)bf16_to_float(p[j]) - zp) * scale;
                    acc += v * v;
                }
                break;
            }
            case DT_I8: {
                const int8_t* p = (const int8_t*)row;
                for (size_t j = 0; j < dim; j++) {
                    double v = ((double)p[j] - zp) * scale;
                    acc += v * v;
                }
                break;
            }
            case DT_U8: {
                const uint8_t* p = row;
                for (size_t j = 0; j < dim; j++) {
                    double v = ((double)p[j] - zp) * scale;
                    acc += v * v;
                }
                break;
            }
        }
        out[i] = (float)acc;
    }
}

// ---------------------------------------------------------- pack_block ---

// Fused builder hot path: pack rows into dst, compute dequantized norms and
// the block CRC in a single cache-hot traversal — each row is copied,
// normed and checksummed while it is still in L1/L2, instead of three full
// sweeps over a multi-GB block.
uint32_t mvt_pack_block(const uint8_t* src, uint8_t* dst, size_t n,
                        size_t dim, size_t esz, size_t padded_rows,
                        size_t padded_dim, int dtype, float scale, float zp,
                        float* norms_out) {
    const size_t row_in = dim * esz;
    const size_t row_out = padded_dim * esz;
    uint32_t crc = 0;
    for (size_t i = 0; i < n; i++) {
        uint8_t* d = dst + i * row_out;
        std::memcpy(d, src + i * row_in, row_in);
        if (row_out > row_in) std::memset(d + row_in, 0, row_out - row_in);
        mvt_sq_norms(d, 1, dim, row_out, dtype, scale, zp, norms_out + i);
        crc = mvt_crc32(crc, d, row_out);
    }
    const size_t tail = (padded_rows - n) * row_out;
    if (tail) {
        std::memset(dst + n * row_out, 0, tail);
        crc = mvt_crc32(crc, dst + n * row_out, tail);
    }
    for (size_t i = n; i < padded_rows; i++) norms_out[i] = 0.0f;
    return crc;
}

int mvt_abi_version() { return 1; }

}  // extern "C"
