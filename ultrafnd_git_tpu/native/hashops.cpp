// Native host ops: FNV-1a hashing + batched hash embeddings.
//
// The feature-cache build (reference hot loop #1, SURVEY §3.1) spends its
// host time tokenizing and hashing every string in the corpus. The Python
// path (ops/hashing.py) memoizes per token; this C++ path does the whole
// batch in one pass with zero Python-object traffic: the caller packs all
// texts into one UTF-8 buffer + offsets, we tokenize/hash/scatter/normalize
// into the caller's (N, dim) float32 output.
//
// Semantics contract (tested against ops/hashing.py bit-for-bit):
//   * tokens split on the same codepoints as Python str.split()
//     (Unicode whitespace), not just ASCII space;
//   * 64-bit FNV-1a over the token's UTF-8 bytes, bucket = h % dim;
//   * +1 count per token (first max_tokens tokens when >= 0);
//   * row L2 normalization with +1e-9 eps, zero rows left zero.
//
// Built with g++ via ultrafnd_git_tpu/native/__init__.py (ctypes binding,
// no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

static const uint64_t FNV_OFFSET = 0xCBF29CE484222325ULL;
static const uint64_t FNV_PRIME = 0x100000001B3ULL;

// `basis` is the FNV starting state: FNV_OFFSET for the unsalted hash,
// or fnv1a(salt) for a salted draw — by FNV's prefix property,
// continuing from fnv1a(salt) equals hashing salt||token in one pass
// (ops/hashing.set_hash_salt).
uint64_t ufnd_fnv1a64_basis(const uint8_t* data, int64_t len,
                            uint64_t basis) {
    uint64_t h = basis;
    for (int64_t i = 0; i < len; ++i) {
        h ^= (uint64_t)data[i];
        h *= FNV_PRIME;
    }
    return h;
}

uint64_t ufnd_fnv1a64(const uint8_t* data, int64_t len) {
    return ufnd_fnv1a64_basis(data, len, FNV_OFFSET);
}

// Decode one UTF-8 codepoint at buf[i]; advances *i. Invalid bytes are
// treated as Latin-1 (never whitespace), matching "never split" behavior.
static inline uint32_t decode_utf8(const uint8_t* buf, int64_t end,
                                   int64_t* i) {
    uint8_t b0 = buf[*i];
    if (b0 < 0x80) { *i += 1; return b0; }
    if ((b0 >> 5) == 0x6 && *i + 1 < end) {
        uint32_t cp = ((b0 & 0x1F) << 6) | (buf[*i + 1] & 0x3F);
        *i += 2; return cp;
    }
    if ((b0 >> 4) == 0xE && *i + 2 < end) {
        uint32_t cp = ((b0 & 0x0F) << 12) | ((buf[*i + 1] & 0x3F) << 6)
                      | (buf[*i + 2] & 0x3F);
        *i += 3; return cp;
    }
    if ((b0 >> 3) == 0x1E && *i + 3 < end) {
        uint32_t cp = ((b0 & 0x07) << 18) | ((buf[*i + 1] & 0x3F) << 12)
                      | ((buf[*i + 2] & 0x3F) << 6) | (buf[*i + 3] & 0x3F);
        *i += 4; return cp;
    }
    *i += 1;
    return b0;  // invalid lead byte: opaque non-space
}

// Python str.split() whitespace set (str.isspace() codepoints).
static inline bool is_py_space(uint32_t cp) {
    switch (cp) {
        case 0x09: case 0x0A: case 0x0B: case 0x0C: case 0x0D: case 0x20:
        case 0x1C: case 0x1D: case 0x1E: case 0x1F:
        case 0x85: case 0xA0:
        case 0x1680:
        case 0x2028: case 0x2029: case 0x202F: case 0x205F: case 0x3000:
            return true;
        default:
            return (cp >= 0x2000 && cp <= 0x200A);
    }
}

// texts packed as buf[offsets[i] .. offsets[i+1]); out is (n, dim) zeroed
// by the caller. max_tokens < 0 means unlimited. basis: see
// ufnd_fnv1a64_basis (FNV_OFFSET = unsalted).
void ufnd_hash_embed_batch_basis(const uint8_t* buf, const int64_t* offsets,
                                 int64_t n, int64_t dim, int64_t max_tokens,
                                 uint64_t basis, float* out) {
    for (int64_t r = 0; r < n; ++r) {
        const int64_t start = offsets[r];
        const int64_t end = offsets[r + 1];
        float* row = out + r * dim;

        int64_t i = start;
        int64_t tok_count = 0;
        while (i < end) {
            // skip whitespace
            int64_t j = i;
            while (j < end) {
                int64_t k = j;
                uint32_t cp = decode_utf8(buf, end, &k);
                if (!is_py_space(cp)) break;
                j = k;
            }
            if (j >= end) break;
            // scan token
            int64_t tok_start = j;
            int64_t tok_end = j;
            while (tok_end < end) {
                int64_t k = tok_end;
                uint32_t cp = decode_utf8(buf, end, &k);
                if (is_py_space(cp)) break;
                tok_end = k;
            }
            if (max_tokens >= 0 && tok_count >= max_tokens) break;
            uint64_t h = ufnd_fnv1a64_basis(buf + tok_start,
                                            tok_end - tok_start, basis);
            row[(int64_t)(h % (uint64_t)dim)] += 1.0f;
            ++tok_count;
            i = tok_end;
        }

        double sq = 0.0;
        for (int64_t c = 0; c < dim; ++c) sq += (double)row[c] * row[c];
        if (sq > 0.0) {
            const float inv = (float)(1.0 / (std::sqrt(sq) + 1e-9));
            for (int64_t c = 0; c < dim; ++c) row[c] *= inv;
        }
    }
}

void ufnd_hash_embed_batch(const uint8_t* buf, const int64_t* offsets,
                           int64_t n, int64_t dim, int64_t max_tokens,
                           float* out) {
    ufnd_hash_embed_batch_basis(buf, offsets, n, dim, max_tokens,
                                FNV_OFFSET, out);
}

}  // extern "C"
