// Native host-side codecs for unikmer_tpu.
//
// The reference's serialization hot loops live in Go (unik/v5 module,
// SURVEY.md §2.3); here the .unik inner loops are C++ behind ctypes:
//   * varint-GB64 encode/decode (control stream ahead of value stream,
//     layout documented in io/varint.py)
//   * fused delta +/- transform for sorted payloads
//   * 2-bit base packing (ASCII -> base codes) for the FASTA ingest path
//
// Build: make -C unikmer_tpu/native   (g++ -O3, no external deps)

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// ---------------------------------------------------------------------
// varint-GB64: groups of 4 values, one u16 control word per group
// (3 bits per value = byte length - 1), all control words first.
// ---------------------------------------------------------------------

static inline int byte_len_u64(uint64_t v) {
    if (v == 0) return 1;
    int bits = 64 - __builtin_clzll(v);
    return (bits + 7) >> 3;
}

// Returns number of bytes written, or (size_t)-1 if out_cap too small.
// Worst case: 2*ceil(n/4) + 8n.
size_t gb64_encode(const uint64_t* vals, size_t n, uint8_t* out,
                   size_t out_cap) {
    if (n == 0) return 0;
    size_t ngroups = (n + 3) / 4;
    size_t ctrl_bytes = 2 * ngroups;
    if (out_cap < ctrl_bytes) return (size_t)-1;
    uint8_t* ctrl = out;
    uint8_t* data = out + ctrl_bytes;
    size_t data_cap = out_cap - ctrl_bytes;
    size_t dpos = 0;
    for (size_t g = 0; g < ngroups; g++) {
        uint16_t c = 0;
        size_t base = g * 4;
        size_t in_group = (base + 4 <= n) ? 4 : (n - base);
        for (size_t j = 0; j < in_group; j++) {
            uint64_t v = vals[base + j];
            int len = byte_len_u64(v);
            c |= (uint16_t)(len - 1) << (3 * j);
            if (dpos + 8 > data_cap && dpos + (size_t)len > data_cap)
                return (size_t)-1;
            // little-endian store of `len` bytes
            std::memcpy(data + dpos, &v, 8 > data_cap - dpos ? len : 8);
            dpos += len;
        }
        ctrl[2 * g] = (uint8_t)(c & 0xFF);
        ctrl[2 * g + 1] = (uint8_t)(c >> 8);
    }
    return ctrl_bytes + dpos;
}

// Returns bytes consumed from buf, or (size_t)-1 on truncation.
size_t gb64_decode(const uint8_t* buf, size_t buflen, size_t n,
                   uint64_t* out) {
    if (n == 0) return 0;
    size_t ngroups = (n + 3) / 4;
    size_t ctrl_bytes = 2 * ngroups;
    if (buflen < ctrl_bytes) return (size_t)-1;
    const uint8_t* data = buf + ctrl_bytes;
    size_t data_len = buflen - ctrl_bytes;
    size_t dpos = 0;
    for (size_t g = 0; g < ngroups; g++) {
        uint16_t c = (uint16_t)buf[2 * g] | ((uint16_t)buf[2 * g + 1] << 8);
        size_t base = g * 4;
        size_t in_group = (base + 4 <= n) ? 4 : (n - base);
        for (size_t j = 0; j < in_group; j++) {
            int len = ((c >> (3 * j)) & 7) + 1;
            if (dpos + (size_t)len > data_len) return (size_t)-1;
            uint64_t v = 0;
            if (dpos + 8 <= data_len) {
                std::memcpy(&v, data + dpos, 8);
                if (len < 8) v &= (~0ULL) >> (8 * (8 - len));
            } else {
                std::memcpy(&v, data + dpos, len);
            }
            out[base + j] = v;
            dpos += len;
        }
    }
    return ctrl_bytes + dpos;
}

// Fused: deltas of sorted vals (relative to prev) -> varint-GB.
size_t gb64_encode_deltas(const uint64_t* vals, size_t n, uint64_t prev,
                          uint8_t* out, size_t out_cap) {
    if (n == 0) return 0;
    size_t ngroups = (n + 3) / 4;
    size_t ctrl_bytes = 2 * ngroups;
    if (out_cap < ctrl_bytes + 8 * n) return (size_t)-1;  // demand worst case
    uint8_t* ctrl = out;
    uint8_t* data = out + ctrl_bytes;
    size_t dpos = 0;
    uint64_t p = prev;
    for (size_t g = 0; g < ngroups; g++) {
        uint16_t c = 0;
        size_t base = g * 4;
        size_t in_group = (base + 4 <= n) ? 4 : (n - base);
        for (size_t j = 0; j < in_group; j++) {
            uint64_t v = vals[base + j] - p;
            p = vals[base + j];
            int len = byte_len_u64(v);
            c |= (uint16_t)(len - 1) << (3 * j);
            std::memcpy(data + dpos, &v, 8);
            dpos += len;
        }
        ctrl[2 * g] = (uint8_t)(c & 0xFF);
        ctrl[2 * g + 1] = (uint8_t)(c >> 8);
    }
    return ctrl_bytes + dpos;
}

// Fused: varint-GB -> cumulative sums (delta decode). Returns consumed.
size_t gb64_decode_deltas(const uint8_t* buf, size_t buflen, size_t n,
                          uint64_t prev, uint64_t* out) {
    if (n == 0) return 0;
    size_t ngroups = (n + 3) / 4;
    size_t ctrl_bytes = 2 * ngroups;
    if (buflen < ctrl_bytes) return (size_t)-1;
    const uint8_t* data = buf + ctrl_bytes;
    size_t data_len = buflen - ctrl_bytes;
    size_t dpos = 0;
    uint64_t acc = prev;
    for (size_t g = 0; g < ngroups; g++) {
        uint16_t c = (uint16_t)buf[2 * g] | ((uint16_t)buf[2 * g + 1] << 8);
        size_t base = g * 4;
        size_t in_group = (base + 4 <= n) ? 4 : (n - base);
        for (size_t j = 0; j < in_group; j++) {
            int len = ((c >> (3 * j)) & 7) + 1;
            if (dpos + (size_t)len > data_len) return (size_t)-1;
            uint64_t v = 0;
            if (dpos + 8 <= data_len) {
                std::memcpy(&v, data + dpos, 8);
                if (len < 8) v &= (~0ULL) >> (8 * (8 - len));
            } else {
                std::memcpy(&v, data + dpos, len);
            }
            acc += v;
            out[base + j] = acc;
            dpos += len;
        }
    }
    return ctrl_bytes + dpos;
}

// ---------------------------------------------------------------------
// FASTA ingest helpers
// ---------------------------------------------------------------------

// ASCII -> 2-bit base code (255 invalid), matching ops/codec.BASE_LUT.
static uint8_t BASE_LUT[256];
static bool lut_init = []() {
    std::memset(BASE_LUT, 0xFF, sizeof(BASE_LUT));
    BASE_LUT[(unsigned char)'A'] = BASE_LUT[(unsigned char)'a'] = 0;
    BASE_LUT[(unsigned char)'C'] = BASE_LUT[(unsigned char)'c'] = 1;
    BASE_LUT[(unsigned char)'G'] = BASE_LUT[(unsigned char)'g'] = 2;
    BASE_LUT[(unsigned char)'T'] = BASE_LUT[(unsigned char)'t'] = 3;
    BASE_LUT[(unsigned char)'U'] = BASE_LUT[(unsigned char)'u'] = 3;
    return true;
}();

void map_bases(const uint8_t* seq, size_t n, uint8_t* out) {
    for (size_t i = 0; i < n; i++) out[i] = BASE_LUT[seq[i]];
}

// Strip ASCII whitespace and map to base codes in one pass.
// Returns number of bases written.
size_t map_bases_skip_ws(const uint8_t* seq, size_t n, uint8_t* out) {
    size_t w = 0;
    for (size_t i = 0; i < n; i++) {
        uint8_t ch = seq[i];
        if (ch == '\n' || ch == '\r' || ch == ' ' || ch == '\t') continue;
        out[w++] = BASE_LUT[ch];
    }
    return w;
}

}  // extern "C"
