// flacfe — bit-serial fast paths for the FLAC host structural walk.
//
// The FLAC walk (audio_decoder_tpu/codecs/flac/frontend.py) only needs
// frame/subframe/partition BOUNDARIES on the host — the TPU does the
// actual entropy decode — but finding a partition's end still means
// stepping every rice code's unary run.  That inner loop (and the
// per-frame CRC-8/16 validation) is the same bit-serial work the MPEG
// family puts in mp3fe.cc; this file gives the FLAC walk the same
// native core.  The Python implementations in frontend.py remain the
// behavioral contract and the fallback when no toolchain is present.
//
// Role parity note: the reference project keeps all of its bit cursors
// on the host CPU (blast/src/file_parsing/*.rs); here only the
// structure-finding cursor does, and it runs in C.

#include <cstdint>
#include <mutex>

namespace {

// 64-bit big-endian window at an arbitrary bit position: the top
// 64 - (pos & 7) bits are stream bits, the rest shifted-in zeros.
inline uint64_t win64(const uint8_t* buf, int64_t nbytes, int64_t bitpos) {
    int64_t byte = bitpos >> 3;
    uint64_t w = 0;
    if (nbytes - byte >= 8) {
        for (int i = 0; i < 8; ++i) w = (w << 8) | buf[byte + i];
    } else {
        for (int i = 0; i < 8; ++i)
            w = (w << 8) | (byte + i < nbytes ? buf[byte + i] : 0);
    }
    return w << (bitpos & 7);
}

uint8_t CRC8_TAB[256];
uint16_t CRC16_TAB[256];
std::once_flag tabs_once;

// callers race here: decode_group threads the per-file walk and the
// ctypes calls drop the GIL, so first-touch must be call_once, not a
// check-then-write flag
void init_tabs() {
    std::call_once(tabs_once, [] {
        for (int b = 0; b < 256; ++b) {
            uint32_t r = b;
            for (int i = 0; i < 8; ++i)
                r = (r & 0x80) ? ((r << 1) ^ 0x07) & 0xFF : (r << 1) & 0xFF;
            CRC8_TAB[b] = (uint8_t)r;
            r = b << 8;
            for (int i = 0; i < 8; ++i)
                r = (r & 0x8000) ? ((r << 1) ^ 0x8005) & 0xFFFF
                                 : (r << 1) & 0xFFFF;
            CRC16_TAB[b] = (uint16_t)r;
        }
    });
}

}  // namespace

extern "C" {

// Advance past `count` rice codes with parameter `param` starting at bit
// `pos` of an `nbits`-bit stream.  Quotient outliers (q > q_cap) are
// written to `out` as (code_idx, end_bitpos, unzigzagged_value) triples,
// capacity `cap` triples.  When `split` > 0, the bit position BEFORE
// code j is recorded in `splits[j/split - 1]` for every positive
// multiple j of `split` below `count` (capacity (count-1)/split, exact
// by construction) — the walk uses these to cut long partitions into
// bounded device lanes.  Returns the new bit position, -1 if any code
// runs past the end of the stream, -2 on outlier-capacity overflow.
int64_t flacfe_skip_rice(const uint8_t* buf, int64_t nbits, int64_t pos,
                         int64_t count, int32_t param, int32_t q_cap,
                         int64_t* out, int64_t cap, int64_t* n_out,
                         int64_t split, int64_t* splits) {
    const int64_t nbytes = (nbits + 7) >> 3;
    int64_t nout = 0;
    for (int64_t j = 0; j < count; ++j) {
        if (split > 0 && j > 0 && j % split == 0) splits[j / split - 1] = pos;
        int64_t q = 0;
        for (;;) {
            if (pos >= nbits) return -1;
            uint64_t w = win64(buf, nbytes, pos);
            if (w == 0) { q += 56; pos += 56; continue; }
            int lz = __builtin_clzll(w);
            if (lz >= 56) { q += 56; pos += 56; continue; }
            q += lz;
            pos += lz;
            if (pos >= nbits) return -1;  // stop bit past end of stream
            pos += 1;
            break;
        }
        uint64_t rem = 0;
        if (param > 0) {
            rem = win64(buf, nbytes, pos) >> (64 - param);
            pos += param;
        }
        if (pos > nbits) return -1;
        if (q > q_cap) {
            if (nout >= cap) return -2;
            uint64_t u = ((uint64_t)q << param) | rem;
            int64_t v = (int64_t)(u >> 1);
            if (u & 1) v = ~v;  // unzigzag: (u >> 1) ^ -(u & 1)
            out[nout * 3 + 0] = j;
            out[nout * 3 + 1] = pos;
            out[nout * 3 + 2] = v;
            ++nout;
        }
    }
    *n_out = nout;
    return pos;
}

// Frame-header CRC-8 (poly 0x07, init 0) / whole-frame CRC-16
// (poly 0x8005, init 0) — same contracts as frontend.crc8/crc16.
uint32_t flacfe_crc8(const uint8_t* buf, int64_t len) {
    init_tabs();
    uint32_t r = 0;
    for (int64_t i = 0; i < len; ++i) r = CRC8_TAB[r ^ buf[i]];
    return r;
}

uint32_t flacfe_crc16(const uint8_t* buf, int64_t len) {
    init_tabs();
    uint32_t r = 0;
    for (int64_t i = 0; i < len; ++i)
        r = CRC16_TAB[((r >> 8) ^ buf[i]) & 0xFF] ^ ((r << 8) & 0xFFFF);
    return r;
}

}  // extern "C"
