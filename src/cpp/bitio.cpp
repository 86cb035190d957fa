// Bit-packed container kernels for the on-disk codecs (formats/sdsl.py).
//
// The sdsl int_vector / sd_vector layouts (reference: SDSL serialization
// used throughout r-index.hpp:307-343, tag_arrays.hpp:94-109) store values
// LSB-first in uint64 words. The numpy decoders are vectorized but make
// ~5 passes of 8 B/value temporaries; at genome scale (tens of millions of
// runs) those passes were the largest load-path constant. These kernels do
// the same work in one streaming pass each.

#include <cstdint>

extern "C" {

// Unpack `count` LSB-first `width`-bit values from LE words into out[].
// words must have at least (count*width + 63)/64 + 1 readable entries is NOT
// required: the straddle read guards the last word.
void panindex_unpack_bits(const uint64_t* words, int64_t nwords,
                          int64_t width, int64_t count, int64_t* out)
{
    if (width <= 0) return;
    const uint64_t mask = (width < 64) ? ((uint64_t(1) << width) - 1) : ~uint64_t(0);
    int64_t bitpos = 0;
    for (int64_t i = 0; i < count; ++i, bitpos += width) {
        int64_t w = bitpos >> 6;
        int off = int(bitpos & 63);
        uint64_t v = words[w] >> off;
        if (off + width > 64 && w + 1 < nwords)
            v |= words[w + 1] << (64 - off);
        out[i] = int64_t(v & mask);
    }
}

// Pack values[count] as LSB-first width-bit fields into zeroed words[].
void panindex_pack_bits(const int64_t* values, int64_t count, int64_t width,
                        uint64_t* words)
{
    if (width <= 0) return;
    const uint64_t mask = (width < 64) ? ((uint64_t(1) << width) - 1) : ~uint64_t(0);
    int64_t bitpos = 0;
    for (int64_t i = 0; i < count; ++i, bitpos += width) {
        int64_t w = bitpos >> 6;
        int off = int(bitpos & 63);
        uint64_t v = uint64_t(values[i]) & mask;
        words[w] |= v << off;
        if (off + width > 64)
            words[w + 1] |= v >> (64 - off);
    }
}

// Indices of set bits in a LE-word bit vector of nbits; returns the count
// (stops at max_out). One pass, ctz-driven - replaces unpackbits+flatnonzero
// (1 B/bit + 8 B/bit temporaries) in the sd_vector high-bits decode.
int64_t panindex_set_bits(const uint64_t* words, int64_t nbits,
                          int64_t* out, int64_t max_out)
{
    int64_t cnt = 0;
    int64_t nwords = (nbits + 63) >> 6;
    for (int64_t w = 0; w < nwords; ++w) {
        uint64_t x = words[w];
        if (w == nwords - 1 && (nbits & 63))
            x &= (uint64_t(1) << (nbits & 63)) - 1;
        int64_t base = w << 6;
        while (x) {
            if (cnt >= max_out) return cnt;
            out[cnt++] = base + __builtin_ctzll(x);
            x &= x - 1;
        }
    }
    return cnt;
}

}  // extern "C"
