// Linear-time suffix array construction (SA-IS) for the native BWT builder.
//
// The reference delegates BWT construction to the external grlBWT tool; our
// host builder (models/oracle.py) uses an O(n log^2 n) rotation sort. This is
// the production-scale path: SA-IS over the concatenated multi-string text
// with distinct per-sequence separators (separator of sequence i gets symbol
// 1+i, characters get dense codes above the separators), which makes suffix
// order equal rotation order - the multi-string BWT convention the whole
// pipeline uses.
//
// Performance: the induce scans are memory-latency bound at scale (random
// reads of the type/symbol of SA[i]-1 plus a random SA write through a bucket
// pointer). Symbol and S/L-type are therefore PACKED into one array
// (TS[i] = sym<<1 | is_s), sized uint8/uint16/uint32 by alphabet width, so
// each induce step costs one random read + one random write instead of three
// random accesses; prefetch hints overlap the remaining misses. The text
// alphabet is densified in panindex_build_bwt (n_seq + #distinct bytes + 1
// codes), which keeps TS in uint8 for any realistic pangenome.
//
// Index width: int32 (halves the random-access working set) while
// n + 1 < 2^31; larger shards dispatch to an int64 instantiation of the same
// templates, removing the round-1 ~2.1 Gbp per-shard capacity cliff.
//
// Exposed via the same C ABI as panindex_native.cpp.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int64_t PF = 16;  // prefetch distance in the induce scans

template <typename idx_t>
void sais_core(const idx_t* T, idx_t* SA, idx_t n, idx_t K);

// Core over the packed representation. TS[i] = (symbol << 1) | is_s.
// TS[n-1] must be the unique smallest symbol (and is S-type by definition).
template <typename idx_t, typename TS_T>
void sais_ts(const TS_T* TS, idx_t* SA, idx_t n, idx_t K) {
    if (n == 1) { SA[0] = 0; return; }
    auto sym = [&](idx_t i) -> idx_t { return (idx_t)(TS[i] >> 1); };
    auto s_type = [&](idx_t i) -> bool { return TS[i] & 1; };
    auto is_lms = [&](idx_t i) { return i > 0 && s_type(i) && !s_type(i - 1); };

    std::vector<idx_t> counts(K, 0), heads(K), tails(K);
    for (idx_t i = 0; i < n; ++i) counts[sym(i)]++;
    auto reset_heads = [&] {
        idx_t acc = 0;
        for (idx_t c = 0; c < K; ++c) { heads[c] = acc; acc += counts[c]; }
    };
    auto reset_tails = [&] {
        idx_t acc = 0;
        for (idx_t c = 0; c < K; ++c) { acc += counts[c]; tails[c] = acc; }
    };

    auto induce = [&](const std::vector<idx_t>& lms_order) {
        std::fill(SA, SA + n, (idx_t)-1);
        // place LMS suffixes at bucket tails, last-to-first
        reset_tails();
        for (idx_t q = (idx_t)lms_order.size() - 1; q >= 0; --q) {
            idx_t p = lms_order[q];
            SA[--tails[sym(p)]] = p;
        }
        // induce L-suffixes left-to-right
        reset_heads();
        for (idx_t i = 0; i < n; ++i) {
            if (i + PF < n) {
                idx_t sp = SA[i + PF];
                if (sp > 0) __builtin_prefetch(&TS[sp - 1]);
            }
            idx_t j = SA[i] - 1;
            if (SA[i] > 0 && !(TS[j] & 1)) SA[heads[TS[j] >> 1]++] = j;
        }
        // induce S-suffixes right-to-left
        reset_tails();
        for (idx_t i = n - 1; i >= 0; --i) {
            if (i - PF >= 0) {
                idx_t sp = SA[i - PF];
                if (sp > 0) __builtin_prefetch(&TS[sp - 1]);
            }
            idx_t j = SA[i] - 1;
            if (SA[i] > 0 && (TS[j] & 1)) SA[--tails[TS[j] >> 1]] = j;
        }
    };

    // 1) first induce from unsorted LMS positions (text order)
    std::vector<idx_t> lms;
    for (idx_t i = 1; i < n; ++i)
        if (is_lms(i)) lms.push_back(i);
    induce(lms);

    if (lms.empty()) return;  // only happens for trivial inputs

    // 2) name LMS substrings in SA order (packed compare: TS equality is
    //    exactly (symbol, type) equality)
    std::vector<idx_t> lms_sorted;
    lms_sorted.reserve(lms.size());
    for (idx_t i = 0; i < n; ++i)
        if (is_lms(SA[i])) lms_sorted.push_back(SA[i]);

    std::vector<idx_t> name_of(n, -1);
    idx_t name = 0;
    idx_t prev = -1;
    for (idx_t q = 0; q < (idx_t)lms_sorted.size(); ++q) {
        idx_t p = lms_sorted[q];
        if (prev >= 0) {
            bool diff = false;
            for (idx_t d = 0;; ++d) {
                if (TS[prev + d] != TS[p + d]) {
                    diff = true;
                    break;
                }
                if (d > 0 && (is_lms(prev + d) || is_lms(p + d))) {
                    diff = !(is_lms(prev + d) && is_lms(p + d));
                    break;
                }
            }
            if (diff) ++name;
        }
        name_of[p] = name;
        prev = p;
    }
    idx_t n_names = name + 1;

    // 3) recurse if names repeat
    std::vector<idx_t> order(lms.size());
    if (n_names < (idx_t)lms.size()) {
        std::vector<idx_t> T1(lms.size()), SA1(lms.size());
        for (size_t q = 0; q < lms.size(); ++q) T1[q] = name_of[lms[q]];
        name_of.clear(); name_of.shrink_to_fit();
        lms_sorted.clear(); lms_sorted.shrink_to_fit();
        // pack the reduced problem (T1[last] = 0 is unique smallest: it names
        // the final LMS substring, the sentinel suffix)
        sais_core<idx_t>(T1.data(), SA1.data(), (idx_t)T1.size(), n_names);
        for (size_t q = 0; q < lms.size(); ++q) order[q] = lms[SA1[q]];
    } else {
        order.assign(lms_sorted.begin(), lms_sorted.end());
    }

    // 4) final induce from sorted LMS suffixes
    induce(order);
}

// Entry: plain integer text + alphabet size; packs and dispatches by K.
template <typename idx_t>
void sais_core(const idx_t* T, idx_t* SA, idx_t n, idx_t K) {
    if (n == 1) { SA[0] = 0; return; }
    auto build_and_run = [&](auto tag) {
        using P = decltype(tag);
        std::vector<P> TS(n);
        TS[n - 1] = (P)((T[n - 1] << 1) | 1);
        for (idx_t i = n - 2; i >= 0; --i) {
            bool s = (T[i] < T[i + 1]) || (T[i] == T[i + 1] && (TS[i + 1] & 1));
            TS[i] = (P)((T[i] << 1) | (s ? 1 : 0));
        }
        sais_ts<idx_t, P>(TS.data(), SA, n, K);
    };
    if (K <= 128) build_and_run((uint8_t)0);
    else if (K <= 32768) build_and_run((uint16_t)0);
    else if (K <= (idx_t)0x40000000) build_and_run((uint32_t)0);
    else build_and_run((uint64_t)0);  // reachable only on the int64 path
}

// Multi-string BWT body (see the extern "C" wrapper for the contract).
// Sequence id / in-sequence offset of a rotation are recovered from the
// separator boundaries by binary search instead of 16 bytes/char of
// side arrays - the build working set is T + SA + TS + outputs.
template <typename idx_t, typename out_t = int64_t>
void build_bwt_impl(const uint8_t* text, int64_t text_len,
                    const int64_t* seq_ends, int64_t n_seq,
                    uint8_t* bwt, out_t* da, out_t* sa_pos) {
    idx_t n = (idx_t)(text_len + n_seq);
    // dense, order-preserving byte remap: separators take codes 1..n_seq,
    // present bytes take n_seq+1.. in byte order. Keeps the SA-IS alphabet
    // (and the packed TS array) as small as the data allows.
    idx_t code_of[256];
    {
        bool present[256] = {false};
        for (int64_t p = 0; p < text_len; ++p) present[text[p]] = true;
        idx_t next = (idx_t)n_seq + 1;
        for (int b = 0; b < 256; ++b) code_of[b] = present[b] ? next++ : -1;
    }
    // bnd[i] = exclusive end of sequence i in the separator-joined text
    std::vector<idx_t> bnd(n_seq);
    for (int64_t i = 0; i < n_seq; ++i) bnd[i] = (idx_t)(seq_ends[i] + i + 1);
    std::vector<idx_t> T(n + 1);
    {
        idx_t w = 0, prev_end = 0;
        for (idx_t i = 0; i < (idx_t)n_seq; ++i) {
            idx_t end = (idx_t)seq_ends[i];
            for (idx_t p = prev_end; p < end; ++p) T[w++] = code_of[text[p]];
            T[w++] = 1 + i;  // distinct separator, ordered by sequence index
            prev_end = end;
        }
    }
    T[n] = 0;  // global sentinel for SA-IS
    idx_t K = 0;
    for (idx_t i = 0; i <= n; ++i) if (T[i] >= K) K = T[i] + 1;
    std::vector<idx_t> SA(n + 1);
    sais_core<idx_t>(T.data(), SA.data(), n + 1, K);
    // dense code -> byte back-map for BWT output (codes go up to
    // n_seq + #distinct bytes, so this must be sized by K, not 256)
    std::vector<uint8_t> byte_of(K, 0);
    for (int b = 0; b < 256; ++b)
        if (code_of[b] >= 0) byte_of[code_of[b]] = (uint8_t)b;
    // SA[0] == n (the sentinel); rows 1.. map to rotations
    for (idx_t r = 1; r <= n; ++r) {
        idx_t p = SA[r];
        idx_t j = r - 1;
        idx_t prev = (p + n - 1) % n;
        idx_t tp = T[prev];
        bwt[j] = tp > (idx_t)n_seq ? byte_of[tp] : (uint8_t)'\n';
        idx_t s = (idx_t)(std::upper_bound(bnd.begin(), bnd.end(), p) - bnd.begin());
        da[j] = (out_t)s;
        sa_pos[j] = (out_t)(p - (s > 0 ? bnd[s - 1] : 0));
    }
}

}  // namespace

extern "C" {

// Suffix array of T (values in [0, K), T[n-1] must be unique smallest).
void panindex_sais(const int64_t* T, int64_t* SA, int64_t n, int64_t K) {
    if (n < (int64_t)1 << 31) {
        std::vector<int32_t> T32(n), SA32(n);
        for (int64_t i = 0; i < n; ++i) T32[i] = (int32_t)T[i];
        sais_core<int32_t>(T32.data(), SA32.data(), (int32_t)n, (int32_t)K);
        for (int64_t i = 0; i < n; ++i) SA[i] = SA32[i];
    } else {
        sais_core<int64_t>(T, SA, n, K);
    }
}

// Multi-string BWT: text = concatenated sequences WITHOUT separators;
// seq_ends[i] = exclusive end offset of sequence i in text (ascending).
// Output arrays of length n = text_len + n_seq:
//   bwt[j]   = byte of BWT row j ('\n' for separators)
//   da[j]    = sequence id of row j's suffix
//   sa_pos[j]= suffix offset within its sequence (separator at seq_len)
void panindex_build_bwt(const uint8_t* text, int64_t text_len,
                        const int64_t* seq_ends, int64_t n_seq,
                        uint8_t* bwt, int64_t* da, int64_t* sa_pos) {
    if (text_len + n_seq + 1 < (int64_t)1 << 31)
        build_bwt_impl<int32_t>(text, text_len, seq_ends, n_seq, bwt, da, sa_pos);
    else
        build_bwt_impl<int64_t>(text, text_len, seq_ends, n_seq, bwt, da, sa_pos);
}

// int32 da/sa_pos outputs (halves the dominant build-plane arrays); valid
// only when text_len + n_seq < 2^31 - the wrapper picks the width.
void panindex_build_bwt_i32(const uint8_t* text, int64_t text_len,
                            const int64_t* seq_ends, int64_t n_seq,
                            uint8_t* bwt, int32_t* da, int32_t* sa_pos) {
    build_bwt_impl<int32_t, int32_t>(text, text_len, seq_ends, n_seq, bwt, da, sa_pos);
}

// Test hooks: force the int64 instantiations on small inputs so the >2 Gbp
// path is exercised without allocating 2^31 characters.
void panindex_sais_force64(const int64_t* T, int64_t* SA, int64_t n, int64_t K) {
    sais_core<int64_t>(T, SA, n, K);
}

void panindex_build_bwt_force64(const uint8_t* text, int64_t text_len,
                                const int64_t* seq_ends, int64_t n_seq,
                                uint8_t* bwt, int64_t* da, int64_t* sa_pos) {
    build_bwt_impl<int64_t>(text, text_len, seq_ends, n_seq, bwt, da, sa_pos);
}

}  // extern "C"
