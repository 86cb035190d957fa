// Run-length-bounded psi walk for r-index construction from an .rl_bwt.
//
// The reference's FastLocate constructor walks psi once per text position per
// sequence to place SA samples at run boundaries (src/r-index.cpp:1025-1094),
// reading the BWT through its block structure - O(r) memory, O(n) sequential
// steps. Our numpy import path instead materialized the full psi permutation
// plus per-row (seq, step) arrays (~25 B/char), which capped the import at a
// few Gbp per host. This walk restores the reference's O(r) memory bound on
// flat run tables: per step, one run lookup (interpolation-seeded binary
// search over run_start) computes psi on the fly, and (lane, step) is
// recorded ONLY at run heads and tails. Across lanes the walks partition the
// BWT rows, so every head/tail slot is written exactly once - threads over
// lanes need no synchronization.
//
// psi(i) = psi_base[j] + (i - run_start[j]) where j = run_of(i) and
// psi_base[j] = C[sym_j] + cum[j][sym_j]  (FastLocate::psi, r-index.cpp:530).

#include <cstdint>
#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

// Largest j with run_start[j] <= pos. run_start is smooth (average gap n/r),
// so an interpolation seed + outward gallop brackets the answer in a handful
// of probes; the final narrowing is plain binary search.
inline int64_t run_of_interp(const int64_t* run_start, int64_t r, int64_t n,
                             int64_t pos) {
    int64_t g = (int64_t)((double)pos * (double)r / (double)n);
    if (g < 0) g = 0;
    if (g >= r) g = r - 1;
    int64_t lo, hi;
    if (run_start[g] <= pos) {
        lo = g;
        int64_t step = 1;
        hi = g;
        while (hi < r - 1 && run_start[hi + 1] <= pos) {
            lo = hi + 1;
            hi = lo + step;
            if (hi > r - 1) hi = r - 1;
            step <<= 1;
        }
    } else {
        hi = g - 1;
        int64_t step = 1;
        lo = hi;
        while (lo > 0 && run_start[lo] > pos) {
            hi = lo - 1;
            lo = hi - step;
            if (lo < 0) lo = 0;
            step <<= 1;
        }
    }
    while (lo < hi) {
        int64_t mid = (lo + hi + 1) >> 1;
        if (run_start[mid] <= pos) lo = mid; else hi = mid - 1;
    }
    return lo;
}

}  // namespace

extern "C" {

// Walk psi from rows 0..n_seq-1 until each lane's BWT char is the endmarker.
// Outputs (filled for every run): head_seq/head_t = lane + step count at the
// run's first row, tail_seq/tail_t at its last row; seq_len[lane] = sequence
// length including the endmarker. Suffix offsets follow by the reference's
// distance flip (r-index.cpp:1082-1083): offset = seq_len[seq] - 1 - t.
void panindex_psi_walk(
    const int64_t* run_start,  // [r]
    const int64_t* psi_base,   // [r] C[sym]+cum[j][sym]
    const uint8_t* is_end,     // [r] run_sym == endmarker code
    int64_t r, int64_t n, int64_t n_seq,
    int64_t* head_seq, int64_t* head_t,
    int64_t* tail_seq, int64_t* tail_t,
    int64_t* seq_len, int32_t n_threads)
{
#ifdef _OPENMP
    if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel for schedule(dynamic, 1)
#endif
    for (int64_t lane = 0; lane < n_seq; ++lane) {
        int64_t i = lane;
        int64_t t = 0;
        for (;;) {
            int64_t j = run_of_interp(run_start, r, n, i);
            if (i == run_start[j]) { head_seq[j] = lane; head_t[j] = t; }
            int64_t next_start = (j + 1 < r) ? run_start[j + 1] : n;
            if (i == next_start - 1) { tail_seq[j] = lane; tail_t[j] = t; }
            if (is_end[j]) { seq_len[lane] = t + 1; break; }
            i = psi_base[j] + (i - run_start[j]);
            ++t;
        }
    }
}

}  // extern "C"
