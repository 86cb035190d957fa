// Run-length-bounded psi walk for r-index construction from an .rl_bwt.
//
// The reference's FastLocate constructor walks psi once per text position per
// sequence to place SA samples at run boundaries (src/r-index.cpp:1025-1094),
// reading the BWT through its block structure - O(r) memory, O(n) sequential
// steps. Our numpy import path instead materialized the full psi permutation
// plus per-row (seq, step) arrays (~25 B/char), which capped the import at a
// few Gbp per host. This walk restores the reference's O(r) memory bound on
// flat run tables and attacks the walk's real cost - dependent cache misses:
//
//  * position -> run resolution uses a coarse bucket table (~2 entries per
//    run) + a short forward scan instead of a log(r) binary search: ~2 line
//    touches per step instead of ~6 misses.
//  * (run_start, psi_base|is_end) are interleaved in one 16-byte record so
//    a step's narrow + psi computation touches one cache line.
//  * lanes (sequences) are software-pipelined: each round issues the coarse
//    prefetch for every lane, then the record prefetch, then the dependent
//    work - turning one long dependent-miss chain per lane into n_seq
//    overlapped chains (memory-level parallelism).
//
// Across lanes the walks partition the BWT rows, so every head/tail slot is
// written exactly once - threads over lanes need no synchronization.
//
// psi(i) = psi_base[j] + (i - run_start[j]) where j = run_of(i) and
// psi_base[j] = C[sym_j] + cum[j][sym_j]  (FastLocate::psi, r-index.cpp:530).

#include <cstdint>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct RunRec {
    int64_t start;  // BWT offset of the run head
    int64_t base2;  // (psi_base << 1) | is_endmarker
};

}  // namespace

extern "C" {

// Walk psi from rows 0..n_seq-1 until each lane's BWT char is the endmarker.
// Outputs (filled for every run): head_seq/head_t = lane + step count at the
// run's first row, tail_seq/tail_t at its last row; seq_len[lane] = sequence
// length including the endmarker. Suffix offsets follow by the reference's
// distance flip (r-index.cpp:1082-1083): offset = seq_len[seq] - 1 - t.
// When sa_seq/sa_t are non-null ([n] each) the walk additionally records the
// full per-row (lane, step) assignment - the O(n) product the tag build
// consumes (core/tagbuild.py:tags_per_row); suffix offsets are derived by the
// caller via the same distance flip.
void panindex_psi_walk(
    const int64_t* run_start,  // [r]
    const int64_t* psi_base,   // [r] C[sym]+cum[j][sym]
    const uint8_t* is_end,     // [r] run_sym == endmarker code
    int64_t r, int64_t n, int64_t n_seq,
    int64_t* head_seq, int64_t* head_t,
    int64_t* tail_seq, int64_t* tail_t,
    int64_t* seq_len, int32_t n_threads,
    int64_t* sa_seq, int64_t* sa_t)
{
    (void)n_threads;
    // interleaved run records + sentinel (start = n ends every scan)
    std::vector<RunRec> rec(r + 1);
    for (int64_t j = 0; j < r; ++j)
        rec[j] = RunRec{run_start[j], (psi_base[j] << 1) | int64_t(is_end[j])};
    rec[r] = RunRec{n, 0};

    // coarse bucket table: coarse[b] = run containing position b << S,
    // sized to ~2 entries per run (O(r) memory)
    int S = 0;
    while ((n >> S) > 2 * r + 1 && S < 62) ++S;
    int64_t nb = ((n - 1) >> S) + 1;
    std::vector<int64_t> coarse(nb);
    {
        int64_t j = 0;
        for (int64_t b = 0; b < nb; ++b) {
            int64_t pos = b << S;
            while (rec[j + 1].start <= pos) ++j;
            coarse[b] = j;
        }
    }

    // software-pipelined lane rounds
    std::vector<int64_t> cur(n_seq), t(n_seq, 0), jv(n_seq);
    std::vector<int64_t> lanes(n_seq);
    for (int64_t s = 0; s < n_seq; ++s) { cur[s] = s; lanes[s] = s; }
    int64_t active = n_seq;
    while (active > 0) {
        for (int64_t a = 0; a < active; ++a)
            __builtin_prefetch(&coarse[cur[lanes[a]] >> S]);
        for (int64_t a = 0; a < active; ++a) {
            int64_t s = lanes[a];
            jv[s] = coarse[cur[s] >> S];
            __builtin_prefetch(&rec[jv[s]]);
        }
        int64_t w = 0;
        for (int64_t a = 0; a < active; ++a) {
            int64_t s = lanes[a];
            int64_t i = cur[s];
            int64_t j = jv[s];
            while (rec[j + 1].start <= i) ++j;
            if (i == rec[j].start) { head_seq[j] = s; head_t[j] = t[s]; }
            if (i == rec[j + 1].start - 1) { tail_seq[j] = s; tail_t[j] = t[s]; }
            if (sa_seq) { sa_seq[i] = s; sa_t[i] = t[s]; }
            if (rec[j].base2 & 1) {
                seq_len[s] = t[s] + 1;          // lane done: drop from pool
            } else {
                cur[s] = (rec[j].base2 >> 1) + (i - rec[j].start);
                ++t[s];
                lanes[w++] = s;
            }
        }
        active = w;
    }
}

}  // extern "C"
