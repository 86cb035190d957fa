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
//    work - turning one long dependent-miss chain per lane into many
//    overlapped chains (memory-level parallelism).
//
// Across lanes the walks partition the BWT rows, so every head/tail/sa slot
// is written exactly once - OpenMP threads over lane subsets need no
// synchronization (each thread software-pipelines its own subset).
//
// sa_seq/sa_t recording is windowed (rows in [win_lo, win_hi) stored at
// i - win_lo): the streamed tag build (core/tagbuild.py) re-runs the walk
// once per row window so tag-build memory is O(r + window) instead of the
// full 16 B/row SA product (reference analog: the traversal streams tags,
// algorithm.hpp:378-593).
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

// Walk the lane subset [s_begin, s_end): software-pipelined rounds over the
// subset's active lanes. Writes only row-owned slots (head/tail of runs whose
// rows this subset's walks visit; sa slots for visited rows in the window).
void walk_lanes(const std::vector<RunRec>& rec,
                const std::vector<int64_t>& coarse, int S,
                int64_t s_begin, int64_t s_end,
                int64_t* head_seq, int64_t* head_t,
                int64_t* tail_seq, int64_t* tail_t,
                int64_t* seq_len,
                int64_t* sa_seq, int64_t* sa_t,
                int64_t win_lo, int64_t win_hi)
{
    int64_t n_lanes = s_end - s_begin;
    if (n_lanes <= 0) return;
    std::vector<int64_t> cur(n_lanes), t(n_lanes, 0), jv(n_lanes);
    std::vector<int64_t> lanes(n_lanes);
    for (int64_t a = 0; a < n_lanes; ++a) {
        cur[a] = s_begin + a;   // lane s starts at BWT row s
        lanes[a] = a;
    }
    int64_t active = n_lanes;
    while (active > 0) {
        for (int64_t a = 0; a < active; ++a)
            __builtin_prefetch(&coarse[cur[lanes[a]] >> S]);
        for (int64_t a = 0; a < active; ++a) {
            int64_t l = lanes[a];
            jv[l] = coarse[cur[l] >> S];
            __builtin_prefetch(&rec[jv[l]]);
        }
        int64_t w = 0;
        for (int64_t a = 0; a < active; ++a) {
            int64_t l = lanes[a];
            int64_t s = s_begin + l;
            int64_t i = cur[l];
            int64_t j = jv[l];
            while (rec[j + 1].start <= i) ++j;
            if (i == rec[j].start) { head_seq[j] = s; head_t[j] = t[l]; }
            if (i == rec[j + 1].start - 1) { tail_seq[j] = s; tail_t[j] = t[l]; }
            if (sa_seq && i >= win_lo && i < win_hi) {
                sa_seq[i - win_lo] = s;
                sa_t[i - win_lo] = t[l];
            }
            if (rec[j].base2 & 1) {
                seq_len[s] = t[l] + 1;          // lane done: drop from pool
            } else {
                cur[l] = (rec[j].base2 >> 1) + (i - rec[j].start);
                ++t[l];
                lanes[w++] = l;
            }
        }
        active = w;
    }
}

}  // namespace

extern "C" {

// Walk psi from rows 0..n_seq-1 until each lane's BWT char is the endmarker.
// Outputs (filled for every run): head_seq/head_t = lane + step count at the
// run's first row, tail_seq/tail_t at its last row; seq_len[lane] = sequence
// length including the endmarker. Suffix offsets follow by the reference's
// distance flip (r-index.cpp:1082-1083): offset = seq_len[seq] - 1 - t.
// When sa_seq/sa_t are non-null ([win_hi - win_lo] each) the walk records the
// (lane, step) assignment of every visited row in [win_lo, win_hi) at index
// i - win_lo - the windowed product the streamed tag build consumes
// (core/tagbuild.py); suffix offsets are derived by the caller via the same
// distance flip. n_threads > 1 partitions lanes across OpenMP threads (the
// lanes partition the rows, so no synchronization is needed); <= 0 uses the
// OpenMP default.
//
// _v2: the (sa_seq, sa_t, win_lo, win_hi) window arguments were APPENDED to
// the original signature; renaming the entry point makes a stale
// libpanindex_native.so fail loudly at symbol lookup instead of silently
// ignoring the window and writing a full-[n] SA into (hi-lo)-sized buffers
// (advisor r4 ABI finding). Python checks hasattr(lib, "..._v2").
void panindex_psi_walk_v2(
    const int64_t* run_start,  // [r]
    const int64_t* psi_base,   // [r] C[sym]+cum[j][sym]
    const uint8_t* is_end,     // [r] run_sym == endmarker code
    int64_t r, int64_t n, int64_t n_seq,
    int64_t* head_seq, int64_t* head_t,
    int64_t* tail_seq, int64_t* tail_t,
    int64_t* seq_len, int32_t n_threads,
    int64_t* sa_seq, int64_t* sa_t,
    int64_t win_lo, int64_t win_hi)
{
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

#ifdef _OPENMP
    int T = n_threads > 0 ? n_threads : omp_get_max_threads();
    if (T > n_seq) T = (int)n_seq;
    if (T > 1) {
        #pragma omp parallel num_threads(T)
        {
            int tid = omp_get_thread_num();
            int nt = omp_get_num_threads();
            int64_t per = (n_seq + nt - 1) / nt;
            int64_t lo = (int64_t)tid * per;
            int64_t hi = lo + per < n_seq ? lo + per : n_seq;
            walk_lanes(rec, coarse, S, lo, hi, head_seq, head_t,
                       tail_seq, tail_t, seq_len, sa_seq, sa_t,
                       win_lo, win_hi);
        }
        return;
    }
#else
    (void)n_threads;
#endif
    walk_lanes(rec, coarse, S, 0, n_seq, head_seq, head_t,
               tail_seq, tail_t, seq_len, sa_seq, sa_t, win_lo, win_hi);
}

}  // extern "C"
