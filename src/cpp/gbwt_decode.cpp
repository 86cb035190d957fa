// Batched GBWT record decode + path extraction for the build plane.
//
// The reference walks GBWT records through the gbwt library's per-record
// iterators (gbz.index.extract at algorithm.hpp:398, merge_tags.cpp:508-515).
// Our build plane instead decodes EVERY record once into flat CSR arrays
// (edges, runs, per-run prefix sums) so that path extraction, component
// detection, and tag construction become array programs; this file is the
// native decode/walk engine behind formats/gbwt_table.py (a pure-numpy
// fallback exists there for environments without a C++ toolchain).
//
// Record byte format (gbwt Run/ByteCode codecs, see formats/gbz.py):
//   [sigma: varint] sigma x ([succ node delta: varint][bwt offset: varint])
//   then runs: sigma < 255: one byte packs (rank, len) as rank + sigma*(len-1),
//   lengths >= 256/sigma spill to a varint extension; sigma >= 255: varint
//   pairs (rank, len-1).
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline uint64_t bytecode(const uint8_t* d, int64_t& o) {
    uint64_t v = 0;
    int sh = 0;
    while (true) {
        uint8_t b = d[o++];
        v |= (uint64_t)(b & 0x7F) << sh;
        sh += 7;
        if (!(b & 0x80)) return v;
    }
}

}  // namespace

extern "C" {

// Pass 1: per-record edge and run counts (parallel over records).
void panindex_gbwt_count(const uint8_t* data, int64_t data_len,
                         const int64_t* starts, int64_t n_rec,
                         int64_t* edge_counts, int64_t* run_counts,
                         int32_t n_threads) {
#ifdef _OPENMP
    if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel for schedule(dynamic, 1024)
#endif
    for (int64_t i = 0; i < n_rec; i++) {
        int64_t o = starts[i];
        int64_t end = (i + 1 < n_rec) ? starts[i + 1] : data_len;
        if (o >= end) { edge_counts[i] = 0; run_counts[i] = 0; continue; }
        uint64_t sigma = bytecode(data, o);
        edge_counts[i] = (int64_t)sigma;
        for (uint64_t e = 0; e < sigma; e++) { bytecode(data, o); bytecode(data, o); }
        int64_t runs = 0;
        uint64_t rc = (sigma > 0 && sigma < 255) ? 256 / sigma : 0;
        while (o < end && sigma > 0) {
            if (sigma >= 255) { bytecode(data, o); bytecode(data, o); }
            else {
                uint8_t b = data[o++];
                if ((uint64_t)(b / sigma) + 1 == rc) bytecode(data, o);
            }
            runs++;
        }
        run_counts[i] = runs;
    }
}

// Pass 2: fill CSR arrays given exclusive prefix pointers from pass 1.
// edge_node gets absolute successor GBWT node ids; run_rank the edge rank,
// run_len the run length (>= 1).
void panindex_gbwt_fill(const uint8_t* data, int64_t data_len,
                        const int64_t* starts, int64_t n_rec,
                        const int64_t* edge_ptr, const int64_t* run_ptr,
                        int64_t* edge_node, int64_t* edge_off,
                        int32_t* run_rank, int64_t* run_len,
                        int32_t n_threads) {
#ifdef _OPENMP
    if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel for schedule(dynamic, 1024)
#endif
    for (int64_t i = 0; i < n_rec; i++) {
        int64_t o = starts[i];
        int64_t end = (i + 1 < n_rec) ? starts[i + 1] : data_len;
        if (o >= end) continue;
        uint64_t sigma = bytecode(data, o);
        int64_t eb = edge_ptr[i];
        uint64_t prev = 0;
        for (uint64_t e = 0; e < sigma; e++) {
            prev += bytecode(data, o);
            edge_node[eb + (int64_t)e] = (int64_t)prev;
            edge_off[eb + (int64_t)e] = (int64_t)bytecode(data, o);
        }
        int64_t rb = run_ptr[i];
        uint64_t rc = (sigma > 0 && sigma < 255) ? 256 / sigma : 0;
        while (o < end && sigma > 0) {
            uint64_t c, l;
            if (sigma >= 255) { c = bytecode(data, o); l = bytecode(data, o) + 1; }
            else {
                uint8_t b = data[o++];
                c = b % sigma;
                l = b / sigma + 1;
                if (l == rc) l += bytecode(data, o);
            }
            run_rank[rb] = (int32_t)c;
            run_len[rb] = (int64_t)l;
            rb++;
        }
    }
}

}  // extern "C"

namespace {

inline int varint_size(uint64_t v) {
    int n = 1;
    while (v >= 0x80) { v >>= 7; n++; }
    return n;
}

inline void varint_write(uint8_t* out, int64_t& o, uint64_t v) {
    while (v >= 0x80) { out[o++] = (uint8_t)(v | 0x80); v >>= 7; }
    out[o++] = (uint8_t)v;
}

}  // namespace

extern "C" {

// Encode records (CSR arrays -> gbwt Run/ByteCode byte stream), the inverse
// of panindex_gbwt_fill. pass=0 computes per-record byte sizes; pass=1 writes
// bytes at rec_off (exclusive prefix of the sizes). Edge nodes are absolute;
// deltas are emitted. Empty records (no edges) produce zero bytes, matching
// the gbwt convention for unused node ids.
void panindex_gbwt_encode(const int64_t* edge_ptr, const int64_t* edge_node,
                          const int64_t* edge_off, const int64_t* run_ptr,
                          const int32_t* run_rank, const int64_t* run_len,
                          int64_t n_rec, int64_t* rec_size,
                          const int64_t* rec_off, uint8_t* out,
                          int32_t pass, int32_t n_threads) {
#ifdef _OPENMP
    if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel for schedule(dynamic, 1024)
#endif
    for (int64_t i = 0; i < n_rec; i++) {
        int64_t e0 = edge_ptr[i], e1 = edge_ptr[i + 1];
        uint64_t sigma = (uint64_t)(e1 - e0);
        if (sigma == 0) {  // unused node: a lone sigma=0 byte
            if (pass == 0) rec_size[i] = 1; else out[rec_off[i]] = 0;
            continue;
        }
        uint64_t rc = (sigma < 255) ? 256 / sigma : 0;
        if (pass == 0) {
            int64_t sz = varint_size(sigma);
            uint64_t prev = 0;
            for (int64_t e = e0; e < e1; e++) {
                sz += varint_size((uint64_t)edge_node[e] - prev);
                prev = (uint64_t)edge_node[e];
                sz += varint_size((uint64_t)edge_off[e]);
            }
            for (int64_t r = run_ptr[i]; r < run_ptr[i + 1]; r++) {
                uint64_t l = (uint64_t)run_len[r];
                if (sigma >= 255) sz += varint_size((uint64_t)run_rank[r]) + varint_size(l - 1);
                else sz += 1 + (l >= rc ? varint_size(l - rc) : 0);
            }
            rec_size[i] = sz;
        } else {
            int64_t o = rec_off[i];
            varint_write(out, o, sigma);
            uint64_t prev = 0;
            for (int64_t e = e0; e < e1; e++) {
                varint_write(out, o, (uint64_t)edge_node[e] - prev);
                prev = (uint64_t)edge_node[e];
                varint_write(out, o, (uint64_t)edge_off[e]);
            }
            for (int64_t r = run_ptr[i]; r < run_ptr[i + 1]; r++) {
                uint64_t c = (uint64_t)run_rank[r], l = (uint64_t)run_len[r];
                if (sigma >= 255) { varint_write(out, o, c); varint_write(out, o, l - 1); }
                else if (l < rc) out[o++] = (uint8_t)(c + sigma * (l - 1));
                else { out[o++] = (uint8_t)(c + sigma * (rc - 1)); varint_write(out, o, l - rc); }
            }
        }
    }
}

}  // extern "C"

namespace {

// LF step over the decoded table: (comp record, offset) -> (succ node, succ
// offset). run_cum = exclusive within-record prefix of run_len; occ_before =
// occurrences of the run's rank earlier in its record (both precomputed,
// vectorized, in gbwt_table.py). Binary search over the record's runs.
struct Table {
    const int64_t* edge_ptr;
    const int64_t* edge_node;
    const int64_t* edge_off;
    const int64_t* run_ptr;
    const int32_t* run_rank;
    const int64_t* run_cum;
    const int64_t* occ_before;
};

inline void lf_step(const Table& t, int64_t comp, int64_t off,
                    int64_t& succ_node, int64_t& succ_off) {
    int64_t lo = t.run_ptr[comp], hi = t.run_ptr[comp + 1];
    // last run with run_cum <= off
    while (lo + 1 < hi) {
        int64_t mid = (lo + hi) >> 1;
        if (t.run_cum[mid] <= off) lo = mid; else hi = mid;
    }
    int32_t rank = t.run_rank[lo];
    int64_t e = t.edge_ptr[comp] + rank;
    succ_node = t.edge_node[e];
    succ_off = t.edge_off[e] + t.occ_before[lo] + (off - t.run_cum[lo]);
}

}  // namespace

extern "C" {

// Extract the node visits of each sequence (gbwt::GBWT::extract semantics:
// start at record 0 offset seq_id, chase LF until the endmarker).
// pass=0: count visits per sequence into visit_counts.
// pass=1: fill `visits` at visit_ptr offsets (node ids, path order).
void panindex_gbwt_extract(const int64_t* edge_ptr, const int64_t* edge_node,
                           const int64_t* edge_off, const int64_t* run_ptr,
                           const int32_t* run_rank, const int64_t* run_cum,
                           const int64_t* occ_before, int64_t gbwt_offset,
                           const int64_t* seq_ids, int64_t n_seqs,
                           int64_t* visit_counts, const int64_t* visit_ptr,
                           int64_t* visits, int32_t pass, int32_t n_threads) {
    Table t{edge_ptr, edge_node, edge_off, run_ptr, run_rank, run_cum, occ_before};
#ifdef _OPENMP
    if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel for schedule(dynamic)
#endif
    for (int64_t s = 0; s < n_seqs; s++) {
        int64_t node, off;
        lf_step(t, 0, seq_ids[s], node, off);
        int64_t k = 0;
        int64_t* out = (pass == 1) ? visits + visit_ptr[s] : nullptr;
        while (node != 0) {
            if (out) out[k] = node;
            k++;
            lf_step(t, node - gbwt_offset, off, node, off);
        }
        if (pass == 0) visit_counts[s] = k;
    }
}

}  // extern "C"
