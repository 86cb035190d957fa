"""Flat decoded-record table for the GBWT: the build plane's array form.

The reference walks GBWT records through per-record iterators
(`gbz.index.extract` at algorithm.hpp:398, record loops at
merge_tags.cpp:508-515, algorithm.hpp:600-618). At chromosome scale
(millions of records, ~100 haplotypes) a per-visit interpreter loop is hours
of Python time, so the build plane here decodes EVERY record ONCE into flat
CSR arrays and all downstream phases (path extraction, component detection,
tag construction, k-mer enumeration) become array programs:

  edge_ptr[c]..edge_ptr[c+1]  edges of record c: absolute successor node id
                              (edge_node) + BWT offset (edge_off)
  run_ptr[c]..run_ptr[c+1]    runs of record c: edge rank (run_rank) and
                              length (run_len), plus two derived prefix sums
                              that make LF a binary search:
  run_cum[j]                  within-record position before run j
  occ_before[j]               occurrences of run j's rank earlier in its record

LF(c, off): find the run j covering off (binary search on run_cum), then
successor = edges[run_rank[j]], offset = edge_off + occ_before[j] +
(off - run_cum[j]) - the same arithmetic as Record.lf (formats/gbz.py) with
the scan replaced by precomputed sums.

Decode and path extraction run in native C++ when the toolchain is available
(src/cpp/gbwt_decode.cpp, OpenMP over records/sequences); a pure-numpy
fallback keeps every environment working and pins equality in tests.
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass

import numpy as np

from .gbz import GBWT, parse_record


def _segmented_exclusive_cumsum(values: np.ndarray, group_key: np.ndarray) -> np.ndarray:
    """Exclusive prefix sum of `values` within runs of equal `group_key`
    (keys need not be pre-grouped; stable sort preserves in-group order)."""
    order = np.argsort(group_key, kind="stable")
    v = values[order]
    cs = np.cumsum(v) - v
    k = group_key[order]
    is_start = np.concatenate(([True], k[1:] != k[:-1]))
    base = np.maximum.accumulate(np.where(is_start, cs, 0))
    out = np.empty_like(cs)
    out[order] = cs - base
    return out


@dataclass
class RecordTable:
    """All GBWT records as flat CSR arrays (see module docstring)."""

    offset: int                # gbwt node id offset: comp c>0 <-> node c+offset
    edge_ptr: np.ndarray       # [n_rec+1] int64
    edge_node: np.ndarray      # int64, absolute successor gbwt node ids
    edge_off: np.ndarray       # int64
    run_ptr: np.ndarray        # [n_rec+1] int64
    run_rank: np.ndarray       # int32
    run_len: np.ndarray        # int64
    run_cum: np.ndarray        # int64, exclusive within-record prefix of run_len
    occ_before: np.ndarray     # int64, prior occurrences of this run's rank

    @property
    def n_rec(self) -> int:
        return len(self.edge_ptr) - 1

    # ---------------------------------------------------------------- decode

    @classmethod
    def from_gbwt(cls, g: GBWT, use_native: bool | None = None) -> "RecordTable":
        starts = np.ascontiguousarray(g.record_starts, np.int64)
        data = np.frombuffer(g.bwt_data, np.uint8)
        lib = _native_lib() if use_native in (None, True) else None
        if use_native is True and lib is None:
            raise RuntimeError("native gbwt decoder unavailable")
        if lib is not None:
            ec = np.zeros(len(starts), np.int64)
            rc = np.zeros(len(starts), np.int64)
            lib.panindex_gbwt_count(
                _ptr(data, ctypes.c_uint8), ctypes.c_int64(data.size),
                _ptr(starts, ctypes.c_int64), ctypes.c_int64(len(starts)),
                _ptr(ec, ctypes.c_int64), _ptr(rc, ctypes.c_int64), ctypes.c_int32(0))
            edge_ptr = np.concatenate(([0], np.cumsum(ec)))
            run_ptr = np.concatenate(([0], np.cumsum(rc)))
            edge_node = np.zeros(edge_ptr[-1], np.int64)
            edge_off = np.zeros(edge_ptr[-1], np.int64)
            run_rank = np.zeros(run_ptr[-1], np.int32)
            run_len = np.zeros(run_ptr[-1], np.int64)
            lib.panindex_gbwt_fill(
                _ptr(data, ctypes.c_uint8), ctypes.c_int64(data.size),
                _ptr(starts, ctypes.c_int64), ctypes.c_int64(len(starts)),
                _ptr(edge_ptr, ctypes.c_int64), _ptr(run_ptr, ctypes.c_int64),
                _ptr(edge_node, ctypes.c_int64), _ptr(edge_off, ctypes.c_int64),
                _ptr(run_rank, ctypes.c_int32), _ptr(run_len, ctypes.c_int64),
                ctypes.c_int32(0))
        else:
            raw = g.bwt_data
            en, eo, rr, rl, ec_l, rc_l = [], [], [], [], [], []
            for i in range(len(starts)):
                s = int(starts[i])
                e = int(starts[i + 1]) if i + 1 < len(starts) else len(raw)
                rec = parse_record(raw, s, e) if s < e else None
                if rec is None:
                    ec_l.append(0)
                    rc_l.append(0)
                    continue
                ec_l.append(rec.sigma)
                rc_l.append(len(rec.runs))
                for node, off in rec.edges:
                    en.append(node)
                    eo.append(off)
                for c, l in rec.runs:
                    rr.append(c)
                    rl.append(l)
            edge_ptr = np.concatenate(([0], np.cumsum(np.array(ec_l, np.int64))))
            run_ptr = np.concatenate(([0], np.cumsum(np.array(rc_l, np.int64))))
            edge_node = np.array(en, np.int64)
            edge_off = np.array(eo, np.int64)
            run_rank = np.array(rr, np.int32)
            run_len = np.array(rl, np.int64)

        n_runs_per = np.diff(run_ptr)
        rec_of_run = np.repeat(np.arange(len(starts), dtype=np.int64), n_runs_per)
        cs = np.cumsum(run_len) - run_len
        # within-record exclusive position of each run (empty records repeat 0x)
        safe_starts = np.minimum(run_ptr[:-1], max(len(run_len) - 1, 0))
        run_cum = cs - np.repeat(cs[safe_starts] if len(run_len) else
                                 np.zeros(len(safe_starts), np.int64), n_runs_per)
        occ_before = _segmented_exclusive_cumsum(
            run_len, (rec_of_run << 32) | run_rank.astype(np.int64))
        return cls(offset=g.offset, edge_ptr=edge_ptr, edge_node=edge_node,
                   edge_off=edge_off, run_ptr=run_ptr, run_rank=run_rank,
                   run_len=run_len, run_cum=run_cum, occ_before=occ_before)

    # ------------------------------------------------------------------- LF

    def lf(self, comps: np.ndarray, offs: np.ndarray):
        """Vectorized LF: (record comp, offset) -> (successor node, offset)."""
        comps = np.asarray(comps, np.int64)
        offs = np.asarray(offs, np.int64)
        lo = self.run_ptr[comps]
        hi = self.run_ptr[comps + 1]
        # per-element binary search over each record's run_cum slice (a
        # global searchsorted would leak across record boundaries): j ends as
        # the last run of its record with run_cum <= off
        j = lo.copy()
        hi2 = hi.copy()
        while True:
            gap = hi2 - j
            if not (gap > 1).any():
                break
            mid = (j + hi2) >> 1
            take = self.run_cum[np.minimum(mid, max(len(self.run_cum) - 1, 0))] <= offs
            j = np.where((gap > 1) & take, mid, j)
            hi2 = np.where((gap > 1) & ~take, mid, hi2)
        rank = self.run_rank[j].astype(np.int64)
        e = self.edge_ptr[comps] + rank
        node = self.edge_node[e]
        off2 = self.edge_off[e] + self.occ_before[j] + (offs - self.run_cum[j])
        return node, off2

    def node_to_comp(self, node: np.ndarray) -> np.ndarray:
        node = np.asarray(node, np.int64)
        return np.where(node == 0, 0, node - self.offset)

    def first_nodes(self, seq_ids: np.ndarray) -> np.ndarray:
        """First path node of each sequence: one LF on record 0 (replaces
        extract(sid)[0] which walked the whole path)."""
        node, _ = self.lf(np.zeros(len(seq_ids), np.int64),
                          np.asarray(seq_ids, np.int64))
        return node

    # ------------------------------------------------------------ extraction

    def extract_all(self, seq_ids) -> tuple[np.ndarray, np.ndarray]:
        """Node visits of every sequence (gbwt::GBWT::extract), concatenated.
        Returns (visits, ptr) with sequence s occupying visits[ptr[s]:ptr[s+1]].
        Native C++ walker when available (OpenMP over sequences)."""
        seq_ids = np.ascontiguousarray(seq_ids, np.int64)
        lib = _native_lib()
        if lib is not None:
            args = (
                _ptr(self.edge_ptr, ctypes.c_int64), _ptr(self.edge_node, ctypes.c_int64),
                _ptr(self.edge_off, ctypes.c_int64), _ptr(self.run_ptr, ctypes.c_int64),
                _ptr(self.run_rank, ctypes.c_int32), _ptr(self.run_cum, ctypes.c_int64),
                _ptr(self.occ_before, ctypes.c_int64), ctypes.c_int64(self.offset),
                _ptr(seq_ids, ctypes.c_int64), ctypes.c_int64(len(seq_ids)),
            )
            counts = np.zeros(len(seq_ids), np.int64)
            none = _ptr(counts, ctypes.c_int64)  # unused slot in each pass
            lib.panindex_gbwt_extract(*args, _ptr(counts, ctypes.c_int64), none,
                                      none, ctypes.c_int32(0), ctypes.c_int32(0))
            ptr = np.concatenate(([0], np.cumsum(counts)))
            visits = np.zeros(ptr[-1], np.int64)
            lib.panindex_gbwt_extract(*args, _ptr(counts, ctypes.c_int64),
                                      _ptr(ptr, ctypes.c_int64),
                                      _ptr(visits, ctypes.c_int64),
                                      ctypes.c_int32(1), ctypes.c_int32(0))
            return visits, ptr
        # numpy lockstep fallback: all sequences advance one LF per step
        seqs = np.asarray(seq_ids, np.int64)
        node, off = self.lf(np.zeros(len(seqs), np.int64), seqs)
        out: list[list[int]] = [[] for _ in seqs]
        alive = node != 0
        while alive.any():
            for i in np.flatnonzero(alive):
                out[i].append(int(node[i]))
            nn, no = self.lf(self.node_to_comp(node[alive]), off[alive])
            node[alive], off[alive] = nn, no
            alive = node != 0
        ptr = np.concatenate(([0], np.cumsum([len(o) for o in out]))).astype(np.int64)
        visits = np.array([v for o in out for v in o], np.int64)
        return visits, ptr

    # ------------------------------------------------------------ components

    def component_labels(self, first_node: int, n_nodes: int) -> np.ndarray:
        """Weakly-connected-component representative (smallest member graph
        node id) for graph nodes [first_node, first_node + n_nodes), from the
        successor edges of all records (algorithm.hpp:600-618 semantics)."""
        n_rec = self.n_rec
        counts = np.diff(self.edge_ptr)
        src_comp = np.repeat(np.arange(n_rec, dtype=np.int64), counts)
        src_node = np.where(src_comp == 0, 0, src_comp + self.offset)
        dst_node = self.edge_node
        keep = (src_node != 0) & (dst_node != 0)
        u = (src_node[keep] >> 1) - first_node
        v = (dst_node[keep] >> 1) - first_node
        try:
            from scipy.sparse import coo_matrix
            from scipy.sparse.csgraph import connected_components

            m = coo_matrix((np.ones(len(u), np.int8), (u, v)),
                           shape=(n_nodes, n_nodes))
            _, labels = connected_components(m, directed=True, connection="weak")
        except Exception:  # pragma: no cover - scipy unavailable
            labels = np.arange(n_nodes, dtype=np.int64)
            for a, b in zip(u.tolist(), v.tolist()):
                ra, rb = a, b
                while labels[ra] != ra:
                    ra = labels[ra]
                while labels[rb] != rb:
                    rb = labels[rb]
                if ra != rb:
                    labels[max(ra, rb)] = min(ra, rb)
            for i in range(n_nodes):
                r = i
                while labels[r] != r:
                    r = labels[r]
                labels[i] = r
        reps = np.full(int(labels.max()) + 1 if len(labels) else 1, np.iinfo(np.int64).max)
        np.minimum.at(reps, labels, np.arange(n_nodes, dtype=np.int64) + first_node)
        return reps[labels]


def _native_lib():
    from .. import native

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "panindex_gbwt_count"):
        return None
    return lib


def _ptr(a: np.ndarray, t):
    return a.ctypes.data_as(ctypes.POINTER(t))
