"""K-mer anchoring and run extension (the reference's coverage-building
phases, re-designed as level-synchronous batched array ops).

Anchoring (replaces the recursive per-thread DFS of
kmers_to_bplustree_worker, algorithm.hpp:134-226): maintain a frontier of
(BWT interval, partial key); each level extends every frontier entry by all
four bases with ONE batched LF over the whole frontier, pruning empty
intervals. After k levels, join surviving k-mers against the unique-kmer
index with a sort-based lookup. This is the natural data-parallel form of
the enumeration - on TPU each level is a single batched rank kernel.

Extension (replaces extend_kmers_bfs_parallel, algorithm.hpp:231-375):
level-synchronous BFS where every live run steps one base left - within its
node, or across in-edges when exactly one predecessor base is deterministic -
with batched LF for all runs at once and a coverage bitmap standing in for
the B+-tree's overlap rejection.
"""

from __future__ import annotations

import numpy as np

from ..formats.gbz import GBZ
from ..models.rindex import RIndex
from ..utils.alphabet import BYTE_TO_CODE, SIGMA


def _lf_batch(idx: RIndex, lo: np.ndarray, hi: np.ndarray, code: int):
    """Batched LF over intervals [lo, hi] for one symbol code."""
    start = idx.rank(lo, code)
    inside = idx.rank(hi + 1, code) - start
    nlo = start + idx.C[code]
    nhi = nlo + inside - 1
    return nlo, nhi, inside > 0


def anchor_kmers(idx: RIndex, keys: np.ndarray, positions: np.ndarray, k: int):
    """Enumerate all k-mers with nonempty BWT interval; anchor those present
    in the unique index. Returns (run_start, run_len, pos_enc) arrays.

    keys must be sorted (output of core/kmers.unique_kmers).
    """
    lo = np.zeros(1, dtype=np.int64)
    hi = np.full(1, idx.n - 1, dtype=np.int64)
    key = np.zeros(1, dtype=np.int64)
    # backward search builds kmers right-to-left: after d levels the partial
    # key holds the d rightmost characters (prepend semantics of
    # `base + current_kmer`, algorithm.hpp:159)
    for depth in range(k):
        los, his, kys = [], [], []
        for base, code2 in [(0, 1), (1, 2), (2, 3), (3, 5)]:  # A,C,G,T codes
            nlo, nhi, ok = _lf_batch(idx, lo, hi, code2)
            los.append(nlo[ok])
            his.append(nhi[ok])
            # base occupies the high bits for the leftmost char: since we
            # prepend, shift previous key right? No - keys pack leftmost
            # char in the highest bits; char added at depth d is at
            # position (k-1-d) from the right in final orientation...
            # prepending char c to a suffix S of length d gives key
            # c << (2*d) | key(S)
            kys.append((base << (2 * depth)) | key[ok])
        lo = np.concatenate(los)
        hi = np.concatenate(his)
        key = np.concatenate(kys)
    # join against unique kmers
    j = np.searchsorted(keys, key)
    j_c = np.clip(j, 0, len(keys) - 1)
    hit = (len(keys) > 0) & (keys[j_c] == key)
    return lo[hit], (hi - lo + 1)[hit], positions[j_c[hit]]


def predecessor_map(gbz: GBZ):
    """For every oriented node (gbwt node id), the list of (pred gbwt node,
    pred base) - derived by flipping successor edges (follow_edges backwards,
    algorithm.hpp:311)."""
    from ..formats.gbz import node_seq

    preds: dict[int, list[tuple[int, int]]] = {}
    for nid in gbz.graph.node_ids:
        for orient in (0, 1):
            node = 2 * int(nid) + orient
            try:
                rec = gbz.index.record(node)
            except Exception:
                continue
            for succ, _ in rec.edges:
                if succ == 0:
                    continue
                # edge node->succ means flip(succ)->flip(node); predecessors
                # of succ include node
                preds.setdefault(succ, []).append(node)
    out = {}
    for node, plist in preds.items():
        entries = []
        for p in set(plist):
            seq = node_seq(gbz, p >> 1, bool(p & 1))
            entries.append((p, seq[-1]))
        out[node] = entries
    return out


def extend_runs(gbz: GBZ, idx: RIndex, run_start, run_len, pos_enc,
                max_rounds: int = 10**9):
    """BFS-extend anchored runs one base left per round; returns augmented
    (run_start, run_len, pos_enc) plus the coverage bitmap."""
    from ..formats.gbz import node_seq

    n = idx.n
    covered = np.zeros(n, dtype=bool)
    for s, l in zip(run_start.tolist(), run_len.tolist()):
        covered[s : s + l] = True

    preds = predecessor_map(gbz)
    seqs = {int(nid): gbz.graph.sequences[i] for nid, i in gbz.graph.seq_index().items()}

    out_start = [run_start]
    out_len = [run_len]
    out_pos = [pos_enc]

    cur_start, cur_len, cur_pos = run_start, run_len, pos_enc
    rounds = 0
    while len(cur_start) and rounds < max_rounds:
        rounds += 1
        # candidate extensions: within a node there is one; at a node start
        # the run FANS OUT to one candidate per base carried by exactly one
        # predecessor node (the reference's per-base loop over base_to_nodes,
        # algorithm.hpp:324-355 - several bases can each be deterministic)
        src = []    # index into cur_* arrays
        bases = []  # predecessor base byte
        npos = []   # predecessor packed graph position
        for i, p in enumerate(cur_pos.tolist()):
            nid, rev, off = p >> 11, (p >> 10) & 1, p & 0x3FF
            if off > 0:
                seq = node_seq(gbz, nid, bool(rev))
                src.append(i)
                bases.append(seq[off - 1])
                npos.append((nid << 11) | (rev << 10) | (off - 1))
            else:
                node = 2 * nid + rev
                by_base: dict[int, list[int]] = {}
                for pn, pb in preds.get(node, []):
                    by_base.setdefault(pb, []).append(pn)
                for b, nodes in sorted(by_base.items()):
                    if len(nodes) == 1:  # deterministic base
                        pn = nodes[0]
                        pnid, prev_ = pn >> 1, pn & 1
                        plen = len(seqs[pnid])
                        src.append(i)
                        bases.append(b)
                        npos.append((pnid << 11) | (prev_ << 10) | (plen - 1))
        src = np.array(src, dtype=np.int64)
        npos = np.array(npos, dtype=np.int64)
        codes = BYTE_TO_CODE[np.array(bases, dtype=np.int64)].astype(np.int64)
        nlo = np.zeros(len(src), dtype=np.int64)
        nhi = np.zeros(len(src), dtype=np.int64)
        good = np.zeros(len(src), dtype=bool)
        for c in np.unique(codes):
            m = codes == c
            s_m = cur_start[src[m]]
            lo2, hi2, nz = _lf_batch(idx, s_m, s_m + cur_len[src[m]] - 1, int(c))
            nlo[m], nhi[m] = lo2, hi2
            good[m] = nz
        # accept candidates whose target range is fully uncovered (the
        # B+-tree's insert_success overlap rejection)
        acc_s, acc_l, acc_p = [], [], []
        for i in np.flatnonzero(good):
            s, e = int(nlo[i]), int(nhi[i])
            if not covered[s : e + 1].any():
                covered[s : e + 1] = True
                acc_s.append(s)
                acc_l.append(e - s + 1)
                acc_p.append(int(npos[i]))
        cur_start = np.array(acc_s, dtype=np.int64)
        cur_len = np.array(acc_l, dtype=np.int64)
        cur_pos = np.array(acc_p, dtype=np.int64)
        if len(cur_start):
            out_start.append(cur_start)
            out_len.append(cur_len)
            out_pos.append(cur_pos)
    return (np.concatenate(out_start), np.concatenate(out_len),
            np.concatenate(out_pos), covered)
