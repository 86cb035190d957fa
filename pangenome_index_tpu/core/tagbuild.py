"""Tag-array construction (build_tags pipeline).

The reference builds tags in four phases (src/build_tags.cpp): unique 31-mer
indexing, kmer -> BWT-interval anchoring, BFS extension, then an O(N)
psi-walk traversal that fills every remaining gap with the ground-truth path
position and run-length-encodes the result (algorithm.hpp:378-593). The
traversal *asserts* that anchored/extended tags equal the ground truth
(algorithm.hpp:446-461), so the final array is exactly

    tag[row] = graph position of the character at the suffix start of row

for every non-endmarker BWT row, RLE-compressed in row order.

Our construction computes that directly: the r-index build already derives
the full SA (lane-batched psi walk), and the GBZ paths give every character's
graph position, so tagging is a single vectorized gather + RLE - no B+-tree,
no mutexes (replaces bplus_tree.hpp entirely, cf. SURVEY §2 row 9). The
anchored pipeline (unique kmers / interval anchoring / extension) is still
implemented in core/anchor.py for coverage statistics and API parity.

Output matches the reference's algorithm-format stream byte-for-byte
(tests/test_tagbuild.py vs xy_bidirectional.tags).
"""

from __future__ import annotations

import sys

import numpy as np

from ..formats.gbz import GBZ
from ..models.rindex import RIndex, build_rindex
from ..models.tagarray import TagArray


#: byte-level reverse-complement LUT (identity off ACGTN)
_COMP_LUT = np.arange(256, dtype=np.uint8)
for _a, _b in zip(b"ACGTacgt", b"TGCAtgca"):
    _COMP_LUT[_a] = _b


def graph_arrays(gbz: GBZ):
    """(blob, starts, lens, first_node): all node sequences as one uint8 blob
    with per-node offsets - the array form of GBWTGraph.sequences (cached)."""
    ga = getattr(gbz, "_graph_arrays", None)
    if ga is None:
        seqs = gbz.graph.sequences
        lens = np.fromiter((len(s) for s in seqs), np.int64, len(seqs))
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        blob = np.frombuffer(b"".join(seqs), np.uint8)
        ga = (blob, starts, lens, int(gbz.graph.node_ids[0]))
        object.__setattr__(gbz, "_graph_arrays", ga)
    return ga


def _expand_visits(gbz: GBZ, visits: np.ndarray):
    """Per-character expansion of a flat node-visit array: returns
    (vi, offs, nid, rev, char_counts) where vi indexes visits per character
    and offs is the within-node offset."""
    _, _, lens, first = graph_arrays(gbz)
    nid = visits >> 1
    rev = (visits & 1).astype(np.int64)
    vl = lens[nid - first]
    vi = np.repeat(np.arange(len(visits), dtype=np.int64), vl)
    base = np.cumsum(vl) - vl
    offs = np.arange(int(vl.sum()), dtype=np.int64) - base[vi]
    return vi, offs, nid, rev, vl


def visits_to_tags(gbz: GBZ, visits: np.ndarray) -> np.ndarray:
    """Compact-packed graph position of every character along the visits."""
    vi, offs, nid, rev, _ = _expand_visits(gbz, visits)
    return (nid[vi] << 11) | (rev[vi] << 10) | offs


def visits_to_text(gbz: GBZ, visits: np.ndarray) -> np.ndarray:
    """Concatenated oriented node sequences along the visits (uint8)."""
    blob, starts, lens, first = graph_arrays(gbz)
    vi, offs, nid, rev, _ = _expand_visits(gbz, visits)
    row = nid[vi] - first
    fwd = starts[row] + offs
    bwd = starts[row] + lens[row] - 1 - offs
    ch = blob[np.where(rev[vi] == 1, bwd, fwd)]
    return np.where(rev[vi] == 1, _COMP_LUT[ch], ch)


def path_tag_array(gbz: GBZ, seq_id: int, seq_index: dict[int, int] | None = None
                   ) -> np.ndarray:
    """Compact-packed graph position of every character of sequence seq_id
    (terminator excluded), in path order."""
    visits = np.array(gbz.index.extract(seq_id), np.int64)
    return visits_to_tags(gbz, visits)


def text_seq_map(gbz: GBZ, n_seq: int) -> list[int]:
    """GBWT sequence id of each text sequence. Text sequence i is GBWT
    sequence i when the text contains both strands (the bidirectional
    workflow, README.md:74-96); forward-strand-only texts (two_contig_graph
    fixtures) contain only the even GBWT sequences."""
    if n_seq == gbz.index.sequences:
        return list(range(n_seq))
    if 2 * n_seq == gbz.index.sequences:
        return [2 * i for i in range(n_seq)]
    raise ValueError(f"text has {n_seq} sequences but GBWT has {gbz.index.sequences}")


def tags_per_row(gbz: GBZ, idx: RIndex) -> np.ndarray:
    """tag[row] for rows [n_seq, n): packed graph positions in BWT row order.

    Array program end to end: one batched record decode + native path walk
    (formats/gbwt_table, vs the reference's per-visit iterator at
    algorithm.hpp:398), one vectorized repeat for per-character positions,
    one gather through the SA."""
    if idx.sa_seq is None:
        raise ValueError("r-index must be built with keep_sa=True")
    n_seq = idx.n_seq
    seq_map = text_seq_map(gbz, n_seq)
    visits, vptr = gbz.index.table().extract_all(np.array(seq_map, np.int64))
    vi, offs, nid, rev, vl = _expand_visits(gbz, visits)
    flat = (nid[vi] << 11) | (rev[vi] << 10) | offs
    # characters per text sequence = sum of node lengths over its visit span
    cum_vl = np.concatenate(([0], np.cumsum(vl)))
    lengths = cum_vl[vptr[1:]] - cum_vl[vptr[:-1]]
    expect = idx.seq_lengths - 1
    if not np.array_equal(lengths, expect):
        raise ValueError(f"path lengths {lengths} != BWT sequence lengths {expect}")
    starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    rows = np.arange(n_seq, idx.n)
    return flat[starts[idx.sa_seq[rows]] + idx.sa_pos[rows]]


def rle(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if values.size == 0:
        return values, np.zeros(0, np.int64)
    boundaries = np.flatnonzero(values[1:] != values[:-1]) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [values.size]))
    return values[starts], (ends - starts).astype(np.int64)


def build_tags(gbz: GBZ, idx: RIndex, chunk: int = 1 << 24) -> TagArray:
    """Tag array over BWT rows [n_seq, n) in the algorithm-format coordinate
    system (positions relative to the first non-endmarker row, matching the
    stream build_tags serializes).

    Chunked form of rle(tags_per_row(...)): the flat per-character tag array
    is filled per visit window and the SA gather + RLE run per row window
    with a boundary-run carry, so peak temporaries are O(chunk) instead of
    the ~40 B/char of one-shot int64 intermediates (vi/offs/rows/gather
    index/pre-RLE tags) - the tags phase set the whole build plane's peak
    RSS (PERF.md). Output equality vs the one-shot spec is tested at
    sub-data chunk sizes (tests/test_tagbuild.py)."""
    if idx.sa_seq is None:
        raise ValueError("r-index must be built with keep_sa=True")
    n_seq = idx.n_seq
    seq_map = text_seq_map(gbz, n_seq)
    visits, vptr = gbz.index.table().extract_all(np.array(seq_map, np.int64))
    _, _, node_lens, first = graph_arrays(gbz)
    nid = visits >> 1
    rev = (visits & 1).astype(np.int64)
    vl = node_lens[nid - first]
    cum_vl = np.concatenate(([0], np.cumsum(vl)))
    lengths = cum_vl[vptr[1:]] - cum_vl[vptr[:-1]]
    expect = idx.seq_lengths - 1
    if not np.array_equal(lengths, expect):
        raise ValueError(f"path lengths {lengths} != BWT sequence lengths {expect}")

    total = int(cum_vl[-1])
    flat = np.empty(total, np.int64)
    packed = (nid << 11) | (rev << 10)
    v0 = 0
    while v0 < len(visits):
        v1 = min(max(int(np.searchsorted(cum_vl, cum_vl[v0] + chunk)), v0 + 1),
                 len(visits))
        a, b = int(cum_vl[v0]), int(cum_vl[v1])
        reps = vl[v0:v1]
        offs = np.arange(b - a, dtype=np.int64) - np.repeat(cum_vl[v0:v1] - a, reps)
        flat[a:b] = np.repeat(packed[v0:v1], reps) | offs
        v0 = v1

    starts = np.concatenate(([0], np.cumsum(lengths)))[:-1]
    out_v, out_l = [], []
    carry_v, carry_l = None, 0
    for s in range(n_seq, idx.n, chunk):
        e = min(idx.n, s + chunk)
        t = flat[starts[np.asarray(idx.sa_seq[s:e], np.int64)] + idx.sa_pos[s:e]]
        v, ln = rle(t)
        if v.size == 0:
            continue
        if carry_v is not None:
            if v[0] == carry_v:
                ln = ln.copy()
                ln[0] += carry_l
            else:
                out_v.append(np.array([carry_v], np.int64))
                out_l.append(np.array([carry_l], np.int64))
        carry_v, carry_l = int(v[-1]), int(ln[-1])
        out_v.append(v[:-1])
        out_l.append(ln[:-1])
    if carry_v is not None:
        out_v.append(np.array([carry_v], np.int64))
        out_l.append(np.array([carry_l], np.int64))
    if not out_v:
        return TagArray.from_runs(np.zeros(0, np.int64), np.zeros(0, np.int64))
    return TagArray.from_runs(np.concatenate(out_v), np.concatenate(out_l))


def build_tags_pipeline(gbz_path: str, rlbwt_path: str, output_path: str,
                        k: int = 31, stats: bool = False) -> int:
    """CLI driver (panidx build-tags): direct SA-based construction; with
    stats=True also runs the anchored pipeline for the coverage fractions the
    reference reports (build_tags.cpp:124-126, 163-165). Per-phase wall-clock
    times are reported on stderr like the reference's chrono prints
    (build_tags.cpp:71-73, 90-92, 135-138, 193-196)."""
    import time

    from ..formats import tags as tagfmt
    from ..formats.gbz import load_gbz
    from ..formats.rlbwt import read_rlbwt

    print("Loading the graph file", file=sys.stderr)
    t = time.perf_counter()
    gbz = load_gbz(gbz_path)
    t = _phase(t, "Loading the graph")
    idx = build_rindex(read_rlbwt(rlbwt_path), keep_sa=True)
    t = _phase(t, "Building the r-index")
    if stats:
        from .anchor import anchor_kmers, extend_runs
        from .kmers import unique_kmers

        keys, pos = unique_kmers(gbz, k)
        print(f"The number of unique kmers in the index is: {len(keys)}", file=sys.stderr)
        t = _phase(t, "Indexing unique kmers")
        rs, rl, rp = anchor_kmers(idx, keys, pos, k)
        covered = int(rl.sum())
        print(f"The fraction of the tag arrays covered by unique kmers is: "
              f"{covered} / {idx.n} = {covered / idx.n}", file=sys.stderr)
        t = _phase(t, "Anchoring kmers")
        _, el, _, _ = extend_runs(gbz, idx, rs, rl, rp, max_rounds=10_000)
        covered2 = int(el.sum())
        print(f"The fraction of the tag arrays covered after extending the kmers is: "
              f"{covered2} / {idx.n} = {covered2 / idx.n}", file=sys.stderr)
        t = _phase(t, "Extending kmers")
    tags = build_tags(gbz, idx)
    t = _phase(t, "Traversing all paths (tag gather + RLE)")
    data = tagfmt.write_algorithm(tags)
    with open(output_path, "wb") as fh:
        fh.write(data)
    _phase(t, "Serializing tag runs")
    print(f"build-tags: {tags.n_runs} runs covering {tags.total} BWT positions",
          file=sys.stderr)
    return 0


def _phase(t0: float, label: str) -> float:
    """Print one per-phase timing line (tracing parity with the reference's
    chrono duration prints) and return the next phase's start time."""
    import time

    t1 = time.perf_counter()
    print(f"{label} took {t1 - t0:.3f} seconds", file=sys.stderr)
    return t1
