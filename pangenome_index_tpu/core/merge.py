"""merge_tags: combine per-chromosome tag arrays into whole-genome tags.

The reference's "distributed" layer (src/merge_tags.cpp, 869 LoC): 32 threads
walk 500-run windows of the whole-genome r-index with locateNext, route every
BWT position to its component's tag file through a condvar turn-ticket
protocol, and re-run-length-encode. The correctness invariant it exploits:
restricted to one component, whole-genome BWT rows appear in the same
relative order as that component's own BWT rows, so each per-chromosome tag
stream is consumed strictly sequentially.

Here the same invariant becomes pure array ops:

  1. seq-of-row for every BWT row via run-parallel locateNext chains
     (lanes = runs, replacing merge_tags.cpp:307-356)
  2. component routing: union-find over GBWT record edges
     (node_to_component, algorithm.hpp:600-618) + first path node per
     sequence (merge_tags.cpp:508-515)
  3. one stable counting pass assigns stream indices; a gather materializes
     tag-per-row; endmarker rows get tag (0,0,0) (merge_tags.cpp:620-624)
  4. RLE + 511-splitting + the compact width rule 11 + bits(max node id)
     (merge_tags.cpp:630-638)
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..formats.gbz import GBZ
from ..models.rindex import RIndex
from ..models.tagarray import TagArray
from .tagbuild import rle


def seq_of_rows(idx: RIndex) -> np.ndarray:
    """Sequence id of every BWT row via run-parallel locateNext chains."""
    n, r = idx.n, idx.n_runs
    out = np.zeros(n, dtype=np.int64)
    cur = idx.samples.copy()
    lens = idx.run_len
    max_len = int(lens.max())
    active = np.ones(r, dtype=bool)
    t = 0
    while active.any():
        rows = idx.run_start[active] + t
        out[rows] = cur[active] // idx.max_len
        t += 1
        active = active & (lens > t)
        live = active.copy()
        if live.any():
            cur_live = cur[live]
            nxt = idx.locate_next(cur_live)
            cur[live] = nxt
    return out


def node_components(gbz: GBZ) -> dict[int, int]:
    """Weakly-connected components over the graph's edges (successor lists
    from GBWT records), smallest node id as representative ordering - matches
    gbwtgraph::weakly_connected_components enumeration order closely enough
    for routing (components are identified by their member nodes)."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    g = gbz.index
    for node_id in gbz.graph.node_ids:
        for orient in (0, 1):
            node = 2 * int(node_id) + orient
            try:
                rec = g.record(node)
            except Exception:
                continue
            for succ, _ in rec.edges:
                if succ != 0:
                    union(int(node_id), succ >> 1)
    return {int(n): find(int(n)) for n in gbz.graph.node_ids}


def merge_tags(gbz: GBZ, idx: RIndex, comp_tags: dict[int, TagArray]) -> TagArray:
    """comp_tags: component representative -> that component's tag array
    (algorithm coordinates: positions for the component's non-endmarker rows
    in its own BWT order)."""
    n, n_seq = idx.n, idx.n_seq
    comp_of_node = node_components(gbz)

    # sequence -> component via the first node of its path
    if n_seq == gbz.index.sequences:
        seq_map = list(range(n_seq))
    elif 2 * n_seq == gbz.index.sequences:
        seq_map = [2 * i for i in range(n_seq)]
    else:
        raise ValueError("sequence count mismatch between text and GBWT")
    seq_comp = np.array(
        [comp_of_node[gbz.index.extract(sid)[0] >> 1] for sid in seq_map], dtype=np.int64
    )

    srows = seq_of_rows(idx)
    comp_per_row = seq_comp[srows]

    comps = sorted(comp_tags)
    tag_per_row = np.zeros(n, dtype=np.int64)
    rows = np.arange(n_seq, n)
    crows = comp_per_row[rows]
    for c in comps:
        mask = crows == c
        stream = comp_tags[c]
        per_pos = np.repeat(stream.pos_enc, stream.run_lengths())
        if mask.sum() != len(per_pos):
            raise ValueError(
                f"component {c}: {mask.sum()} rows but stream covers {len(per_pos)}"
            )
        tag_per_row[rows[mask]] = per_pos
    vals, lens = rle(tag_per_row)
    return TagArray.from_runs(vals, lens)


def merge_tags_pipeline(gbz_path: str, ri_path: str, tags_dir: str, output: str) -> int:
    from ..formats import tags as tagfmt
    from ..formats import ri as rifmt
    from ..formats.gbz import load_gbz

    gbz = load_gbz(gbz_path)
    idx = rifmt.load_file(ri_path)
    comp_of_node = node_components(gbz)
    comp_tags: dict[int, TagArray] = {}
    for name in sorted(os.listdir(tags_dir)):
        if not name.endswith(".tags"):
            continue
        with open(os.path.join(tags_dir, name), "rb") as fh:
            raw = fh.read()
        tags = tagfmt.read_algorithm(raw)
        first_node = int(tags.pos_enc[0]) >> 11
        comp = comp_of_node[first_node]
        comp_tags[comp] = tags
        print(f"{name}: component {comp}, {tags.n_runs} runs", file=sys.stderr)
    merged = merge_tags(gbz, idx, comp_tags)
    with open(output, "wb") as fh:
        fh.write(tagfmt.write_compressed_sdsl(
            merged, width=11 + max(int(n) for n in gbz.graph.node_ids).bit_length()))
    print(f"merge-tags: {merged.n_runs} runs covering {merged.total} positions",
          file=sys.stderr)
    return 0
