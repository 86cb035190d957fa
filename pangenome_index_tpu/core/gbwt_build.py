"""GBWT/GBZ construction from haplotype paths (in-memory).

The reference consumes GBZ files produced by the external gbwt/gbwtgraph
toolchain; this module builds the same structures directly from a node set
and path list, giving the framework a self-contained graph-index build and a
generator for synthetic-graph tests of the tag pipeline.

GBWT semantics (matching formats/gbz.py's Record.lf / extract):
  * sequences start at the endmarker record (node 0), offset = sequence id
  * lf(v, i) -> (w, j): w is the node following visit i of v; the visits of
    each node are ordered by their *reversed path prefix* (predecessor node,
    then predecessor's visit order, recursively; sequence id breaks ties),
    which makes j = edge_offset(v->w) + #(earlier visits of v continuing to w)
  * edge_offset(v->w) = #visits of w whose predecessor node id < v

Construction here materializes every visit, sorts each node's visits by
reversed prefix (with sequence-id tiebreak), and emits records with the
gbwt Run/ByteCode codecs. Validated by re-extracting the committed fixtures'
paths from a reconstruction and byte-comparing tag builds
(tests/test_gbwt_build.py).
"""

from __future__ import annotations

import numpy as np

from ..formats import bytecode
from ..formats.gbz import GBZ, GBWT, GBWTGraph, REVCOMP


def _encode_record(edges: list[tuple[int, int]], runs: list[tuple[int, int]]) -> bytes:
    out = bytearray()
    bytecode.write_value(out, len(edges))
    prev = 0
    for node, off in edges:
        bytecode.write_value(out, node - prev)
        prev = node
        bytecode.write_value(out, off)
    sigma = len(edges)
    rc = (256 // sigma) if 0 < sigma < 255 else 0
    for c, l in runs:
        if sigma >= 255:
            bytecode.write_value(out, c)
            bytecode.write_value(out, l - 1)
        elif l < rc:
            out.append(c + sigma * (l - 1))
        else:
            out.append(c + sigma * (rc - 1))
            bytecode.write_value(out, l - rc)
    return bytes(out)


def gbwt_from_paths(paths: list[list[int]], alphabet_size: int | None = None) -> GBWT:
    """Build a GBWT from paths of gbwt node ids (2*node + orientation).

    paths[i] is sequence i (callers wanting a bidirectional index pass both
    orientations explicitly, like the fixtures).
    """
    n_seq = len(paths)
    max_node = max((max(p) for p in paths if p), default=1)
    if alphabet_size is None:
        alphabet_size = max_node + 1
    offset = min((min(p) for p in paths if p), default=2) - 1

    # visits[v] = list of (sort_key, seq, step); sort key = reversed prefix
    # (node ids walking backward from the visit), with the sequence id
    # appended so identical prefixes order by sequence - mirroring the
    # endmarker record's run order
    visits: dict[int, list[tuple[tuple, int, int]]] = {}
    for seq, p in enumerate(paths):
        for step, v in enumerate(p):
            prefix = tuple(p[step - 1 :: -1]) if step > 0 else ()
            key = prefix + (0, seq)
            visits.setdefault(v, []).append((key, seq, step))
    for v in visits:
        visits[v].sort()

    # per-node visit order lookup: (seq, step) -> offset within node
    order_of: dict[tuple[int, int], int] = {}
    for v, vs in visits.items():
        for i, (_, seq, step) in enumerate(vs):
            order_of[(seq, step)] = i

    comp_count = alphabet_size - offset
    records: list[bytes] = []

    def successors(v: int, vs):
        succ: dict[int, int] = {}
        for _, seq, step in vs:
            p = paths[seq]
            w = p[step + 1] if step + 1 < len(p) else 0
            succ.setdefault(w, 0)
        return sorted(succ)

    # endmarker record: every sequence starts here in sequence order
    first_nodes = sorted({p[0] for p in paths if p})
    edges0 = []
    for w in first_nodes:
        # offset of the first v=0-predecessor visit at w: visits at w sorted
        # by reversed prefix; a path-initial visit has key (0, seq) which
        # sorts after... the reversed prefix of a path-initial visit is
        # empty -> key = (0, seq): tuples starting with 0 sort before any
        # node id >= 2, so initial visits come first at w, ordered by seq
        edges0.append((w, 0))
    runs0 = []
    for seq, p in enumerate(paths):
        c = first_nodes.index(p[0]) if p else 0
        if runs0 and runs0[-1][0] == c:
            runs0[-1] = (c, runs0[-1][1] + 1)
        else:
            runs0.append((c, 1))
    records.append(_encode_record(edges0, runs0))

    for comp in range(1, comp_count):
        v = comp + offset
        vs = visits.get(v)
        if not vs:
            records.append(_encode_record([], []))
            continue
        succs = successors(v, vs)
        # edge offsets: #visits at w with predecessor node < v
        edges = []
        for w in succs:
            if w == 0:
                edges.append((0, 0))
                continue
            cnt = 0
            for _, seq, step in visits.get(w, []):
                pred = paths[seq][step - 1] if step > 0 else 0
                if pred < v:
                    cnt += 1
            edges.append((w, cnt))
        runs = []
        for _, seq, step in vs:
            p = paths[seq]
            w = p[step + 1] if step + 1 < len(p) else 0
            c = succs.index(w)
            if runs and runs[-1][0] == c:
                runs[-1] = (c, runs[-1][1] + 1)
            else:
                runs.append((c, 1))
        records.append(_encode_record(edges, runs))

    data = b"".join(records)
    starts = np.zeros(len(records), dtype=np.int64)
    np.cumsum([len(r) for r in records[:-1]], out=starts[1:])
    size = sum(len(p) + 1 for p in paths)
    return GBWT(sequences=n_seq, size=size, offset=offset,
                alphabet_size=alphabet_size, flags=GBWT.FLAG_BIDIRECTIONAL,
                record_starts=starts, bwt_data=data)


def gbz_from_graph(node_seqs: dict[int, bytes], paths: list[list[int]]) -> GBZ:
    """In-memory GBZ from forward node sequences + gbwt-node-id paths."""
    index = gbwt_from_paths(paths)
    node_ids = np.array(sorted(node_seqs), dtype=np.int64)
    first = int(node_ids[0])
    full = [node_seqs.get(i, b"") for i in range(first, int(node_ids[-1]) + 1)]
    graph = GBWTGraph(nodes=2 * len(full), flags=0, sequences=full,
                      node_ids=np.arange(first, int(node_ids[-1]) + 1, dtype=np.int64))
    return GBZ(tags=[b"source", b"pangenome_index_tpu"], index=index, graph=graph)


def random_pangenome_gbz(rng: np.random.Generator, n_nodes: int = 40,
                         n_paths: int = 3, bidirectional: bool = True) -> GBZ:
    """A random variation-graph-like GBZ: a backbone chain with bubble
    branches; paths pick a branch at each bubble."""
    node_seqs: dict[int, bytes] = {}
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    nid = 1
    backbone: list[tuple[int, int | None]] = []  # (main node, alt node or None)
    while nid <= n_nodes - 1:
        ln = int(rng.integers(1, 12))
        node_seqs[nid] = rng.choice(alphabet, ln).tobytes()
        main = nid
        nid += 1
        alt = None
        if nid <= n_nodes - 1 and rng.random() < 0.4:
            node_seqs[nid] = rng.choice(alphabet, int(rng.integers(1, 12))).tobytes()
            alt = nid
            nid += 1
        backbone.append((main, alt))
    paths = []
    for _ in range(n_paths):
        fwd = []
        for main, alt in backbone:
            pick = alt if (alt is not None and rng.random() < 0.5) else main
            fwd.append(2 * pick)
        paths.append(fwd)
        if bidirectional:
            paths.append([n ^ 1 for n in reversed(fwd)])
    return gbz_from_graph(node_seqs, paths)
