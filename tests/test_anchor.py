"""Anchored pipeline (unique kmers -> interval anchoring -> extension):
anchored tags must agree with the ground-truth tag array wherever defined
(the invariant the reference asserts at algorithm.hpp:446-461)."""

import numpy as np
import pytest

from pangenome_index_tpu.core.anchor import anchor_kmers, extend_runs
from pangenome_index_tpu.core.kmers import unique_kmers
from pangenome_index_tpu.core.tagbuild import tags_per_row
from pangenome_index_tpu.formats.gbz import load_gbz
from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.rindex import build_rindex

K = 31


@pytest.fixture(scope="module")
def setup(ref_data):
    gbz = load_gbz(ref_data / "bidirectional_test/xy.gbz")
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"), keep_sa=True)
    truth = tags_per_row(gbz, idx)  # rows n_seq..n-1
    return gbz, idx, truth


def test_unique_kmers_are_unique_positions(setup):
    gbz, idx, _ = setup
    keys, pos = unique_kmers(gbz, K)
    assert len(keys) == len(np.unique(keys))
    assert len(keys) > 0


def test_anchored_runs_match_truth(setup):
    gbz, idx, truth = setup
    keys, pos = unique_kmers(gbz, K)
    rs, rl, rp = anchor_kmers(idx, keys, pos, K)
    assert len(rs) > 0
    n_seq = idx.n_seq
    covered = 0
    for s, l, p in zip(rs.tolist(), rl.tolist(), rp.tolist()):
        for t in range(l):
            row = s + t
            assert row >= n_seq
            assert truth[row - n_seq] == p, (row, p, truth[row - n_seq])
        covered += l
    frac = covered / idx.n
    assert 0.05 < frac <= 1.0  # tiny fixture: ~9% of rows anchored by k=31


def _extend_scalar_reference(gbz, idx, rs, rl, rp):
    """Independent scalar re-implementation of the reference's BFS extension
    (extend_kmers_bfs_parallel, algorithm.hpp:231-375): FIFO queue; within a
    node one predecessor; at a node start one candidate PER base carried by
    exactly one predecessor node (fan-out); acceptance = no overlap with any
    covered row (insert_success). Single queue = the deterministic
    serialization extend_runs uses."""
    from collections import deque

    from pangenome_index_tpu.core.anchor import predecessor_map
    from pangenome_index_tpu.formats.gbz import node_seq
    from pangenome_index_tpu.utils.alphabet import BYTE_TO_CODE

    preds = predecessor_map(gbz)
    covered = np.zeros(idx.n, dtype=bool)
    for s, l in zip(rs.tolist(), rl.tolist()):
        covered[s : s + l] = True
    out = []
    q = deque(zip(rs.tolist(), rl.tolist(), rp.tolist()))
    fanout_seen = 0
    while q:
        s, l, p = q.popleft()
        nid, rev, off = p >> 11, (p >> 10) & 1, p & 0x3FF
        if off > 0:
            seq = node_seq(gbz, nid, bool(rev))
            cands = [(seq[off - 1], (nid << 11) | (rev << 10) | (off - 1))]
        else:
            by_base = {}
            for pn, pb in preds.get(2 * nid + rev, []):
                by_base.setdefault(pb, []).append(pn)
            cands = []
            for b, nodes in sorted(by_base.items()):
                if len(nodes) == 1:
                    pn = nodes[0]
                    plen = len(node_seq(gbz, pn >> 1, bool(pn & 1)))
                    cands.append((b, ((pn >> 1) << 11) | ((pn & 1) << 10) | (plen - 1)))
            fanout_seen += len(cands) >= 2
        for b, np_enc in cands:
            c = int(BYTE_TO_CODE[b])
            lo = int(idx.rank(np.array([s]), c)[0]) + int(idx.C[c])
            size = int(idx.rank(np.array([s + l]), c)[0]) + int(idx.C[c]) - lo
            if size <= 0:
                continue
            if covered[lo : lo + size].any():
                continue
            covered[lo : lo + size] = True
            out.append((lo, size, np_enc))
            q.append((lo, size, np_enc))
    return out, covered, fanout_seen


def test_extension_equals_scalar_reference_semantics(setup):
    gbz, idx, truth = setup
    keys, pos = unique_kmers(gbz, K)
    rs, rl, rp = anchor_kmers(idx, keys, pos, K)
    es, el, ep, covered = extend_runs(gbz, idx, rs, rl, rp)
    got = set(zip(es.tolist(), el.tolist(), ep.tolist())) - set(zip(rs.tolist(), rl.tolist(), rp.tolist()))
    exp_runs, exp_cov, fanout_seen = _extend_scalar_reference(gbz, idx, rs, rl, rp)
    assert got == set(exp_runs)
    np.testing.assert_array_equal(covered, exp_cov)
    # the fixture must actually exercise the per-base fan-out
    assert fanout_seen > 0


def test_extension_matches_truth_and_grows_coverage(setup):
    gbz, idx, truth = setup
    keys, pos = unique_kmers(gbz, K)
    rs, rl, rp = anchor_kmers(idx, keys, pos, K)
    base_cov = rl.sum()
    es, el, ep, covered = extend_runs(gbz, idx, rs, rl, rp, max_rounds=50)
    assert el.sum() > base_cov
    n_seq = idx.n_seq
    for s, l, p in zip(es.tolist(), el.tolist(), ep.tolist()):
        for t in range(l):
            assert truth[s + t - n_seq] == p, (s + t, p, truth[s + t - n_seq])
