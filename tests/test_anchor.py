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
