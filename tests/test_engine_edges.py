"""Device engine edge cases: degenerate reads, N bases, tiny/odd batches."""

import jax.numpy as jnp
import numpy as np
import pytest

from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.mems import find_all_mems
from pangenome_index_tpu.models.rindex import build_rindex
from pangenome_index_tpu.ops.mems import find_mems_batch
from pangenome_index_tpu.ops.rank import count
from pangenome_index_tpu.ops.tables import rindex_to_device
from pangenome_index_tpu.utils.alphabet import BYTE_TO_CODE


@pytest.fixture(scope="module")
def setup(ref_data):
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    return idx, rindex_to_device(idx)


def _pack(reads):
    L = max((len(r) for r in reads), default=1)
    codes = np.zeros((len(reads), max(L, 1)), np.int32)
    lens = np.array([len(r) for r in reads], np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = BYTE_TO_CODE[np.frombuffer(r, np.uint8)]
    return jnp.asarray(codes), jnp.asarray(lens)


def test_degenerate_reads(setup):
    idx, t = setup
    reads = [b"A", b"", b"N" * 10, b"ACGT", b"T" * 200]
    codes, lens = _pack(reads)
    res = find_mems_batch(t, codes, lens, 5, 1, capacity=8)
    for i, r in enumerate(reads):
        host = find_all_mems(idx, r, 5, 1)
        assert int(res.count[i]) == len(host)


def test_single_lane_batch(setup):
    idx, t = setup
    codes, lens = _pack([b"GATTACAGATTACA"])
    res = find_mems_batch(t, codes, lens, 4, 1, capacity=8)
    host = find_all_mems(idx, b"GATTACAGATTACA", 4, 1)
    assert int(res.count[0]) == len(host)


def test_count_with_invalid_symbols(setup):
    idx, t = setup
    reads = [b"ACGT\x00XX", b"NNNN", b"ACGT"]
    codes, lens = _pack(reads)
    f, s = count(t, codes, lens)
    for i, r in enumerate(reads):
        assert (int(f[i]), int(s[i])) == idx.count(r)


def test_mems_min_occ_huge(setup):
    idx, t = setup
    codes, lens = _pack([b"ACGTACGTACGTACGT"])
    res = find_mems_batch(t, codes, lens, 4, 10**6, capacity=8)
    assert int(res.count[0]) == len(find_all_mems(idx, b"ACGTACGTACGTACGT", 4, 10**6))


@pytest.mark.parametrize("min_occ", [1, 2, 5])
@pytest.mark.parametrize("capacity", [1, 3])
def test_seeded_loop_matches_scalar_randomized(setup, min_occ, capacity):
    """Randomized stress of the round-3 loop (shared phase-5 seed block,
    packed emission buffers, tiny capacities): per-MEM equality with the
    scalar reference for every (min_occ, capacity), seeded and unseeded."""
    from pangenome_index_tpu.ops.mertable import build_mer_table, read_mer_keys

    idx, t = setup
    tc = rindex_to_device(idx, checkpoint=True)
    rng = np.random.default_rng(77)
    reads = []
    alpha = np.frombuffer(b"ACGTN", np.uint8)
    for i in range(24):
        L = int(rng.integers(8, 40))
        reads.append(alpha[rng.integers(0, 5, L)].tobytes())
    codes, lens = _pack(reads)
    min_len = 6
    mer_m = 4
    mt = build_mer_table(idx, mer_m)
    mk, mv = read_mer_keys(np.asarray(codes), np.asarray(lens), mer_m)
    for kw in ({}, dict(mer_table=jnp.asarray(mt, tc.pos_dtype),
                        mer_keys=jnp.asarray(mk), mer_valid=jnp.asarray(mv),
                        mer_m=mer_m)):
        res = find_mems_batch(tc, codes, lens, min_len, min_occ,
                              capacity=capacity, **kw)
        for i, r in enumerate(reads):
            want = find_all_mems(idx, r, min_len, min_occ)
            assert int(res.count[i]) == len(want)
            assert bool(res.overflow[i]) == (len(want) > capacity)
            for m, mm in enumerate(want[:capacity]):
                got = (int(res.start[i, m]), int(res.end[i, m]),
                       int(res.bwt_start[i, m]), int(res.size[i, m]))
                assert got == (mm.start, mm.end, mm.bwt_start, mm.size)
