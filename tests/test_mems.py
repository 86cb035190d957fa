"""MEM finding: FMD property tests + brute-force cross-checks on the
bidirectional fixture (mirrors the reference's CompareSampledKmers FMD
symmetry test, tests/test_rindex.cpp:376-435, and validates the 3-step MEM
algorithm against a text-search oracle)."""

import numpy as np
import pytest

from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.mems import find_all_mems
from pangenome_index_tpu.models.rindex import build_rindex
from pangenome_index_tpu.utils.alphabet import BYTE_TO_CODE

COMP = bytes.maketrans(b"ACGTN", b"TGCAN")


@pytest.fixture(scope="module")
def xy(ref_data):
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    with open(ref_data / "bidirectional_test/contigs_xy", "rb") as fh:
        lines = [l for l in fh.read().split(b"\n") if l]
    return idx, lines


def occ_count(lines, pat):
    return sum(1 for l in lines for i in range(len(l)) if l.startswith(pat, i))


def backward_search(idx, pat):
    bint = (0, 0, idx.n)
    for b in reversed(pat):
        bint = idx.backward_extend(bint, int(BYTE_TO_CODE[b]))
        if bint[2] == 0:
            break
    return bint


def test_fmd_interval_size_matches_text(xy):
    idx, lines = xy
    rng = np.random.default_rng(42)
    for _ in range(100):
        line = lines[int(rng.integers(len(lines)))]
        start = int(rng.integers(0, len(line) - 12))
        kmer = line[start : start + 12]
        bint = backward_search(idx, kmer)
        assert bint[2] == occ_count(lines, kmer)


def test_fmd_symmetry(xy):
    # interval(kmer).forward == interval(revcomp(kmer)).reverse and sizes equal
    idx, lines = xy
    rng = np.random.default_rng(42)
    for _ in range(100):
        line = lines[int(rng.integers(len(lines)))]
        start = int(rng.integers(0, len(line) - 12))
        kmer = line[start : start + 12]
        rc = kmer.translate(COMP)[::-1]
        b1 = backward_search(idx, kmer)
        b2 = backward_search(idx, rc)
        assert b1[2] == b2[2]
        assert b1[0] == b2[1] and b1[1] == b2[0]


def test_forward_equals_backward_of_reverse(xy):
    idx, lines = xy
    rng = np.random.default_rng(1)
    for _ in range(50):
        line = lines[int(rng.integers(len(lines)))]
        start = int(rng.integers(0, len(line) - 10))
        kmer = line[start : start + 10]
        # build interval by forward extension left-to-right
        bint = (0, 0, idx.n)
        for b in kmer:
            bint = idx.forward_extend(bint, int(BYTE_TO_CODE[b]))
        expect = backward_search(idx, kmer)
        assert bint == expect


def _mem_intervals_valid(idx, lines, pattern, mems, min_len, min_occ):
    for m in mems:
        sub = pattern[m.start : m.end]
        assert m.end - m.start >= min_len
        occ = occ_count(lines, sub)
        assert m.size == occ, (sub, m.size, occ)
        assert occ >= min_occ
        # maximality: extending one base left or right (within the read)
        # drops below min_occ
        if m.end < len(pattern):
            assert occ_count(lines, pattern[m.start : m.end + 1]) < min_occ
        if m.start > 0:
            assert occ_count(lines, pattern[m.start - 1 : m.end]) < min_occ


def test_mems_on_fixture_reads(xy, ref_data):
    idx, lines = xy
    reads = [l for l in (ref_data / "bidirectional_test/reads.txt").read_bytes().split(b"\n") if l]
    total = 0
    for read in reads:
        mems = find_all_mems(idx, read, min_len=5, min_occ=1)
        _mem_intervals_valid(idx, lines, read, mems, 5, 1)
        total += len(mems)
    assert total > 0


def test_mems_random_reads(xy):
    idx, lines = xy
    rng = np.random.default_rng(3)
    for _ in range(30):
        # splice two genuine segments to create MEM boundaries
        l1 = lines[int(rng.integers(len(lines)))]
        l2 = lines[int(rng.integers(len(lines)))]
        a = int(rng.integers(0, len(l1) - 30))
        b = int(rng.integers(0, len(l2) - 30))
        read = l1[a : a + 30] + l2[b : b + 30]
        for min_occ in (1, 2):
            mems = find_all_mems(idx, read, min_len=10, min_occ=min_occ)
            _mem_intervals_valid(idx, lines, read, mems, 10, min_occ)


def test_backward_extension_matches_lf(xy):
    # the forward component of each backward_extend step equals an
    # independent LF computation (tests/test_rindex.cpp:288-337)
    idx, lines = xy
    rng = np.random.default_rng(7)
    for _ in range(50):
        line = lines[int(rng.integers(len(lines)))]
        start = int(rng.integers(0, len(line) - 15))
        pat = line[start : start + 15]
        bint = (0, 0, idx.n)
        rng_lf = (0, idx.n - 1)
        for b in reversed(pat):
            code = int(BYTE_TO_CODE[b])
            bint = idx.backward_extend(bint, code)
            rng_lf = idx.lf_range(rng_lf[0], rng_lf[1], code)
            if bint[2] == 0:
                assert rng_lf[0] > rng_lf[1]
                break
            assert bint[0] == rng_lf[0]
            assert bint[2] == rng_lf[1] - rng_lf[0] + 1


def test_mems_with_garbage_read(xy):
    idx, lines = xy
    mems = find_all_mems(idx, b"NNNNNNNNNNNN", min_len=5, min_occ=1)
    assert mems == []
