"""Host r-index build: oracle-vs-index equality.

Mirrors the reference test strategy (tests/test_rindex.cpp:103-244): build a
naive multi-string BWT from the plaintext fixture and assert the r-index's
decompressed document array (and here, also the full SA) matches.
"""

import numpy as np
import pytest

from pangenome_index_tpu.formats.rlbwt import read_rlbwt, rlbwt_from_text
from pangenome_index_tpu.models.oracle import oracle_from_file
from pangenome_index_tpu.models.rindex import build_rindex
from pangenome_index_tpu.utils.alphabet import BYTE_TO_CODE

FIXTURES = [
    ("med_test.txt", "med_test.rl_bwt"),
    ("bidirectional_test/small_test/test.txt", "bidirectional_test/small_test/test.rl_bwt"),
    ("x.newline_separated", "x.rl_bwt"),
]


@pytest.mark.parametrize("txt,rl", FIXTURES)
def test_rlbwt_matches_oracle_bwt(ref_data, txt, rl):
    oracle = oracle_from_file(ref_data / txt)
    rlbwt = read_rlbwt(ref_data / rl)
    assert bytes(rlbwt.expand()) == oracle.bwt.tobytes()


@pytest.mark.parametrize("txt,rl", FIXTURES)
def test_locate_matches_oracle(ref_data, txt, rl):
    oracle = oracle_from_file(ref_data / txt)
    idx = build_rindex(read_rlbwt(ref_data / rl))
    da = idx.decompress_da()
    np.testing.assert_array_equal(da, oracle.da)
    sa = idx.decompress_sa()
    np.testing.assert_array_equal(idx.seq_offset(sa), oracle.sa_pos)
    # sequence lengths (incl terminator) seen by the walk match the oracle
    assert idx.max_len == int(oracle.seq_lengths.max())


@pytest.mark.parametrize("txt,rl", FIXTURES)
def test_count_matches_naive(ref_data, txt, rl):
    with open(ref_data / txt, "rb") as fh:
        lines = [l for l in fh.read().split(b"\n") if l]
    idx = build_rindex(read_rlbwt(ref_data / rl))
    rng = np.random.default_rng(42)
    for _ in range(50):
        line = lines[rng.integers(len(lines))]
        if len(line) < 4:
            continue
        start = int(rng.integers(0, len(line) - 3))
        plen = int(rng.integers(2, min(12, len(line) - start) + 1))
        pat = line[start : start + plen]
        first, second = idx.count(pat)
        expect = sum(l.count(pat, i) > 0 for l in lines for i in range(len(l)))
        expect = sum(1 for l in lines for i in range(len(l)) if l.startswith(pat, i))
        got = second - first + 1 if second >= first else 0
        assert got == expect, (pat, got, expect)


def test_lf_psi_roundtrip(ref_data):
    idx = build_rindex(read_rlbwt(ref_data / "med_test.rl_bwt"))
    pi = idx.psi_perm()
    # pi is a permutation of [0, n)
    assert np.array_equal(np.sort(pi), np.arange(idx.n))


def test_rlbwt_roundtrip(tmp_path, ref_data):
    from pangenome_index_tpu.formats.rlbwt import write_rlbwt

    for name in ["med_test.rl_bwt", "x.rl_bwt", "bidirectional_test/contigs_xy.rl_bwt"]:
        rl = read_rlbwt(ref_data / name)
        out = tmp_path / "out.rl_bwt"
        write_rlbwt(out, rl)
        assert out.read_bytes() == (ref_data / name).read_bytes()


@pytest.mark.parametrize("txt,rl", FIXTURES)
def test_native_walk_matches_numpy_walk(ref_data, txt, rl, monkeypatch):
    """The O(r)-memory native psi walk (src/cpp/psi_walk.cpp) must place the
    exact samples/last structures of the numpy full-permutation walk."""
    from pangenome_index_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    rlbwt = read_rlbwt(ref_data / rl)
    a = build_rindex(rlbwt, keep_sa=True)
    monkeypatch.setenv("PANIDX_NO_NATIVE_WALK", "1")
    b = build_rindex(rlbwt, keep_sa=True)
    assert a.max_len == b.max_len
    for fld in ("samples", "last_sorted", "last_to_run",
                "sa_seq", "sa_pos", "seq_lengths"):
        np.testing.assert_array_equal(getattr(a, fld), getattr(b, fld))


def test_sa_hint_int32_packing_no_overflow():
    """build_rindex keeps int32 SA-hint arrays (the native SA-IS output
    below 2^31 rows) but must pack samples in int64: seq_id * max_len can
    exceed int32 even when every input value fits it."""
    from pangenome_index_tpu.formats.rlbwt import rlbwt_from_text

    # 3 tiny sequences; claim a huge max sequence length via seq_lengths so
    # packed values pass 2^31 (packing never indexes by seq_len, only max())
    bwt = b"\nA\nC\nG"  # any 6-row BWT with 3 endmarkers
    rl = rlbwt_from_text(bwt)
    big = 1 << 30
    seq_of_row = np.array([0, 1, 1, 2, 2, 0], np.int32)
    pos_of_row = np.array([5, 0, 1, 0, 1, 3], np.int32)
    seq_len = np.array([big, 2, 2], np.int64)
    idx = build_rindex(rl, _sa_hint=(seq_of_row, pos_of_row, seq_len))
    expect = seq_of_row.astype(np.int64) * big + pos_of_row
    # samples are taken at run heads (every run is unit here except none)
    np.testing.assert_array_equal(idx.samples, expect[idx.run_start])
    assert idx.samples.dtype == np.int64
    assert (idx.samples >= 0).all() and idx.samples.max() > 2**31
