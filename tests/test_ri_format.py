"""`.ri` codec: the gold test is byte-identical re-creation of the committed
fixture test_data/bidirectional_test/xy.ri from its source rl_bwt, which
validates both construction semantics (samples, last, blocks) and every SDSL
sub-structure layout (int_vector, sd_vector, select_support_mcl)."""

import numpy as np
import pytest

from pangenome_index_tpu.formats import ri
from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.rindex import build_rindex


def test_load_committed_xy_ri(ref_data):
    idx = ri.load_file(ref_data / "bidirectional_test/xy.ri")
    built = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    np.testing.assert_array_equal(idx.run_sym, built.run_sym)
    np.testing.assert_array_equal(idx.run_len, built.run_len)
    np.testing.assert_array_equal(idx.samples, built.samples)
    np.testing.assert_array_equal(idx.last_sorted, built.last_sorted)
    np.testing.assert_array_equal(idx.last_to_run, built.last_to_run)
    assert idx.n == built.n and idx.max_len == built.max_len and idx.n_seq == built.n_seq


def test_serialize_legacy_byte_identical(ref_data):
    # the committed xy.ri is the legacy format (flags=0)
    built = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    data = ri.serialize_legacy(built)
    expect = (ref_data / "bidirectional_test/xy.ri").read_bytes()
    assert len(data) == len(expect)
    if data != expect:
        diff = next(i for i in range(len(data)) if data[i] != expect[i])
        raise AssertionError(f"first differing byte at offset {diff}: {data[diff-8:diff+8].hex()} vs {expect[diff-8:diff+8].hex()}")


def test_encoded_roundtrip_through_reference_loader_shape(ref_data):
    # encoded serialization loads back losslessly (covers EncodedBlock layout)
    built = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    loaded = ri.load(ri.serialize_encoded(built))
    np.testing.assert_array_equal(loaded.run_sym, built.run_sym)
    np.testing.assert_array_equal(loaded.run_len, built.run_len)


@pytest.mark.parametrize("fmt", ["encoded", "legacy"])
def test_roundtrip(ref_data, fmt):
    built = build_rindex(read_rlbwt(ref_data / "med_test.rl_bwt"))
    data = ri.serialize_encoded(built) if fmt == "encoded" else ri.serialize_legacy(built)
    loaded = ri.load(data)
    np.testing.assert_array_equal(loaded.run_sym, built.run_sym)
    np.testing.assert_array_equal(loaded.run_len, built.run_len)
    np.testing.assert_array_equal(loaded.cum, built.cum)
    np.testing.assert_array_equal(loaded.samples, built.samples)
    np.testing.assert_array_equal(loaded.C, built.C)
