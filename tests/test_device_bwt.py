"""Device-side BWT construction equals the host oracle on all fixtures."""

import numpy as np
import pytest

from pangenome_index_tpu.models.oracle import oracle_from_file
from pangenome_index_tpu.ops.bwt import bwt_from_lines_device


@pytest.mark.parametrize("txt", [
    "med_test.txt",
    "bidirectional_test/small_test/test.txt",
    "x.newline_separated",
    "bidirectional_test/contigs_xy",
])
def test_device_bwt_matches_oracle(ref_data, txt):
    oracle = oracle_from_file(ref_data / txt)
    with open(ref_data / txt, "rb") as fh:
        lines = [l for l in fh.read().split(b"\n") if l]
    bwt, da, sa_pos, seq_lengths = bwt_from_lines_device(lines)
    np.testing.assert_array_equal(bwt, oracle.bwt)
    np.testing.assert_array_equal(da, oracle.da)
    np.testing.assert_array_equal(sa_pos, oracle.sa_pos)
    np.testing.assert_array_equal(seq_lengths, oracle.seq_lengths)
