"""Pallas scalar-prefetch rank prototype: interpreter-mode correctness on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.rindex import build_rindex
from pangenome_index_tpu.ops.pallas_rank import rank6_pallas
from pangenome_index_tpu.ops.tables import rindex_to_device


def test_pallas_rank6_matches_host(ref_data):
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    t = rindex_to_device(idx, dense=True)
    rng = np.random.default_rng(5)
    pos = rng.integers(0, idx.n + 1, 64)
    got = np.asarray(rank6_pallas(t.rec, t.pos_to_run,
                                  jnp.asarray(pos, t.pos_dtype), interpret=True))
    expect = np.stack([idx.rank6(int(p)) for p in pos])
    np.testing.assert_array_equal(got, expect)
