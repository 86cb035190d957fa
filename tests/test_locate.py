"""Batched locate vs the host SA."""

import jax.numpy as jnp
import numpy as np

from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.rindex import build_rindex
from pangenome_index_tpu.ops.locate import locate_batch
from pangenome_index_tpu.ops.tables import rindex_to_device


def test_locate_batch_matches_sa(ref_data):
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"), keep_sa=True)
    t = rindex_to_device(idx)
    sa_packed = idx.sa_seq * idx.max_len + idx.sa_pos
    rng = np.random.default_rng(2)
    B = 64
    start = rng.integers(0, idx.n - 40, B)
    size = rng.integers(1, 40, B)
    res = locate_batch(t, jnp.asarray(start, t.pos_dtype), jnp.asarray(size, t.pos_dtype), capacity=48)
    for i in range(B):
        cnt = int(res.count[i])
        assert cnt == min(int(size[i]), 48)
        np.testing.assert_array_equal(
            np.asarray(res.positions[i][:cnt]),
            sa_packed[start[i] : start[i] + cnt],
        )
