"""Distributed engine on the virtual 8-device CPU mesh: data x model sharded
MEM finding must equal the single-device engine exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.rindex import build_rindex
from pangenome_index_tpu.ops.mems import find_mems_batch
from pangenome_index_tpu.ops.tables import rindex_to_device
from pangenome_index_tpu.parallel.engine import make_distributed_mem_step
from pangenome_index_tpu.parallel.sharding import make_mesh, pad_rindex_tables
from pangenome_index_tpu.utils.alphabet import BYTE_TO_CODE


@pytest.mark.parametrize("n_data,n_model", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_distributed_matches_single(ref_data, n_data, n_model):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    with open(ref_data / "bidirectional_test/contigs_xy", "rb") as fh:
        lines = [l for l in fh.read().split(b"\n") if l]
    rng = np.random.default_rng(5)
    B, L = 16, 40
    reads = []
    for _ in range(B):
        l1 = lines[int(rng.integers(len(lines)))]
        a = int(rng.integers(0, len(l1) - L))
        reads.append(l1[a : a + L])
    codes = np.zeros((B, L), np.int32)
    lens = np.full(B, L, np.int32)
    for i, r in enumerate(reads):
        codes[i, :] = BYTE_TO_CODE[np.frombuffer(r, np.uint8)]

    t_single = rindex_to_device(idx)
    ref = find_mems_batch(t_single, jnp.asarray(codes), jnp.asarray(lens), 10, 1, capacity=16)

    mesh = make_mesh(n_data, n_model)
    t_pad = pad_rindex_tables(idx, n_model)
    step = make_distributed_mem_step(mesh, capacity=16)
    with mesh:
        res, total = step(t_pad, jnp.asarray(codes), jnp.asarray(lens),
                          jnp.asarray(10, t_pad.pos_dtype), jnp.asarray(1, t_pad.pos_dtype))
    assert int(total) == int(np.asarray(ref.count).sum())
    np.testing.assert_array_equal(np.asarray(res.count), np.asarray(ref.count))
    for i in range(B):
        c = int(ref.count[i])
        for f_ref, f_res in zip(ref[:4], res[:4]):
            np.testing.assert_array_equal(np.asarray(f_res)[i, :c], np.asarray(f_ref)[i, :c])
