"""Device-sharded tag merge == host merge on the two_contig fixture."""

import jax
import numpy as np
import pytest

from pangenome_index_tpu.core.merge import merge_tags, node_components, seq_of_rows
from pangenome_index_tpu.core.tagbuild import build_tags
from pangenome_index_tpu.formats.gbz import load_gbz
from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.rindex import build_rindex
from pangenome_index_tpu.parallel.merge import merge_tags_device
from pangenome_index_tpu.parallel.sharding import make_mesh


@pytest.mark.parametrize("n_data", [2, 4, 8])
def test_device_merge_matches_host(ref_data, n_data):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    base = ref_data / "two_contig_graph"
    gbz = load_gbz(base / "xy.gbz")
    idx = build_rindex(read_rlbwt(base / "contigs_XY.rl_bwt"), keep_sa=True)
    comp_of_node = node_components(gbz)
    comp_tags = {}
    for g, rl in [("x.gbz", "contigs_chrX.rl_bwt"), ("y.gbz", "contigs_chrY.rl_bwt")]:
        sub_gbz = load_gbz(base / g)
        sub_idx = build_rindex(read_rlbwt(base / rl), keep_sa=True)
        tags = build_tags(sub_gbz, sub_idx)
        comp = comp_of_node[int(tags.pos_enc[0]) >> 11]
        comp_tags[comp] = np.repeat(tags.pos_enc, tags.run_lengths())

    host_merged = merge_tags(gbz, idx, {
        c: __import__("pangenome_index_tpu.models.tagarray", fromlist=["TagArray"]).TagArray(
            pos_enc=v, bwt_start=np.arange(len(v), dtype=np.int64), total=len(v))
        for c, v in comp_tags.items()
    })
    host_per_pos = np.repeat(host_merged.pos_enc, host_merged.run_lengths())

    # component per row; endmarker rows = -1
    seq_map = [2 * i for i in range(idx.n_seq)] if 2 * idx.n_seq == gbz.index.sequences else list(range(idx.n_seq))
    seq_comp = np.array([comp_of_node[gbz.index.extract(s)[0] >> 1] for s in seq_map])
    srows = seq_of_rows(idx)
    comp_per_row = seq_comp[srows]
    comp_per_row[: idx.n_seq] = -1

    mesh = make_mesh(n_data, 8 // n_data)
    dev = merge_tags_device(mesh, comp_per_row, comp_tags)
    np.testing.assert_array_equal(dev, host_per_pos)
