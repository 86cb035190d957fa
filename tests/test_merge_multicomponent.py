"""Streamed merge on a synthetic multi-component genome: file-cursor inputs
(O(chunk) resident), output equal to the fully-resident in-memory merge."""

import os

import numpy as np
import pytest

from pangenome_index_tpu.core.merge import merge_tags, merge_tags_pipeline
from pangenome_index_tpu.core.tagbuild import build_tags
from pangenome_index_tpu.formats import ri as rifmt, tags as tagfmt
from pangenome_index_tpu.formats.gbz_write import save_gbz
from pangenome_index_tpu.formats.rlbwt import rlbwt_from_text
from pangenome_index_tpu.models.rindex import build_rindex
from pangenome_index_tpu.utils.synth import synth_multi_component_gbz


def _index_of(lines):
    from pangenome_index_tpu import native
    from pangenome_index_tpu.models.oracle import oracle_from_lines

    if native.available():
        bwt, da, sa_pos, seq_lengths = native.build_bwt_native(lines)
    else:
        o = oracle_from_lines(lines)
        bwt, da, sa_pos, seq_lengths = o.bwt, o.da, o.sa_pos, o.seq_lengths
    return build_rindex(rlbwt_from_text(bwt.tobytes()),
                        _sa_hint=(da, sa_pos, seq_lengths), keep_sa=True)


@pytest.mark.parametrize("fmt", ["algorithm", "sdsl"])
def test_multicomponent_streamed_merge(tmp_path, fmt):
    whole, subs, comp_lines = synth_multi_component_gbz(
        20_000, 3, n_comps=3, site_rate=0.01, seed=4)
    all_lines = [l for lines in comp_lines for l in lines]
    idx = _index_of(all_lines)

    comp_tags = {}
    d = tmp_path / "tags"
    d.mkdir()
    for c, (sub, lines) in enumerate(zip(subs, comp_lines)):
        sub_idx = _index_of(lines)
        tags = build_tags(sub, sub_idx)
        comp = int(tags.pos_enc[0]) >> 11  # routed properly inside the merge
        comp_tags[c] = tags
        data = (tagfmt.write_algorithm(tags) if fmt == "algorithm"
                else tagfmt.write_compressed_sdsl(tags))
        (d / f"comp{c}.tags").write_bytes(data)

    save_gbz(whole, tmp_path / "whole.gbz")
    (tmp_path / "whole.ri").write_bytes(rifmt.serialize_encoded(idx))

    # chunk_runs + window both far smaller than the inputs: the pipeline must
    # still produce the exact fully-resident merge result
    merge_tags_pipeline(str(tmp_path / "whole.gbz"), str(tmp_path / "whole.ri"),
                        str(d), str(tmp_path / "merged.tags"),
                        window=4096, chunk_runs=257)
    got = tagfmt.load_tags_file(tmp_path / "merged.tags")

    from pangenome_index_tpu.core.merge import node_components
    comp_of_node = node_components(whole)
    want = merge_tags(whole, idx, {
        comp_of_node[int(t.pos_enc[0]) >> 11]: t for t in comp_tags.values()})
    np.testing.assert_array_equal(
        np.repeat(got.pos_enc, got.run_lengths()),
        np.repeat(want.pos_enc, want.run_lengths()))
