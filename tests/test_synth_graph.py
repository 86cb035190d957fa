"""synth_graph_gbz: the scale-bench graph generator is a valid GBZ whose
paths spell exactly the haplotype texts."""

import numpy as np

from pangenome_index_tpu.core.tagbuild import build_tags, visits_to_text
from pangenome_index_tpu.formats.gbz import load_gbz
from pangenome_index_tpu.formats.gbz_write import save_gbz
from pangenome_index_tpu.formats.rlbwt import rlbwt_from_text
from pangenome_index_tpu.models.oracle import oracle_from_lines
from pangenome_index_tpu.models.rindex import build_rindex_from_sa
from pangenome_index_tpu.utils.synth import synth_graph_gbz


def test_paths_spell_haplotypes():
    gbz, lines = synth_graph_gbz(5_000, 3, site_rate=0.01, seed=11, max_node_len=64)
    t = gbz.index.table()
    for h in range(3):
        visits, ptr = t.extract_all(np.array([2 * h]))
        assert visits_to_text(gbz, visits).tobytes() == lines[h]
        # reverse orientation spells the reverse complement
        rvis, _ = t.extract_all(np.array([2 * h + 1]))
        rc = visits_to_text(gbz, rvis).tobytes()
        comp = bytes.maketrans(b"ACGT", b"TGCA")
        assert rc == lines[h].translate(comp)[::-1]


def test_tag_build_over_synth_graph(tmp_path):
    gbz, lines = synth_graph_gbz(3_000, 2, site_rate=0.01, seed=3, max_node_len=50)
    oracle = oracle_from_lines(lines)
    from pangenome_index_tpu.models.rindex import build_rindex

    idx = build_rindex(rlbwt_from_text(oracle.bwt.tobytes()),
                       _sa_hint=(oracle.da, oracle.sa_pos, oracle.seq_lengths),
                       keep_sa=True)
    tags = build_tags(gbz, idx)
    assert tags.total == idx.n - idx.n_seq
    # ground truth: the tag of each BWT row is the graph position of its
    # suffix start; spot-check by re-spelling text from tags
    from pangenome_index_tpu.core.tagbuild import graph_arrays, tags_per_row

    per_row = tags_per_row(gbz, idx)
    blob, starts, lens_, first = graph_arrays(gbz)
    rows = np.arange(idx.n_seq, idx.n)
    nid = per_row >> 11
    rev = (per_row >> 10) & 1
    off = per_row & 0x3FF
    ch_f = blob[starts[nid - first] + off]
    ch_r = blob[starts[nid - first] + lens_[nid - first] - 1 - off]
    comp_lut = np.arange(256, dtype=np.uint8)
    for a, b in zip(b"ACGT", b"TGCA"):
        comp_lut[a] = b
    got = np.where(rev == 1, comp_lut[ch_r], ch_f)
    # the character at the suffix start of row = text[sa]
    text = b"".join(ln + b"\n" for ln in lines)
    flat_starts = np.concatenate(([0], np.cumsum(idx.seq_lengths)))[:-1]
    sa = flat_starts[idx.sa_seq[rows]] + idx.sa_pos[rows]
    want = np.frombuffer(text, np.uint8)[sa]
    assert np.array_equal(got, want)


def test_round_trips_through_gbz_file(tmp_path):
    gbz, _ = synth_graph_gbz(2_000, 2, site_rate=0.01, seed=9, max_node_len=40)
    p = tmp_path / "synth.gbz"
    save_gbz(gbz, p)
    back = load_gbz(p)
    assert back.index.sequences == gbz.index.sequences
    t0, t1 = gbz.index.table(), back.index.table()
    seqs = np.arange(gbz.index.sequences)
    v0, p0 = t0.extract_all(seqs)
    v1, p1 = t1.extract_all(seqs)
    assert np.array_equal(v0, v1) and np.array_equal(p0, p1)
