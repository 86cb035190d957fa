"""GBWT construction: reconstruct the committed fixtures' GBWTs from their
extracted paths and verify extraction round-trips and byte-equal tag builds;
fuzz the tag pipeline on random synthetic graphs."""

import numpy as np
import pytest

from pangenome_index_tpu.core.gbwt_build import gbz_from_graph, random_pangenome_gbz
from pangenome_index_tpu.core.tagbuild import build_tags, tags_per_row
from pangenome_index_tpu.formats.gbz import load_gbz, node_seq
from pangenome_index_tpu.formats.rlbwt import read_rlbwt, rlbwt_from_text
from pangenome_index_tpu.models.oracle import oracle_from_lines
from pangenome_index_tpu.models.rindex import build_rindex, build_rindex_from_sa


@pytest.mark.parametrize("name,rl", [
    ("x.gbz", "contigs_x.rl_bwt"),
    ("xy.gbz", "contigs_xy.rl_bwt"),
])
def test_reconstructed_gbwt_round_trips(ref_data, name, rl):
    real = load_gbz(ref_data / f"bidirectional_test/{name}")
    paths = [real.index.extract(i) for i in range(real.index.sequences)]
    node_seqs = {int(n): real.graph.sequences[i]
                 for i, n in enumerate(real.graph.node_ids) if real.graph.sequences[i]}
    synth = gbz_from_graph(node_seqs, paths)
    # extraction round-trips every path
    for i, p in enumerate(paths):
        assert synth.index.extract(i) == p
    # tag build over the synthetic GBZ equals the real one byte-for-byte
    idx = build_rindex(read_rlbwt(ref_data / f"bidirectional_test/{rl}"), keep_sa=True)
    np.testing.assert_array_equal(tags_per_row(synth, idx), tags_per_row(real, idx))


def test_random_graph_tag_pipeline():
    rng = np.random.default_rng(42)
    for trial in range(5):
        gbz = random_pangenome_gbz(rng, n_nodes=int(rng.integers(10, 50)),
                                   n_paths=int(rng.integers(1, 5)))
        # haplotype text from the graph
        lines = []
        for sid in range(gbz.index.sequences):
            p = gbz.index.extract(sid)
            lines.append(b"".join(node_seq(gbz, n >> 1, bool(n & 1)) for n in p))
        o = oracle_from_lines(lines)
        idx = build_rindex_from_sa(rlbwt_from_text(o.bwt.tobytes()), o.da, o.sa_pos, o.seq_lengths)
        idx.sa_seq, idx.sa_pos, idx.seq_lengths = o.da, o.sa_pos, o.seq_lengths
        tags = build_tags(gbz, idx)
        # ground truth per position: walk each path's characters
        per_pos = np.repeat(tags.pos_enc, tags.run_lengths())
        assert len(per_pos) == idx.n - idx.n_seq
        # every tag decodes to a valid (node, offset) whose base matches the text char
        rows = np.arange(idx.n_seq, idx.n)
        sidx = gbz.graph.seq_index()
        for r_i in rng.choice(len(rows), size=min(60, len(rows)), replace=False):
            row = rows[r_i]
            enc = int(per_pos[row - idx.n_seq])
            nid, rev, off = enc >> 11, (enc >> 10) & 1, enc & 0x3FF
            base = node_seq(gbz, nid, bool(rev))[off]
            seq, pos = int(idx.sa_seq[row]), int(idx.sa_pos[row])
            assert lines[seq][pos] == base


def test_gbz_write_parse_round_trip(ref_data):
    from pangenome_index_tpu.formats.gbz import load_gbz, parse_gbz
    from pangenome_index_tpu.formats.gbz_write import write_gbz
    from pangenome_index_tpu.core.gbwt_build import gbz_from_graph

    real = load_gbz(ref_data / "bidirectional_test/xy.gbz")
    paths = [real.index.extract(i) for i in range(real.index.sequences)]
    node_seqs = {int(n): real.graph.sequences[i]
                 for i, n in enumerate(real.graph.node_ids) if real.graph.sequences[i]}
    back = parse_gbz(write_gbz(gbz_from_graph(node_seqs, paths)))
    for i, p in enumerate(paths):
        assert back.index.extract(i) == p


def test_random_gbz_file_round_trip(tmp_path):
    from pangenome_index_tpu.formats.gbz import load_gbz
    from pangenome_index_tpu.formats.gbz_write import save_gbz

    rng = np.random.default_rng(11)
    g = random_pangenome_gbz(rng, n_nodes=30, n_paths=3)
    save_gbz(g, tmp_path / "synth.gbz")
    back = load_gbz(tmp_path / "synth.gbz")
    for i in range(g.index.sequences):
        assert back.index.extract(i) == g.index.extract(i)


def test_native_encoder_matches_python_fallback(monkeypatch):
    """gbwt_from_paths emits identical bytes through the native record
    encoder (src/cpp/gbwt_decode.cpp) and the per-record Python fallback."""
    import numpy as np

    from pangenome_index_tpu import native
    from pangenome_index_tpu.core import gbwt_build

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    gbz = gbwt_build.random_pangenome_gbz(rng, n_nodes=60, n_paths=4)
    paths = [gbz.index.extract(s) for s in range(gbz.index.sequences)]
    g_native = gbwt_build.gbwt_from_paths(paths)
    monkeypatch.setattr(gbwt_build, "_encode_records_native", lambda *a: None)
    g_py = gbwt_build.gbwt_from_paths(paths)
    assert g_native.bwt_data == g_py.bwt_data
    assert np.array_equal(g_native.record_starts, g_py.record_starts)
