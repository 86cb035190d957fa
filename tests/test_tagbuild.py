"""build-tags + merge-tags: byte/value equality against committed fixtures
and self-consistency of the per-contig -> merge pipeline vs a direct
whole-genome build."""

import numpy as np
import pytest

from pangenome_index_tpu.core.merge import merge_tags, node_components, seq_of_rows
from pangenome_index_tpu.core.tagbuild import build_tags
from pangenome_index_tpu.formats import bytecode
from pangenome_index_tpu.formats import tags as tagfmt
from pangenome_index_tpu.formats import ri as rifmt
from pangenome_index_tpu.formats.gbz import load_gbz
from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.rindex import build_rindex


def test_build_tags_byte_identical_xy(ref_data):
    gbz = load_gbz(ref_data / "bidirectional_test/xy.gbz")
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"), keep_sa=True)
    data = tagfmt.write_algorithm(build_tags(gbz, idx))
    assert data == (ref_data / "bidirectional_test/xy_bidirectional.tags").read_bytes()


@pytest.mark.parametrize("g,rl,tg", [
    ("x.gbz", "contigs_chrX.rl_bwt", "x"),
    ("y.gbz", "contigs_chrY.rl_bwt", "y"),
])
def test_build_tags_matches_legacy_two_contig(ref_data, g, rl, tg):
    """The two_contig fixtures use the older tag encoding (8-bit length,
    id<<19, no int_vector container). Their first run also carries a stale
    wrong offset (node 69/138 last-character tag) from a pre-assertion build
    of the reference; every other run matches our ground-truth build."""
    base = ref_data / "two_contig_graph"
    gbz = load_gbz(base / g)
    idx = build_rindex(read_rlbwt(base / rl), keep_sa=True)
    built = build_tags(gbz, idx)
    vals = bytecode.decode_stream((base / "tag_arrays_blocks" / f"{tg}.tags").read_bytes())
    roff = vals & 0x3FF
    rrev = (vals >> 10) & 1
    rlen = (vals >> 11) & 0xFF
    rid = vals >> 19
    rpos = roff | (rrev << 10) | (rid << 11)
    assert built.n_runs == len(vals)
    np.testing.assert_array_equal(built.run_lengths(), rlen)
    diff = np.flatnonzero(built.pos_enc != rpos)
    assert len(diff) <= 1 and (len(diff) == 0 or diff[0] == 0)


def test_merge_matches_direct_whole_genome(ref_data):
    base = ref_data / "two_contig_graph"
    gbz_xy = load_gbz(base / "xy.gbz")
    idx_xy = build_rindex(read_rlbwt(base / "contigs_XY.rl_bwt"), keep_sa=True)
    direct = build_tags(gbz_xy, idx_xy)

    comp_of_node = node_components(gbz_xy)
    comp_tags = {}
    for g, rl in [("x.gbz", "contigs_chrX.rl_bwt"), ("y.gbz", "contigs_chrY.rl_bwt")]:
        sub_gbz = load_gbz(base / g)
        sub_idx = build_rindex(read_rlbwt(base / rl), keep_sa=True)
        tags = build_tags(sub_gbz, sub_idx)
        comp = comp_of_node[int(tags.pos_enc[0]) >> 11]
        comp_tags[comp] = tags

    merged = merge_tags(gbz_xy, idx_xy, comp_tags)
    # merged covers [0, n): endmarker rows first with tag 0
    n_seq = idx_xy.n_seq
    assert int(merged.pos_enc[0]) == 0 and int(merged.run_lengths()[0]) == n_seq
    per_pos_merged = np.repeat(merged.pos_enc, merged.run_lengths())[n_seq:]
    per_pos_direct = np.repeat(direct.pos_enc, direct.run_lengths())
    np.testing.assert_array_equal(per_pos_merged, per_pos_direct)


def test_streamed_merge_equals_full_merge(ref_data):
    """merge_tags_streamed with a tiny window (forcing many batches + RLE
    boundary carries + incremental stream-cursor consumption) produces the
    identical TagArray as the all-in-RAM merge."""
    from pangenome_index_tpu.core.merge import merge_tags_streamed

    base = ref_data / "two_contig_graph"
    gbz_xy = load_gbz(base / "xy.gbz")
    idx_xy = build_rindex(read_rlbwt(base / "contigs_XY.rl_bwt"), keep_sa=True)
    comp_of_node = node_components(gbz_xy)
    comp_tags = {}
    for g, rl in [("x.gbz", "contigs_chrX.rl_bwt"), ("y.gbz", "contigs_chrY.rl_bwt")]:
        sub_gbz = load_gbz(base / g)
        sub_idx = build_rindex(read_rlbwt(base / rl), keep_sa=True)
        tags = build_tags(sub_gbz, sub_idx)
        comp_tags[comp_of_node[int(tags.pos_enc[0]) >> 11]] = tags

    full = merge_tags(gbz_xy, idx_xy, comp_tags)
    for window in (97, 4096):
        streamed = merge_tags_streamed(gbz_xy, idx_xy, comp_tags, window=window)
        np.testing.assert_array_equal(streamed.pos_enc, full.pos_enc)
        np.testing.assert_array_equal(streamed.bwt_start, full.bwt_start)
        assert streamed.total == full.total


def test_committed_two_contig_ri_matches_build(ref_data):
    base = ref_data / "two_contig_graph"
    idx = rifmt.load_file(base / "r-index/xy.ri")
    built = build_rindex(read_rlbwt(base / "contigs_XY.rl_bwt"))
    np.testing.assert_array_equal(idx.run_sym, built.run_sym)
    np.testing.assert_array_equal(idx.run_len, built.run_len)
    np.testing.assert_array_equal(idx.samples, built.samples)


def test_seq_of_rows_matches_sa(ref_data):
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"), keep_sa=True)
    np.testing.assert_array_equal(seq_of_rows(idx), idx.sa_seq)


def test_build_tags_chunked_equals_oneshot(ref_data):
    """build_tags at sub-data chunk sizes must reproduce the one-shot spec
    rle(tags_per_row(...)) exactly, including runs spanning chunk edges."""
    from pangenome_index_tpu.core.tagbuild import rle, tags_per_row

    gbz = load_gbz(ref_data / "bidirectional_test/xy.gbz")
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"),
                       keep_sa=True)
    want_v, want_l = rle(tags_per_row(gbz, idx))
    for chunk in (257, 1000, 1 << 24):
        tags = build_tags(gbz, idx, chunk=chunk)
        np.testing.assert_array_equal(tags.pos_enc, want_v)
        np.testing.assert_array_equal(tags.run_lengths(), want_l)


def test_build_tags_streamed_sa_equals_resident(ref_data):
    """The streamed tag build (windowed native psi walks, no resident SA)
    must reproduce the keep_sa build exactly, at window sizes that force
    many passes, in both per-char tag modes (flat and searchsorted), and
    with the walk's lanes split over threads (VERDICT r3 item 5)."""
    from pangenome_index_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    gbz = load_gbz(ref_data / "bidirectional_test/xy.gbz")
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"),
                       keep_sa=True)
    want = build_tags(gbz, idx)
    idx_ns = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"),
                          keep_sa=False)
    assert idx_ns.sa_seq is None
    for kw in (dict(sa_window_bytes=16 * 1024),          # many walk passes
               dict(sa_window_bytes=16 * 1024, chunk=257),
               dict(sa_window_bytes=1 << 30),            # single pass
               dict(sa_window_bytes=16 * 1024, flat_bytes_cap=0),  # searchsorted
               dict(sa_window_bytes=16 * 1024, n_threads=2)):
        tags = build_tags(gbz, idx_ns, **kw)
        np.testing.assert_array_equal(tags.pos_enc, want.pos_enc)
        np.testing.assert_array_equal(tags.run_lengths(), want.run_lengths())


def test_psi_walk_windowed_matches_full(ref_data):
    """Windowed sa recording must equal the corresponding slice of the full
    walk, and the threaded walk must equal the single-threaded one."""
    from pangenome_index_tpu import native

    if not native.available():
        pytest.skip("native engine unavailable")
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    r = idx.n_runs
    sym = idx.run_sym.astype(np.int64)
    psi_base = idx.C[sym] + idx.cum[np.arange(r), sym]
    full = native.psi_walk_native(idx.run_start, psi_base, idx.run_sym == 0,
                                  idx.n, idx.n_seq, full_sa=True)
    for lo, hi in [(0, idx.n), (100, 1000), (idx.n - 64, idx.n), (0, 1)]:
        win = native.psi_walk_native(idx.run_start, psi_base, idx.run_sym == 0,
                                     idx.n, idx.n_seq, full_sa=True,
                                     window=(lo, hi))
        for a, b in zip(win[:5], full[:5]):
            np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(win[5], full[5][lo:hi])
        np.testing.assert_array_equal(win[6], full[6][lo:hi])
    thr = native.psi_walk_native(idx.run_start, psi_base, idx.run_sym == 0,
                                 idx.n, idx.n_seq, n_threads=2, full_sa=True)
    for a, b in zip(thr, full):
        np.testing.assert_array_equal(a, b)
