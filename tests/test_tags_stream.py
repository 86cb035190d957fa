"""Chunked .tags run streams vs full loads (formats/tags_stream.py)."""

import numpy as np
import pytest

from pangenome_index_tpu.formats import tags as tagfmt
from pangenome_index_tpu.formats.tags_stream import PositionCursor, TagRunStream
from pangenome_index_tpu.models.tagarray import TagArray


@pytest.fixture(scope="module")
def big_tags(tmp_path_factory):
    rng = np.random.default_rng(5)
    n_runs = 30_000
    pos = rng.integers(1, 1 << 30, size=n_runs).astype(np.int64)
    # adjacent-equal runs would re-merge on RLE; make them distinct
    pos[1:][pos[1:] == pos[:-1]] += 1
    lens = rng.integers(1, 200, size=n_runs).astype(np.int64)
    tags = TagArray.from_runs(pos, lens)
    d = tmp_path_factory.mktemp("tagstreams")
    files = {}
    for fmt, data in [
        ("algorithm", tagfmt.write_algorithm(tags)),
        ("sdsl", tagfmt.write_compressed_sdsl(tags)),
        ("bytecode", tagfmt.write_compressed_bytecode(tags)),
        ("bytecode-compact", tagfmt.write_compressed_bytecode(tags, compact=True)),
    ]:
        p = d / f"t_{fmt}.tags"
        p.write_bytes(data)
        files[fmt] = p
    return tags, files


@pytest.mark.parametrize("fmt", ["algorithm", "sdsl", "bytecode", "bytecode-compact"])
@pytest.mark.parametrize("chunk_runs", [97, 4096])
def test_stream_matches_full_load(big_tags, fmt, chunk_runs):
    tags, files = big_tags
    full = tagfmt.load_tags_file(files[fmt], fmt="auto" if fmt != "bytecode-compact" else fmt)
    st = TagRunStream(files[fmt], fmt="auto" if fmt != "bytecode-compact" else fmt,
                      chunk_runs=chunk_runs)
    ps, ls = [], []
    while True:
        p, l = st.read_runs()
        if len(p) == 0:
            break
        ps.append(p)
        ls.append(l)
    pos = np.concatenate(ps)
    lens = np.concatenate(ls)
    np.testing.assert_array_equal(pos, full.pos_enc)
    np.testing.assert_array_equal(lens, full.run_lengths())
    np.testing.assert_array_equal(lens, tags.run_lengths())
    st.close()


def test_position_cursor_takes(big_tags):
    tags, files = big_tags
    per_pos = np.repeat(tags.pos_enc, tags.run_lengths())
    cur = PositionCursor(TagRunStream(files["sdsl"], chunk_runs=512))
    rng = np.random.default_rng(9)
    at = 0
    while at < len(per_pos):
        k = min(int(rng.integers(1, 5000)), len(per_pos) - at)
        got = cur.take(k)
        np.testing.assert_array_equal(got, per_pos[at : at + k])
        at += k
    assert cur.remaining == 0
    with pytest.raises(ValueError):
        cur.take(1)


def test_peek_first_pos(big_tags):
    tags, files = big_tags
    for fmt, p in files.items():
        if fmt == "bytecode-compact":
            continue
        st = TagRunStream(p, chunk_runs=64)
        assert st.peek_first_pos() == int(tags.pos_enc[0])
        # peek does not consume
        v, l = st.read_runs()
        assert v[0] == tags.pos_enc[0]
        st.close()


def test_stream_reads_wrapped_files(big_tags, tmp_path):
    tags, files = big_tags
    data = tagfmt.wrap_payload(files["sdsl"].read_bytes(), "sdsl")
    p = tmp_path / "wrapped.tags"
    p.write_bytes(data)
    st = TagRunStream(p, chunk_runs=997)
    assert st.fmt == "sdsl"
    ps, ls = [], []
    while True:
        v, l = st.read_runs()
        if len(v) == 0:
            break
        ps.append(v)
        ls.append(l)
    np.testing.assert_array_equal(np.concatenate(ps), tags.pos_enc)
    np.testing.assert_array_equal(np.concatenate(ls), tags.run_lengths())
    with pytest.raises(ValueError):
        TagRunStream(p, fmt="algorithm")
