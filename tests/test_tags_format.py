"""Tag-array codecs: cross-validate the two committed fixtures, byte-compare
our convert_tags re-implementation against the committed compressed fixture,
and round-trip all on-disk formats."""

import numpy as np

from pangenome_index_tpu.formats import tags as tagfmt


def test_convert_byte_identical(ref_data):
    raw = (ref_data / "bidirectional_test/xy_bidirectional.tags").read_bytes()
    data = tagfmt.convert_algorithm(raw, compact=False, compat=True)
    expect = (ref_data / "bidirectional_test/xy_bidirectional_compressed.tags").read_bytes()
    assert len(data) == len(expect)
    if data != expect:
        diff = next(i for i in range(len(data)) if data[i] != expect[i])
        raise AssertionError(f"diff at {diff}: {data[diff-8:diff+8].hex()} vs {expect[diff-8:diff+8].hex()}")


def test_fixture_cross_equality(ref_data):
    # compressed fixture == algorithm fixture + bogus header run (compat decode)
    alg = tagfmt.read_algorithm((ref_data / "bidirectional_test/xy_bidirectional.tags").read_bytes())
    comp = tagfmt.load_tags_file(ref_data / "bidirectional_test/xy_bidirectional_compressed.tags")
    np.testing.assert_array_equal(alg.pos_enc, comp.pos_enc[1:])
    assert alg.total == 8014  # xy BWT minus the 8 endmarker rows
    assert comp.total == 8014 + 23  # plus the bogus header-decoded run


def test_algorithm_roundtrip(ref_data):
    raw = (ref_data / "bidirectional_test/xy_bidirectional.tags").read_bytes()
    alg = tagfmt.read_algorithm(raw)
    assert tagfmt.write_algorithm(alg) == raw


def test_sdsl_roundtrip(ref_data):
    alg = tagfmt.read_algorithm((ref_data / "bidirectional_test/xy_bidirectional.tags").read_bytes())
    for writer in [tagfmt.write_compressed_sdsl, tagfmt.write_compressed_bytecode,
                   lambda t: tagfmt.write_compressed_bytecode(t, compact=True)]:
        back = tagfmt.load_tags(writer(alg))
        np.testing.assert_array_equal(back.pos_enc, alg.pos_enc)
        np.testing.assert_array_equal(back.bwt_start, alg.bwt_start)
        assert back.total == alg.total


def test_query_semantics(ref_data):
    tags = tagfmt.load_tags_file(ref_data / "bidirectional_test/xy_bidirectional_compressed.tags")
    rng = np.random.default_rng(7)
    for _ in range(200):
        a = int(rng.integers(0, tags.total))
        b = int(rng.integers(a, min(a + 50, tags.total)))
        vals, nruns = tags.query(a, b)
        first = int(np.searchsorted(tags.bwt_start, a, side="right"))
        exact = tags.query_exact(a, b)
        if first % 10 != 0:
            np.testing.assert_array_equal(vals, exact)
        assert nruns >= 1
