"""Property/fuzz tests over random synthetic pangenomes.

Exercises paths the committed fixtures never reach: tag runs >= 512 (the
length-field split, tag_arrays.cpp:663-693), many tiny sequences, single
sequences, high-duplication cohorts - validating the full pipeline against
per-position ground truth and format round-trips."""

import numpy as np
import pytest

from pangenome_index_tpu.formats import ri as rifmt
from pangenome_index_tpu.formats import tags as tagfmt
from pangenome_index_tpu.formats.rlbwt import rlbwt_from_text
from pangenome_index_tpu.models.mems import find_all_mems
from pangenome_index_tpu.models.oracle import oracle_from_lines
from pangenome_index_tpu.models.rindex import build_rindex
from pangenome_index_tpu.models.tagarray import MAX_TAG_LEN, TagArray


def _pipeline(lines):
    oracle = oracle_from_lines(lines)
    rlbwt = rlbwt_from_text(oracle.bwt.tobytes())
    idx = build_rindex(rlbwt, keep_sa=True)
    np.testing.assert_array_equal(idx.decompress_da(), oracle.da)
    return oracle, rlbwt, idx


def _synthetic_tags(idx):
    """A tag per BWT row derived from its (seq, pos) - structured so adjacent
    equal-tag rows form long runs (same graph position across haplotypes)."""
    rows = np.arange(idx.n_seq, idx.n)
    pos = idx.sa_pos[rows]
    # identical haplotypes -> all rows of the same text offset share a tag
    return ((pos + 1) << 11) | (pos & 0x3FF)


@pytest.mark.parametrize("seed", [0, 1])
def test_identical_haplotypes_long_runs(seed):
    # 600 identical sequences: every tag run has length ~600 >= 512
    rng = np.random.default_rng(seed)
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 40).tobytes()
    lines = [base] * 600
    oracle, rlbwt, idx = _pipeline(lines)
    tags_per_row = _synthetic_tags(idx)
    from pangenome_index_tpu.core.tagbuild import rle

    vals, lens = rle(tags_per_row)
    assert lens.max() >= MAX_TAG_LEN  # the split path is actually exercised
    tags = TagArray.from_runs(vals, lens)
    assert tags.run_lengths().max() < MAX_TAG_LEN
    # per-position equality after splitting
    np.testing.assert_array_equal(np.repeat(tags.pos_enc, tags.run_lengths()), tags_per_row)
    # all three formats round-trip the split runs
    for writer, reader in [
        (tagfmt.write_algorithm, lambda d: tagfmt.read_algorithm(d)),
        (tagfmt.write_compressed_sdsl, tagfmt.load_tags),
        (tagfmt.write_compressed_bytecode, tagfmt.load_tags),
    ]:
        back = reader(writer(tags))
        np.testing.assert_array_equal(
            np.repeat(back.pos_enc, back.run_lengths()), tags_per_row)


@pytest.mark.parametrize("shape", ["tiny_many", "single", "two_chars"])
def test_degenerate_pangenome_shapes(shape):
    rng = np.random.default_rng(7)
    if shape == "tiny_many":
        lines = [rng.choice(np.frombuffer(b"ACGT", np.uint8), int(rng.integers(1, 4))).tobytes() for _ in range(50)]
    elif shape == "single":
        lines = [rng.choice(np.frombuffer(b"ACGT", np.uint8), 200).tobytes()]
    else:
        lines = [b"A" * 30, b"T" * 30]
    oracle, rlbwt, idx = _pipeline(lines)
    # encoded + legacy .ri round-trips
    for data in (rifmt.serialize_encoded(idx), rifmt.serialize_legacy(idx)):
        back = rifmt.load(data)
        np.testing.assert_array_equal(back.run_sym, idx.run_sym)
        np.testing.assert_array_equal(back.samples, idx.samples)


@pytest.mark.parametrize("seed", range(4))
def test_random_cohort_mems_brute_force(seed):
    # FMD forward extension requires a bidirectional index (both strands in
    # the text) - the precondition of the reference's workflow (README's
    # bidirectional pipeline); include reverse complements like the fixtures
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    rng = np.random.default_rng(100 + seed)
    base = rng.choice(np.frombuffer(b"ACGT", np.uint8), 120)
    lines = []
    for _ in range(5):
        hap = base.copy()
        k = rng.integers(0, 4)
        if k:
            p = rng.choice(120, k, replace=False)
            hap[p] = rng.choice(np.frombuffer(b"ACGT", np.uint8), k)
        lines.append(hap.tobytes())
        lines.append(hap.tobytes().translate(comp)[::-1])
    _, _, idx = _pipeline(lines)

    def occ(pat):
        return sum(1 for l in lines for i in range(len(l)) if l.startswith(pat, i))

    for _ in range(6):
        a = int(rng.integers(0, 90))
        read = bytes(base[a : a + 30])
        for min_len, min_occ in [(8, 1), (10, 2)]:
            mems = find_all_mems(idx, read, min_len, min_occ)
            for m in mems:
                sub = read[m.start : m.end]
                assert m.size == occ(sub)
                assert m.size >= min_occ and len(sub) >= min_len
