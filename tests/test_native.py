"""Native C++ engine vs host model equality (MEMs + count)."""

import numpy as np
import pytest

from pangenome_index_tpu import native
from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.mems import find_all_mems
from pangenome_index_tpu.models.rindex import build_rindex
from pangenome_index_tpu.utils.alphabet import BYTE_TO_CODE

pytestmark = pytest.mark.skipif(not native.available(), reason="native engine unavailable")


def _reads(lines, rng, n, length=60):
    out = []
    for _ in range(n):
        l1 = lines[int(rng.integers(len(lines)))]
        l2 = lines[int(rng.integers(len(lines)))]
        a = int(rng.integers(0, len(l1) - length // 2))
        b = int(rng.integers(0, len(l2) - length // 2))
        out.append(l1[a : a + length // 2] + l2[b : b + length // 2])
    return out


def test_native_matches_host(ref_data):
    idx = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    with open(ref_data / "bidirectional_test/contigs_xy", "rb") as fh:
        lines = [l for l in fh.read().split(b"\n") if l]
    rng = np.random.default_rng(11)
    reads = _reads(lines, rng, 32)
    L = max(len(r) for r in reads)
    codes = np.zeros((len(reads), L), np.int32)
    lens = np.array([len(r) for r in reads], np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = BYTE_TO_CODE[np.frombuffer(r, np.uint8)]

    for min_len, min_occ in [(8, 1), (12, 2)]:
        s, e, b, z, cnt = native.find_mems_native(idx, codes, lens, min_len, min_occ)
        for i, r in enumerate(reads):
            host = find_all_mems(idx, r, min_len, min_occ)
            assert cnt[i] == len(host)
            for m, hm in enumerate(host):
                assert (s[i, m], e[i, m], b[i, m], z[i, m]) == (
                    hm.start, hm.end, hm.bwt_start, hm.size)

    first, second = native.count_native(idx, codes, lens)
    for i, r in enumerate(reads):
        assert (first[i], second[i]) == idx.count(r)


def test_sais_bwt_matches_oracle(ref_data):
    from pangenome_index_tpu.models.oracle import oracle_from_file, oracle_from_lines

    for name in ["med_test.txt", "bidirectional_test/contigs_xy"]:
        with open(ref_data / name, "rb") as fh:
            lines = [l for l in fh.read().split(b"\n") if l]
        o = oracle_from_lines(lines)
        bwt, da, sp, sl = native.build_bwt_native(lines)
        np.testing.assert_array_equal(bwt, o.bwt)
        np.testing.assert_array_equal(da, o.da)
        np.testing.assert_array_equal(sp, o.sa_pos)
        np.testing.assert_array_equal(sl, o.seq_lengths)
    # fuzz: duplicates, tiny sequences, Ns
    rng = np.random.default_rng(3)
    for _ in range(8):
        n_seq = int(rng.integers(1, 25))
        base = rng.choice(np.frombuffer(b"ACGTN", np.uint8), int(rng.integers(3, 120)))
        lines = [base.tobytes() if rng.random() < 0.4 else
                 rng.choice(np.frombuffer(b"ACGT", np.uint8), int(rng.integers(1, 80))).tobytes()
                 for _ in range(n_seq)]
        o = oracle_from_lines(lines)
        bwt, da, sp, sl = native.build_bwt_native(lines)
        np.testing.assert_array_equal(bwt, o.bwt)
        np.testing.assert_array_equal(da, o.da)
        np.testing.assert_array_equal(sp, o.sa_pos)


def test_native_tag_query_matches_model(ref_data):
    from pangenome_index_tpu.formats import tags as tagfmt

    tags = tagfmt.load_tags_file(ref_data / "bidirectional_test/xy_bidirectional_compressed.tags")
    rng = np.random.default_rng(4)
    starts = rng.integers(0, tags.total - 60, 100)
    ends = starts + rng.integers(0, 60, 100)
    pos, uniq, runs = native.query_tags_native(tags, starts, ends)
    for i in range(100):
        vals, nruns = tags.query(int(starts[i]), int(ends[i]))
        assert runs[i] == nruns
        np.testing.assert_array_equal(pos[i, : uniq[i]], vals)


def test_sais_int64_path_matches_int32():
    # the >2 Gbp per-shard fallback: the int64 instantiation (force64 test
    # hook) must produce identical BWT/DA/SA on the same inputs
    from pangenome_index_tpu.models.oracle import oracle_from_lines

    rng = np.random.default_rng(21)
    for _ in range(4):
        lines = [bytes(rng.choice(list(b"ACGTN"), size=int(rng.integers(4, 200))))
                 for _ in range(int(rng.integers(1, 30)))]
        o = oracle_from_lines(lines)
        b32, d32, p32, _ = native.build_bwt_native(lines)
        b64, d64, p64, _ = native.build_bwt_native(lines, force64=True)
        np.testing.assert_array_equal(b32, b64)
        np.testing.assert_array_equal(d32, d64)
        np.testing.assert_array_equal(p32, p64)
        np.testing.assert_array_equal(b64, o.bwt)


def test_sais_bwt_many_sequences():
    # regression: the dense-code -> byte back-map must be sized by the
    # alphabet (n_seq + #distinct bytes), not a fixed 512 - with many
    # sequences the separator codes push character codes past any fixed bound
    from pangenome_index_tpu.models.oracle import oracle_from_lines

    rng = np.random.default_rng(11)
    lines = [bytes(rng.choice(list(b"ACGT"), size=int(rng.integers(5, 40))))
             for _ in range(600)]
    o = oracle_from_lines(lines)
    bwt, da, sp, sl = native.build_bwt_native(lines)
    np.testing.assert_array_equal(bwt, o.bwt)
    np.testing.assert_array_equal(da, o.da)
    np.testing.assert_array_equal(sp, o.sa_pos)


def test_bitio_native_matches_numpy(monkeypatch):
    # the native single-pass (un)pack kernels (src/cpp/bitio.cpp) must be
    # bit-identical to the numpy codec across widths, above the routing
    # threshold where they actually engage (sdsl._NATIVE_MIN)
    import io

    from pangenome_index_tpu.formats import sdsl

    if not native.available():
        import pytest

        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(7)
    n = sdsl._NATIVE_MIN * 3
    for width in (1, 9, 13, 31, 33, 63, 64):
        vals = rng.integers(0, min(1 << width, 2**63 - 1), n).astype(np.int64)
        w_nat = sdsl._values_to_words(vals, width)
        monkeypatch.setenv("PANIDX_NO_NATIVE_BITIO", "1")
        w_np = sdsl._values_to_words(vals, width)
        v_np = sdsl._words_to_values(w_nat, width, n)
        monkeypatch.delenv("PANIDX_NO_NATIVE_BITIO")
        v_nat = sdsl._words_to_values(w_nat, width, n)
        np.testing.assert_array_equal(w_nat, w_np)
        np.testing.assert_array_equal(v_nat, vals)
        np.testing.assert_array_equal(v_np, vals)
    # sd_vector decode through the ctz set-bits kernel
    pos = np.unique(rng.integers(0, 5_000_000, 40_000)).astype(np.int64)
    sd = sdsl.SdVector(size=5_000_000, positions=pos)
    b = io.BytesIO()
    sdsl.write_sd_vector(b, sd)
    b.seek(0)
    np.testing.assert_array_equal(sdsl.read_sd_vector(b).positions, pos)
    monkeypatch.setenv("PANIDX_NO_NATIVE_BITIO", "1")
    b.seek(0)
    np.testing.assert_array_equal(sdsl.read_sd_vector(b).positions, pos)


def test_format_mems_native_bytes():
    """The native emission formatter must render byte-identically to the
    CLI's Python loop - fuzzed shapes including zero-MEM reads, zero-unique
    tag rows, negative-free int64 values, and the no-tags mode."""
    import os
    import tempfile

    from pangenome_index_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(3)
    for trial in range(4):
        n_reads = int(rng.integers(1, 12))
        counts = rng.integers(0, 5, n_reads).astype(np.int64)
        n_flat = int(counts.sum())
        s = rng.integers(0, 150, n_flat).astype(np.int64)
        e = s + rng.integers(1, 40, n_flat)
        b = rng.integers(0, 2**40, n_flat).astype(np.int64)
        z = rng.integers(1, 10**7, n_flat).astype(np.int64)
        tstride = 6
        tuniq = rng.integers(0, tstride + 1, n_flat).astype(np.int64)
        tpos = rng.integers(0, 2**45, (max(n_flat, 1), tstride)).astype(np.int64)
        with_tags = trial % 2 == 0
        # python reference (the CLI loop's exact prints)
        lines = []
        fi = 0
        for i in range(n_reads):
            lines.append(f"Seq: {i + 1}")
            for m in range(int(counts[i])):
                lines.append(f"MEM START: {s[fi]}, MEM END: {e[fi]} "
                             f"BWT START: {b[fi]} SIZE: {z[fi]}")
                if with_tags:
                    vals = tpos[fi, : tuniq[fi]]
                    lines.append(f"Number of unique positions: {len(vals)}")
                    lines.append("".join(f"{v}, " for v in vals))
                fi += 1
            lines.append("")
        ref = ("\n".join(lines) + "\n").encode()
        with tempfile.TemporaryFile() as fh:
            n = native.format_mems_native(
                counts, s, e, b, z, tuniq if with_tags else None,
                tpos if with_tags else None, fh.fileno())
            fh.seek(0)
            got = fh.read()
        assert got == ref and n == len(ref)


def test_read_windows_native_matches_numpy():
    """Native rolling window keys + dictionary lookups must be bit-identical
    to read_mer_keys + lookup_read_windows - including garbage key columns,
    non-ACGT resets, short reads, and the m>15 int64 regime."""
    from pangenome_index_tpu import native
    from pangenome_index_tpu.ops.mertable import read_mer_keys
    from pangenome_index_tpu.ops.sparsedict import lookup_read_windows

    if not native.available():
        import pytest

        pytest.skip("native engine unavailable")
    rng = np.random.default_rng(9)
    for m in (6, 15, 19, 31):
        B, L = 33, 60
        codes = rng.integers(0, 7, (B, L)).astype(np.int32)  # incl. invalid
        lens = rng.integers(0, L + 1, B).astype(np.int32)
        ref_k, ref_v = read_mer_keys(codes, lens, m)
        # dictionary: a sorted unique subset of the occurring keys + noise
        occ = np.unique(ref_k[ref_v].astype(np.int64))
        noise = rng.integers(0, 1 << min(2 * m, 62), 50).astype(np.int64)
        dk = np.unique(np.concatenate([occ[::2], noise]))
        ref_i = lookup_read_windows(dk, ref_k, ref_v)
        keys, valid, idx = native.read_windows_native(codes, lens, m,
                                                      dict_keys=dk)
        np.testing.assert_array_equal(keys, ref_k)
        np.testing.assert_array_equal(valid, ref_v)
        np.testing.assert_array_equal(idx, ref_i)
        assert keys.dtype == ref_k.dtype
        # no-dictionary mode
        k2, v2, i2 = native.read_windows_native(codes, lens, m)
        np.testing.assert_array_equal(k2, ref_k)
        np.testing.assert_array_equal(v2, ref_v)
        assert i2 is None
