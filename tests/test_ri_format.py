"""`.ri` codec: the gold test is byte-identical re-creation of the committed
fixture test_data/bidirectional_test/xy.ri from its source rl_bwt, which
validates both construction semantics (samples, last, blocks) and every SDSL
sub-structure layout (int_vector, sd_vector, select_support_mcl)."""

import numpy as np
import pytest

from pangenome_index_tpu.formats import ri
from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.rindex import build_rindex


def test_load_committed_xy_ri(ref_data):
    idx = ri.load_file(ref_data / "bidirectional_test/xy.ri")
    built = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    np.testing.assert_array_equal(idx.run_sym, built.run_sym)
    np.testing.assert_array_equal(idx.run_len, built.run_len)
    np.testing.assert_array_equal(idx.samples, built.samples)
    np.testing.assert_array_equal(idx.last_sorted, built.last_sorted)
    np.testing.assert_array_equal(idx.last_to_run, built.last_to_run)
    assert idx.n == built.n and idx.max_len == built.max_len and idx.n_seq == built.n_seq


def test_serialize_legacy_byte_identical(ref_data):
    # the committed xy.ri is the legacy format (flags=0)
    built = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    data = ri.serialize_legacy(built)
    expect = (ref_data / "bidirectional_test/xy.ri").read_bytes()
    assert len(data) == len(expect)
    if data != expect:
        diff = next(i for i in range(len(data)) if data[i] != expect[i])
        raise AssertionError(f"first differing byte at offset {diff}: {data[diff-8:diff+8].hex()} vs {expect[diff-8:diff+8].hex()}")


def test_encoded_roundtrip_through_reference_loader_shape(ref_data):
    # encoded serialization loads back losslessly (covers EncodedBlock layout)
    built = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    loaded = ri.load(ri.serialize_encoded(built))
    np.testing.assert_array_equal(loaded.run_sym, built.run_sym)
    np.testing.assert_array_equal(loaded.run_len, built.run_len)


def _index_from_runs(run_sym, run_len):
    """Minimal valid RIndex carrying an arbitrary run decomposition (the
    sample structures just need to be serializable; the encoded-stream bytes
    under test depend only on runs / cum / C)."""
    r = len(run_sym)
    n = int(np.sum(run_len))
    return ri._finish_from_runs(
        run_sym, run_len, samples=np.arange(r), last_positions=np.arange(r),
        last_to_run=np.arange(r), n=n, n_seq=3, max_len=n)


def _bytecode(value: int) -> bytes:
    out = bytearray()
    while value > 0x7F:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def test_encoded_golden_bytes_spec():
    """Hand-assembled expected bytes for the encoded block stream, derived
    from the format spec (r-index.cpp:297-376): per block, one ByteCode varint
    per present symbol (cumulative ranks in sym_map order), then each run as
    u8 (code<<5 | min(len-1,31)) with lengths >= 32 spilling ByteCode(len-32).
    r = 20 = 2 full blocks exercises the trailing EMPTY block, whose cum
    vector is the default 8-entry zero vector (r-index.hpp:144)."""
    run_sym = [0, 1, 2, 3, 5, 1, 4, 0, 2, 3,
               1, 5, 2, 3, 1, 0, 5, 2, 1, 3]
    run_len = [1, 3, 35, 1, 200, 1, 2, 1, 31, 32,
               5, 1, 2, 3, 4, 1, 6, 7, 8, 9]
    idx = _index_from_runs(np.array(run_sym, np.int8), np.array(run_len, np.int64))
    data = ri.serialize_encoded(idx)

    # --- hand-assembled tail: encoded_block_size onward ---
    stream = bytearray()
    # block 0 @ 0: six zero cum varints, then the ten run encodings
    stream += b"\x00" * 6
    stream += bytes([0x00,                 # ('\n', 1): code 0, len-1=0
                     0x22,                 # (A, 3)
                     0x5F]) + _bytecode(3)  # (C, 35): spill 35-32
    stream += bytes([0x60,                 # (G, 1)
                     0xBF]) + _bytecode(168)  # (T, 200): spill 200-32
    stream += bytes([0x20, 0x81, 0x00, 0x5E,  # (A,1) (N,2) ('\n',1) (C,31)
                     0x7F]) + _bytecode(0)    # (G, 32): spill 0
    off1 = len(stream)
    # block 1: cum ranks after block 0 = [2, 4, 66, 33, 2, 200]
    for v in (2, 4, 66, 33, 2, 200):
        stream += _bytecode(v)
    stream += bytes([0x24, 0xA0, 0x41, 0x62, 0x23,
                     0x00, 0xA5, 0x46, 0x27, 0x68])
    off2 = len(stream)
    # trailing empty block: default 8-entry zero cum vector, no runs
    stream += b"\x00" * 8

    tail = bytearray()
    tail += (10).to_bytes(8, "little")       # encoded_block_size
    tail += b"\x01"                          # has_N (code 4 present)
    width = max(1, off2.bit_length())        # int_vector<0> of start offsets
    tail += (3 * width).to_bytes(8, "little")
    tail += bytes([width])
    packed = 0 | (off1 << width) | (off2 << 2 * width)
    tail += packed.to_bytes(8, "little")
    tail += len(stream).to_bytes(8, "little")
    tail += stream

    assert data.endswith(bytes(tail)), (
        f"tail mismatch:\n got ...{data[-len(tail):].hex()}\n exp ...{bytes(tail).hex()}")

    # the loader (block-accounting path incl. the r%10==0 empty block)
    loaded = ri.load(data)
    np.testing.assert_array_equal(loaded.run_sym, run_sym)
    np.testing.assert_array_equal(loaded.run_len, run_len)


def test_encoded_golden_bytes_no_N():
    """N-absent variant: has_N byte 0 and FIVE cum varints per block (one per
    present symbol), while the trailing empty block still writes eight."""
    run_sym = [0, 1, 2, 3, 5, 1, 2, 3, 5, 1,
               0, 5, 2, 3, 1, 0, 5, 2, 1, 3]
    run_len = [1, 3, 5, 1, 20, 1, 2, 1, 31, 30,
               1, 1, 2, 3, 4, 1, 6, 7, 8, 9]
    idx = _index_from_runs(np.array(run_sym, np.int8), np.array(run_len, np.int64))
    data = ri.serialize_encoded(idx)

    stream = bytearray()
    stream += b"\x00" * 5                    # five zero cum varints ('\n',A,C,G,T)
    stream += bytes([0x00, 0x22, 0x44, 0x60, 0xB3,
                     0x20, 0x41, 0x60, 0xBE, 0x3D])
    off1 = len(stream)
    for v in (1, 34, 7, 2, 51):              # cum after block 0, present order
        stream += _bytecode(v)
    stream += bytes([0x00, 0xA0, 0x41, 0x62, 0x23,
                     0x00, 0xA5, 0x46, 0x27, 0x68])
    off2 = len(stream)
    stream += b"\x00" * 8

    tail = bytearray()
    tail += (10).to_bytes(8, "little")
    tail += b"\x00"                          # has_N = 0
    width = max(1, off2.bit_length())
    tail += (3 * width).to_bytes(8, "little")
    tail += bytes([width])
    tail += (0 | (off1 << width) | (off2 << 2 * width)).to_bytes(8, "little")
    tail += len(stream).to_bytes(8, "little")
    tail += stream

    assert data.endswith(bytes(tail))
    loaded = ri.load(data)
    np.testing.assert_array_equal(loaded.run_sym, run_sym)
    np.testing.assert_array_equal(loaded.run_len, run_len)


@pytest.mark.parametrize("fmt", ["encoded", "legacy"])
def test_roundtrip(ref_data, fmt):
    built = build_rindex(read_rlbwt(ref_data / "med_test.rl_bwt"))
    data = ri.serialize_encoded(built) if fmt == "encoded" else ri.serialize_legacy(built)
    loaded = ri.load(data)
    np.testing.assert_array_equal(loaded.run_sym, built.run_sym)
    np.testing.assert_array_equal(loaded.run_len, built.run_len)
    np.testing.assert_array_equal(loaded.cum, built.cum)
    np.testing.assert_array_equal(loaded.samples, built.samples)
    np.testing.assert_array_equal(loaded.C, built.C)


def test_fuzz_load_ri_truncation_and_flips(ref_data, tmp_path):
    """Adversarial .ri payloads must fail cleanly (exceptions), never hang
    or crash the process. The format carries no checksum (same as the
    reference, r-index.hpp:85-115), so a benign bit flip MAY deserialize
    to a different valid index - the contract here is robustness, not
    detection."""
    import io

    from pangenome_index_tpu.formats import ri as rifmt

    data = bytearray((ref_data / "bidirectional_test/xy.ri").read_bytes())
    built = build_rindex(read_rlbwt(ref_data / "bidirectional_test/contigs_xy.rl_bwt"))
    enc = bytearray(rifmt.serialize_encoded(built))
    rng = np.random.default_rng(99)

    for payload in (data, enc):
        # truncations at 40 random offsets incl. 0 and header boundary
        cuts = {0, 8, len(payload) - 1} | {
            int(rng.integers(0, len(payload))) for _ in range(40)}
        for cut in sorted(cuts):
            try:
                rifmt.load(io.BytesIO(bytes(payload[:cut])))
            except Exception:
                pass  # clean failure is the contract
        # single-bit flips at 60 random positions
        for _ in range(60):
            pos = int(rng.integers(0, len(payload)))
            bit = 1 << int(rng.integers(0, 8))
            flipped = bytearray(payload)
            flipped[pos] ^= bit
            try:
                idx = rifmt.load(io.BytesIO(bytes(flipped)))
                assert idx.n_runs >= 0
            except Exception:
                pass
