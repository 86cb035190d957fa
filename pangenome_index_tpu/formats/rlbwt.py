"""Reader/writer for grlBWT's ``.rl_bwt`` run-length BWT container.

The reference consumes this format through grlBWT's ``bwt_buff_reader``
(reference: include/pangenome_index/r-index.hpp:13; deps/grlBWT is a git
submodule absent from the snapshot). The container format, reverse-engineered
from the committed fixtures and locked in by round-trip tests against them:

    [u64 sym_bytes][u64 freq_bytes]                      # little-endian header
    then N records of (sym_bytes + freq_bytes) bytes:
    [sym: sym_bytes LE][freq: freq_bytes LE]

e.g. test_data/med_test.rl_bwt has header (1,1) and 14 two-byte records whose
frequencies sum to the 45-byte plaintext; test_data/x.rl_bwt has header (1,2).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np


@dataclass
class RLBWT:
    """Run-length BWT: parallel arrays of (symbol byte, frequency)."""

    syms: np.ndarray  # uint8 [n_runs] symbol byte values
    freqs: np.ndarray  # int64 [n_runs] run lengths

    @property
    def n_runs(self) -> int:
        return len(self.syms)

    @property
    def size(self) -> int:
        return int(self.freqs.sum())

    def expand(self) -> np.ndarray:
        """Materialize the BWT as a uint8 array (small inputs only)."""
        return np.repeat(self.syms, self.freqs)


def _le_records(raw: np.ndarray, width: int) -> np.ndarray:
    """Decode little-endian fixed-width integers from a [n, width] byte view."""
    out = np.zeros(raw.shape[0], dtype=np.int64)
    for b in range(width):
        out |= raw[:, b].astype(np.int64) << (8 * b)
    return out


def read_rlbwt(path: str | os.PathLike) -> RLBWT:
    data = np.fromfile(path, dtype=np.uint8)
    if data.size < 16:
        raise ValueError(f"{path}: truncated .rl_bwt (no header)")
    header = data[:16].view(np.uint64)
    sym_bytes, freq_bytes = int(header[0]), int(header[1])
    rec = sym_bytes + freq_bytes
    body = data[16:]
    if body.size % rec != 0:
        raise ValueError(f"{path}: body size {body.size} not a multiple of record size {rec}")
    n = body.size // rec
    recs = body.reshape(n, rec)
    syms = _le_records(recs[:, :sym_bytes], sym_bytes).astype(np.uint8)
    freqs = _le_records(recs[:, sym_bytes:], freq_bytes)
    return RLBWT(syms=syms, freqs=freqs)


def write_rlbwt(path: str | os.PathLike, rlbwt: RLBWT) -> None:
    """Write the container using the widths grlBWT chooses: the symbol field
    sized for the largest symbol byte, the frequency field sized for the
    *total* text length (observed from fixtures: med_test n=45 -> 1 byte,
    x n=3012 -> 2 bytes)."""
    sym_bytes = max(1, (int(rlbwt.syms.max(initial=0)).bit_length() + 7) // 8)
    freq_bytes = max(1, (int(rlbwt.size).bit_length() + 7) // 8)
    n = rlbwt.n_runs
    rec = sym_bytes + freq_bytes
    body = np.zeros((n, rec), dtype=np.uint8)
    s = rlbwt.syms.astype(np.int64)
    f = rlbwt.freqs.astype(np.int64)
    for b in range(sym_bytes):
        body[:, b] = (s >> (8 * b)) & 0xFF
    for b in range(freq_bytes):
        body[:, sym_bytes + b] = (f >> (8 * b)) & 0xFF
    with open(path, "wb") as fh:
        fh.write(np.array([sym_bytes, freq_bytes], dtype=np.uint64).tobytes())
        fh.write(body.tobytes())


def rlbwt_from_text(text: bytes) -> RLBWT:
    """Run-length encode a BWT byte string into the container's run list.

    Like grlBWT output, adjacent equal symbols form one run (endmarker runs are
    NOT split here; the r-index build splits them, reference r-index.cpp:840-928).
    """
    arr = np.frombuffer(text, dtype=np.uint8)
    if arr.size == 0:
        return RLBWT(np.zeros(0, np.uint8), np.zeros(0, np.int64))
    boundaries = np.flatnonzero(np.diff(arr) != 0) + 1
    starts = np.concatenate(([0], boundaries))
    ends = np.concatenate((boundaries, [arr.size]))
    return RLBWT(syms=arr[starts], freqs=(ends - starts).astype(np.int64))
