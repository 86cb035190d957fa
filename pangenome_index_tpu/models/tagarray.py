"""Host-side tag-array model: flat arrays + interval query.

The tag array maps every BWT position to the pangenome graph position that
produced it, stored run-length-compressed (reference:
include/pangenome_index/tag_arrays.hpp, src/tag_arrays.cpp). Our model is two
flat arrays instead of sampled varint streams:

    pos_enc[t]   i64  compact packed graph position per run:
                      (node_id << 11) | (is_rev << 10) | node_offset
                      (encode_run_length_compact, tag_arrays.cpp:38-45;
                      identical to gbwtgraph::Position packing)
    bwt_start[t] i64  BWT offset of each run head (the `bwt_intervals` ones)

The interval query is two searchsorteds + a slice + unique, replacing
sd_vector rank/select plus sequential varint skipping
(query_compressed_compact, tag_arrays.cpp:856-890).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LENGTH_BITS = 9          # tag_arrays.hpp:116
MAX_TAG_LEN = 1 << LENGTH_BITS
START_EVERY_K = 10       # encoded_start_every_k_run, tag_arrays.hpp:120


def encode_compact(node_id, is_rev, offset):
    return (np.asarray(node_id, dtype=np.int64) << 11) | (np.asarray(is_rev, dtype=np.int64) << 10) | (np.asarray(offset, dtype=np.int64) & 0x3FF)


def decode_compact(enc):
    enc = np.asarray(enc, dtype=np.int64)
    return enc >> 11, (enc >> 10) & 1, enc & 0x3FF


def split_long_runs(pos_enc: np.ndarray, lengths: np.ndarray):
    """Split runs >= MAX_TAG_LEN exactly like the reference writers: emit
    (pos, 511) while length >= 512, then the remainder if > 0
    (tag_arrays.cpp:663-693, 897-927). Vectorized: a run of length l becomes
    l//511 pieces of 511 plus an l%511 remainder piece (the loop above ends
    on a full 511 piece exactly when 511 | l)."""
    pos_enc = np.asarray(pos_enc, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    cap = MAX_TAG_LEN - 1
    if not len(lengths) or int(lengths.max(initial=0)) < MAX_TAG_LEN:
        return pos_enc, lengths
    q, rem = np.divmod(lengths, cap)
    pieces = q + (rem > 0)
    pos_out = np.repeat(pos_enc, pieces)
    len_out = np.full(int(pieces.sum()), cap, dtype=np.int64)
    last = np.cumsum(pieces) - 1
    len_out[last] = np.where(rem > 0, rem, cap)
    return pos_out, len_out


@dataclass
class TagArray:
    pos_enc: np.ndarray    # int64 [t]
    bwt_start: np.ndarray  # int64 [t]
    total: int             # total BWT length covered (bwt_intervals size - 1)

    @property
    def n_runs(self) -> int:
        return len(self.pos_enc)

    def run_lengths(self) -> np.ndarray:
        return np.diff(np.concatenate((self.bwt_start, [self.total])))

    @classmethod
    def from_runs(cls, pos_enc, lengths) -> "TagArray":
        pos_enc, lengths = split_long_runs(np.asarray(pos_enc, np.int64), np.asarray(lengths, np.int64))
        starts = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        return cls(pos_enc=pos_enc, bwt_start=starts, total=int(lengths.sum()))

    # ------------------------------------------------------------------ query
    def query_runs(self, start: int, end: int) -> tuple[int, int]:
        """Run-index range decoded by the reference's compact query.

        first_bit = #run-starts <= start; the decode begins at run
        first_bit-1 except when first_bit is a multiple of
        encoded_start_every_k_run, where the reference's skip loop starts one
        run late (move_tags==0 path, tag_arrays.cpp:865-874). We reproduce
        that off-by-one for output parity.
        """
        first_bit = int(np.searchsorted(self.bwt_start, start, side="right"))
        end_bit = int(np.searchsorted(self.bwt_start, end, side="right"))
        run_nums = end_bit - first_bit + 1
        s = first_bit if (first_bit % START_EVERY_K == 0) else first_bit - 1
        return s, run_nums

    def query(self, start: int, end: int):
        """Returns (unique sorted packed positions, number_of_runs reported)."""
        s, run_nums = self.query_runs(start, end)
        lo = max(s, 0)
        hi = min(s + run_nums, self.n_runs)
        vals = np.unique(self.pos_enc[lo:hi])
        return vals, run_nums

    def query_exact(self, start: int, end: int):
        """Quirk-free variant: unique positions of runs overlapping [start, end]."""
        first = int(np.searchsorted(self.bwt_start, start, side="right")) - 1
        last = int(np.searchsorted(self.bwt_start, end, side="right")) - 1
        first = max(first, 0)
        return np.unique(self.pos_enc[first : last + 1])
