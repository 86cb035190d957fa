"""Naive multi-string BWT / SA / DA oracle for testing.

Mirrors the reference test oracle (tests/test_rindex.cpp:35-99): concatenate
the input lines, replace each terminating '\n' with a *distinct* separator
ordered by sequence index (so separator comparisons tie-break by sequence),
sort all rotations, and read off the last column. We sort rotations with an
O(n log^2 n) prefix-doubling rank instead of materializing strings.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class OracleBWT:
    bwt: np.ndarray        # uint8 [n]  BWT bytes (separators restored to '\n')
    da: np.ndarray         # int64 [n]  document (sequence) index per row
    sa_pos: np.ndarray     # int64 [n]  offset of the suffix within its sequence
                           #            (0-based, terminator at position len(seq))
    seq_lengths: np.ndarray  # int64 [n_seq]  sequence lengths incl. terminator


def _rotation_order(keys: np.ndarray) -> np.ndarray:
    """Return the permutation sorting all rotations of `keys` (all distinct-safe).

    Standard prefix doubling on the cyclic string.
    """
    n = keys.size
    rank = np.unique(keys, return_inverse=True)[1].astype(np.int64)
    k = 1
    idx = np.arange(n)
    while k < n:
        second = rank[(idx + k) % n]
        pair = rank * (n + 1) + second
        order = np.argsort(pair, kind="stable")
        new_rank = np.zeros(n, dtype=np.int64)
        sorted_pairs = pair[order]
        new_rank[order] = np.concatenate(([0], np.cumsum(sorted_pairs[1:] != sorted_pairs[:-1])))
        rank = new_rank
        if rank.max() == n - 1:
            break
        k *= 2
    return np.argsort(rank, kind="stable")


def oracle_from_lines(lines: list[bytes]) -> OracleBWT:
    n_seq = len(lines)
    parts = []
    seq_idx = []
    seq_lengths = []
    sa_pos_parts = []
    for i, line in enumerate(lines):
        # distinct separator per sequence (key i), ordered by sequence index,
        # strictly below every real character (key byte + n_seq) - mirrors
        # '$'+i in test_rindex.cpp:76-92 without a collision cap on n_seq
        arr = np.frombuffer(line, dtype=np.uint8).astype(np.int64) + n_seq
        full = np.concatenate((arr, [i]))
        parts.append(full)
        seq_idx.append(np.full(full.size, i, dtype=np.int64))
        seq_lengths.append(full.size)
        sa_pos_parts.append(np.arange(full.size, dtype=np.int64))
    keys = np.concatenate(parts)
    seq_idx = np.concatenate(seq_idx)
    sa_pos = np.concatenate(sa_pos_parts)
    n = keys.size
    order = _rotation_order(keys)
    prev = (order - 1) % n
    bwt_keys = keys[prev]
    bwt = np.where(bwt_keys >= n_seq, bwt_keys - n_seq, ord("\n")).astype(np.uint8)
    return OracleBWT(
        bwt=bwt,
        da=seq_idx[order],
        sa_pos=sa_pos[order],
        seq_lengths=np.array(seq_lengths, dtype=np.int64),
    )


def oracle_from_file(path: str) -> OracleBWT:
    with open(path, "rb") as fh:
        data = fh.read()
    lines = data.split(b"\n")
    if lines and lines[-1] == b"":
        lines = lines[:-1]
    return oracle_from_lines(lines)


def brute_force_mems(text_lines: list[bytes], pattern: bytes, min_len: int, min_occ: int):
    """Textbook MEMs of `pattern` against the forward+reverse-complement text.

    A MEM [x, e) is a match of pattern[x:e] occurring (as exact substring of
    some sequence or its reverse complement, counted as BWT interval size in
    the *bidirectional* index, i.e. forward-strand occurrences of the pattern
    in the indexed text) with count >= min_occ, length >= min_len, that cannot
    be extended left or right without dropping below min_occ.

    Matches the semantics of find_mems_function (algorithm.hpp:653-736) when
    the indexed text already contains both strands (the bidirectional
    fixtures). Returns list of (x, e, occ_count).
    """
    comp = bytes.maketrans(b"ACGT", b"TGCA")

    def occ(s: bytes) -> int:
        if not s:
            return sum(len(t) for t in text_lines)
        c = 0
        for t in text_lines:
            start = 0
            while True:
                i = t.find(s, start)
                if i < 0:
                    break
                c += 1
                start = i + 1
        return c

    n = len(pattern)
    mems = []
    x = 0
    while x <= n - min_len:
        # longest e such that occ(pattern[x:e]) >= min_occ
        e = x + min_len
        if occ(pattern[x:e]) < min_occ or occ(pattern[x:e]) == 0:
            x += 1
            continue
        while e < n and occ(pattern[x : e + 1]) >= min_occ and occ(pattern[x : e + 1]) > 0:
            e += 1
        # left-maximal check: is there x' < x with occ(pattern[x':e]) >= min_occ?
        if x == 0 or occ(pattern[x - 1 : e]) < min_occ or occ(pattern[x - 1 : e]) == 0:
            mems.append((x, e, occ(pattern[x:e])))
        x += 1
    return mems
