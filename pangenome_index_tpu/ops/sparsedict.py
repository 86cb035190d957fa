"""Sparse long-seed dictionary: bi-intervals of every length-s substring
that actually occurs in the index.

The dense 4^m seed table (ops/mertable.py) caps at m=14 by HBM footprint;
the aligner-realistic min_len=31 workload still pays ~2(min_len-1-m)
DEPENDENT rank gathers per MEM call for the remaining extensions - the
latency chain that keeps the filtered serving row below the scale target
(PERF.md round 4). The reference's own trick lifts the cap: index only
k-mers that occur (unique_kmer.hpp:95-191 enumerates occurring k-mers over
the graph; kmers_to_bplustree_worker, algorithm.hpp:134-162, enumerates all
length-k strings with nonempty BWT intervals by recursive backward search).

Here the enumeration is a level-synchronous frontier (the breadth-first
form of that recursion, same machinery as core/anchor.py): level t holds
the bi-intervals of every distinct length-t substring; one batched rank6
pair per level extends all of them by the four bases at once. Entry count
is bounded by the index's distinct-s-mer count (r-driven), not 4^s.

Serving: a read window's interval becomes ONE sorted-array lookup
(host-side np.searchsorted over the packed keys - the same host precompute
treatment as read_mer_keys) feeding a per-position dictionary row index;
the engine cascades per-position seed lengths: long seed -> dense m-mer ->
stepwise extension (ops/mems.py). Exactness argument is the seed-table
one: interval sizes are non-increasing along an extension, so a window
whose final interval passes min_occ implies every skipped intermediate
check passed; windows that miss (error sites, absent substrings) fall back
to the shorter tiers (semantics preserved from algorithm.hpp:653-736).
"""

from __future__ import annotations

import numpy as np

from ..models.rindex import RIndex
from ..utils.alphabet import KP_WEIGHT
from .mertable import BASE_CODES

#: longest supported window: 2 bits/base must fit an int64 key
MAX_S = 31

#: device-residency budget for the dictionary values table: at HPRC
#: whole-genome scale the distinct-s-mer count could push vals past what
#: fits HBM alongside the checkpoint table; serving falls back to the dense
#: tier when the dictionary exceeds this (override: PANIDX_SDICT_MAX_BYTES)
DEVICE_BYTES_CAP = int(__import__("os").environ.get(
    "PANIDX_SDICT_MAX_BYTES", 6 << 30))


def build_sparse_dict(idx: RIndex, s: int, min_keep: int = 1):
    """Enumerate all length-s ACGT substrings with interval size >= min_keep.

    Returns (keys [D] int64 sorted ascending, vals [D, 3]) where keys pack
    2-bit bases with the LEFTMOST character in the highest bits (matching
    read_mer_keys) and vals rows are (k, kp, size) bi-intervals - int32 when
    every value fits, else int64.

    Construction is right-to-left prepending, so concatenating the four
    branch blocks in base order keeps keys sorted at every level with no
    final sort. Work: sum over levels of 2 batched rank6 calls on the
    frontier (shared by all four children of an entry)."""
    if not 1 <= s <= MAX_S:
        raise ValueError(f"s must be in [1, {MAX_S}]")
    keys = np.zeros(1, np.int64)
    k = np.zeros(1, np.int64)
    kp = np.zeros(1, np.int64)
    sz = np.full(1, idx.n, np.int64)
    thresh = max(int(min_keep), 1)
    for t in range(s):
        r_k = idx.rank6(k)
        r_ks = idx.rank6(k + sz)
        delta = r_ks - r_k  # [D_t, 6]
        parts = []
        for b, code in enumerate(BASE_CODES):
            code = int(code)
            s2 = delta[:, code]
            keep = s2 >= thresh
            k2 = (r_k[:, code] + idx.C[code])[keep]
            kp2 = (kp + (KP_WEIGHT[code][None, :] * delta).sum(axis=1))[keep]
            parts.append((keys[keep] | (np.int64(b) << (2 * t)),
                          k2, kp2, s2[keep]))
        keys = np.concatenate([p[0] for p in parts])
        k = np.concatenate([p[1] for p in parts])
        kp = np.concatenate([p[2] for p in parts])
        sz = np.concatenate([p[3] for p in parts])
    dt = np.int32 if idx.n < 2**31 else np.int64
    return keys, np.stack((k, kp, sz), axis=1).astype(dt)


def sparse_dict_key(idx: RIndex, s: int, min_keep: int = 1) -> str:
    """Content key of (index, s, min_keep) - the dictionary is a pure
    function of these (same scheme as mertable.mer_table_key)."""
    import hashlib

    h = hashlib.sha1()
    h.update(np.int64([0x5D1C7, s, min_keep, idx.n, idx.n_runs]).tobytes())
    h.update(np.ascontiguousarray(idx.run_sym).tobytes())
    h.update(np.ascontiguousarray(idx.run_len).tobytes())
    return h.hexdigest()[:16]


def get_sparse_dict(idx: RIndex, s: int, path=None, min_keep: int = 1):
    """Cached build: (keys, vals) persisted at `path` keyed by content."""
    import os
    import sys

    key = sparse_dict_key(idx, s, min_keep)
    if path is not None and os.path.exists(path):
        try:
            with np.load(path, allow_pickle=False) as z:
                if str(z["key"]) == key:
                    return z["keys"], z["vals"]
            print(f"sparse dict {path}: stale key, rebuilding", file=sys.stderr)
        except Exception as exc:
            print(f"sparse dict {path}: unreadable ({exc}), rebuilding",
                  file=sys.stderr)
    keys, vals = build_sparse_dict(idx, s, min_keep)
    if path is not None:
        try:
            tmp = f"{path}.tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                np.savez(fh, keys=keys, vals=vals, key=key)
            os.replace(tmp, path)
        except Exception as exc:
            print(f"sparse dict {path}: not saved ({exc})", file=sys.stderr)
    return keys, vals


def lookup_read_windows(keys: np.ndarray, read_keys: np.ndarray,
                        read_valid: np.ndarray) -> np.ndarray:
    """Dictionary row index per read window (-1 = absent/invalid).

    read_keys/read_valid: [B, L+1] from read_mer_keys(codes, lens, s).
    Host-side np.searchsorted - one binary search per window, outside the
    device serving loop (the same once-per-batch host precompute as the
    read keys themselves). Queries are sorted first: consecutive probes
    then walk the key array nearly monotonically (cache-resident upper
    levels), measured 2.4x faster than direct random-order lookups."""
    if len(keys) == 0:  # nothing occurs at this s (tiny index): all miss
        return np.full(read_keys.shape, -1, np.int32)
    flat = read_keys.reshape(-1).astype(np.int64)
    o = np.argsort(flat, kind="stable")
    ps = np.searchsorted(keys, flat[o])
    pos = np.empty_like(ps)
    pos[o] = ps
    pos_c = np.minimum(pos, len(keys) - 1)
    hit = (keys[pos_c] == flat) & read_valid.reshape(-1)
    return np.where(hit, pos_c, -1).reshape(read_keys.shape).astype(np.int32)
