"""m-mer seed table: precomputed FMD bi-intervals for every ACGT m-mer.

MEM finding restarts backward extension from the full interval at every
find_mems_function call (steps 1 and 3, algorithm.hpp:661, 718). Interval
sizes are non-increasing along an extension, so if the final m-mer interval
still satisfies min_occ, every intermediate step did too - meaning the first
m extensions can be replaced by ONE table lookup with exact semantics
(dropout cases fall back to stepwise extension to recover the precise
failure position).

The table is built host-side by level-synchronous batched extension
(4^1 -> 4^2 -> ... -> 4^m); at m=10 it is 4^10 x 3 int32 = 12 MB in HBM, and
skips 2m of the ~(2*min_len + forward) extensions per MEM call.
"""

from __future__ import annotations

import numpy as np

from ..models.rindex import RIndex
from ..utils.alphabet import KP_WEIGHT

#: ACGT bases in 2-bit key order (A=0, C=1, G=2, T=3) -> alphabet codes
BASE_CODES = np.array([1, 2, 3, 5], dtype=np.int64)
#: alphabet code -> 2-bit base (or -1)
CODE_TO_BASE = np.full(8, -1, dtype=np.int64)
for _b, _c in enumerate(BASE_CODES):
    CODE_TO_BASE[_c] = _b


def _batched_backward_extend(idx: RIndex, k, kp, s, code: int):
    r_k = idx.rank6(k)
    r_ks = idx.rank6(k + s)
    delta = r_ks - r_k
    kp2 = kp + (KP_WEIGHT[code][None, :] * delta).sum(axis=1)
    s2 = delta[:, code]
    k2 = r_k[:, code] + idx.C[code]
    ok = s2 > 0
    return np.where(ok, k2, 0), np.where(ok, kp2, 0), np.where(ok, s2, 0)


def build_mer_table(idx: RIndex, m: int) -> np.ndarray:
    """[4^m, 3] array of (k, kp, s) for every m-mer, keyed by the 2-bit pack
    with the LEFTMOST character in the highest bits (matching core/kmers)."""
    k = np.zeros(1, dtype=np.int64)
    kp = np.zeros(1, dtype=np.int64)
    s = np.full(1, idx.n, dtype=np.int64)
    # build right-to-left: level t holds intervals of all length-t suffixes,
    # keyed by their 2-bit pack (leftmost char of the suffix in high bits)
    for t in range(m):
        size = 4**t
        nk = np.empty(4 * size, dtype=np.int64)
        nkp = np.empty(4 * size, dtype=np.int64)
        ns = np.empty(4 * size, dtype=np.int64)
        for b, code in enumerate(BASE_CODES):
            # prepending base b: new_key = b << (2t) | old_key
            ek, ekp, es = _batched_backward_extend(idx, k, kp, s, int(code))
            nk[b * size : (b + 1) * size] = ek
            nkp[b * size : (b + 1) * size] = ekp
            ns[b * size : (b + 1) * size] = es
        k, kp, s = nk, nkp, ns
    return np.stack((k, kp, s), axis=1)


_build_mer_jit = None


def build_mer_table_device(t, m: int) -> "jax.Array":
    """Device-side table build: batched extension over the FULL 4^m key
    space with a fori_loop over the m levels (fixed [4^m] shapes).

    Every key carries its own interval state; after level v, state[key] is
    the bi-interval of key's length-v suffix (keys sharing low bits
    duplicate work - an m/2x redundancy factor). The win is compile time:
    one extend + one fori_loop compiles in seconds, where the
    growing-shape expansion (4^1..4^m traced as 4m separate extends) took
    minutes of XLA time per process and made serving cold-start ~190s
    (PERF.md round 1). Device work at m=12 is a few seconds.

    The jitted builder is module-level, so repeat calls with the same
    tables/m hit the jit cache instead of re-tracing."""
    global _build_mer_jit
    if _build_mer_jit is None:
        import functools

        import jax
        import jax.numpy as jnp

        from .fmd import extend

        @functools.partial(jax.jit, static_argnames="m")
        def _build(t, m):
            pd = t.pos_dtype
            size = 4**m
            # slab the key space: a full-width extend materializes
            # [4^m, row] gather temps (1+ GB/temp at m=12 in checkpoint
            # mode - HBM OOM); lax.map bounds live temps to one slab
            slab = min(size, 1 << 18)
            n_slabs = size // slab
            keys = jnp.arange(size, dtype=jnp.int32).reshape(n_slabs, slab)
            k = jnp.zeros((n_slabs, slab), pd)
            kp = jnp.zeros((n_slabs, slab), pd)
            s = jnp.full((n_slabs, slab), t.n, pd)

            def body(v, st):
                def one(args):
                    kk, k1, kp1, s1 = args
                    # prepend the char left of the length-v suffix: 2-bit
                    # base at bit 2v; codes are 1,2,3,5 for bases 0,1,2,3
                    b = (kk >> (2 * v)) & 3
                    c = b + 1 + (b == 3)
                    return extend(t, k1, kp1, s1, c)

                return jax.lax.map(one, (keys, *st))

            k, kp, s = jax.lax.fori_loop(0, m, body, (k, kp, s))
            return jnp.stack((k.reshape(size), kp.reshape(size),
                              s.reshape(size)), axis=1)

        _build_mer_jit = _build
    return _build_mer_jit(t, m)


def mer_table_key(idx: RIndex, m: int) -> str:
    """Content key of the (index, m) pair the table is a pure function of."""
    import hashlib

    h = hashlib.sha1()
    h.update(np.int64([m, idx.n, idx.n_runs]).tobytes())
    h.update(np.ascontiguousarray(idx.run_sym).tobytes())
    h.update(np.ascontiguousarray(idx.run_len).tobytes())
    return h.hexdigest()[:16]


def cached_mer_table(idx: RIndex, m: int, path=None) -> np.ndarray:
    """Load the seed table from `path` when its content key matches the
    index, else build and persist it there. Kills the serving cold-start:
    the table is a pure function of (index, m), so a production engine
    should pay the expansion once per index, not once per process."""
    import sys

    key = mer_table_key(idx, m)
    if path is not None:
        try:
            with np.load(path, allow_pickle=False) as z:
                if str(z["key"]) == key:
                    return z["table"]
                print(f"mer cache {path}: stale key, rebuilding", file=sys.stderr)
        except FileNotFoundError:
            pass
        except Exception as exc:
            print(f"mer cache {path}: unreadable ({exc}), rebuilding", file=sys.stderr)
    table = build_mer_table(idx, m)
    if path is not None:
        import os

        try:
            tmp = f"{path}.tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                np.savez(fh, table=table, key=key)
            os.replace(tmp, path)
        except Exception as exc:
            print(f"mer cache {path}: not saved ({exc})", file=sys.stderr)
    return table


def seed_difficulty(mer_table, keys, valid, min_occ, lengths=None, m=None):
    """Per-read work proxy for work-sorted chunking: the number of *in-read*
    windows whose precomputed m-mer interval fails min_occ (error sites and
    rare regions force stepwise fallback and extra MEM restarts, which set
    the lockstep loop's iteration count). Sorting a multi-chunk batch by this
    proxy makes each lane chunk work-homogeneous, so the per-chunk max tracks
    the chunk mean instead of the global max (+6% serving throughput at
    4 Mbp / 1% read errors, see PERF.md). Accepts numpy or jax arrays of
    matching kinds; returns [B] counts.

    With lengths/m given, only windows inside each read count: padding
    windows past a short read's end need zero loop iterations, so counting
    them (as ~valid alone would) would rank short reads hardest and weaken
    chunk work-homogeneity for variable-length batches.
    """
    s = mer_table[keys.reshape(-1), 2].reshape(keys.shape)
    bad = ((s < max(int(min_occ), 1)) & valid).sum(axis=1)
    if lengths is None:
        return bad + (~valid).sum(axis=1)
    # invalid-but-inside windows = in-read window count minus valid count
    in_read = (lengths - (m - 1)).clip(0)
    return bad + in_read - valid.sum(axis=1)


def read_mer_keys(codes: np.ndarray, lengths: np.ndarray, m: int):
    """Per-position rolling m-mer keys for a read batch.

    codes: [B, L] alphabet codes. Returns (keys [B, L+1] int32,
    valid [B, L+1] bool) where entry i describes the window codes[i-m+1 .. i];
    valid requires the window to be ACGT-only and fully inside the read.
    """
    B, L = codes.shape
    base = CODE_TO_BASE[codes]
    ok = base >= 0
    keys = np.zeros((B, L + 1), dtype=np.int64)
    valid = np.zeros((B, L + 1), dtype=bool)
    if L >= m:
        win = np.lib.stride_tricks.sliding_window_view(base, m, axis=1)  # [B, L-m+1, m]
        okw = np.lib.stride_tricks.sliding_window_view(ok, m, axis=1).all(axis=2)
        shifts = (2 * (m - 1 - np.arange(m))).astype(np.int64)
        kv = (np.maximum(win, 0) << shifts[None, None, :]).sum(axis=2)
        keys[:, m - 1 : L] = kv
        inside = (np.arange(m - 1, L)[None, :] < lengths[:, None])
        valid[:, m - 1 : L] = okw & inside
    return keys.astype(np.int32), valid
