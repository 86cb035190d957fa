"""One-off validation of the n > 2^31 serving path (VERDICT r4 item 4/7).

Builds a synthetic repetitive r-index whose BWT length exceeds 2^31 (small r,
huge runs - the regime the two-level checkpoint layout exists for), builds
the real two-level table (SUPER_SHIFT=30, int64 positions, x64 enabled by
_pick_dtype), and equality-checks device rank6 / LF-range / extension against
the host model at sampled positions spanning the whole space, including
superblock boundaries. Run on the CPU backend:

    JAX_PLATFORMS=cpu python examples/bign_ckpt_probe.py

Memory: the ckpt table is (n>>6) * 64 B ~= 2.15 GB at n = 2^31 + 2^27.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_big_rindex(n_target: int, r: int, seed: int = 0):
    from pangenome_index_tpu.models.rindex import RIndex

    rng = np.random.default_rng(seed)
    # random run lengths summing to ~n_target, random symbols 0..5 with no
    # adjacent repeats (true run structure)
    lens = rng.integers(1, 2 * n_target // r, size=r).astype(np.int64)
    lens[-1] += max(n_target - int(lens.sum()), 1)
    syms = np.empty(r, np.int8)
    syms[0] = rng.integers(0, 6)
    for i in range(1, r):
        s = rng.integers(0, 5)
        syms[i] = s + (s >= syms[i - 1])
    start = np.zeros(r, np.int64)
    np.cumsum(lens[:-1], out=start[1:])
    n = int(lens.sum())
    cum = np.zeros((r, 6), np.int64)
    onehot = np.zeros((r, 6), np.int64)
    onehot[np.arange(r), syms] = lens
    np.cumsum(onehot[:-1], axis=0, out=cum[1:])
    totals = onehot.sum(axis=0)
    C = np.zeros(7, np.int64)
    np.cumsum(totals, out=C[1:])
    return RIndex(run_sym=syms, run_start=start, run_len=lens, cum=cum, C=C,
                  n=n, n_seq=int(totals[0]) or 1, max_len=n,
                  samples=np.zeros(r, np.int64),
                  last_sorted=start + lens - 1,
                  last_to_run=np.arange(r, dtype=np.int64))


def main():
    import jax.numpy as jnp

    from pangenome_index_tpu.ops import rank
    from pangenome_index_tpu.ops.tables import rindex_to_device

    n_target = 2**31 + 2**27
    idx = synth_big_rindex(n_target, r=50_000)
    print(f"[bign] n = {idx.n} (= 2^31 + {idx.n - 2**31}), r = {idx.n_runs}")
    t0 = time.perf_counter()
    t = rindex_to_device(idx, checkpoint=True)
    print(f"[bign] two-level ckpt built in {time.perf_counter()-t0:.1f}s: "
          f"rows {t.ckpt.shape} int32, super {t.ckpt_super.shape} "
          f"(pos dtype {t.pos_dtype.__name__ if hasattr(t.pos_dtype,'__name__') else t.pos_dtype})")
    assert t.ckpt_super is not None and t.ckpt.dtype == jnp.int32

    rng = np.random.default_rng(1)
    pos = np.unique(np.concatenate([
        rng.integers(0, idx.n + 1, size=512),
        # superblock + bucket boundaries and their neighbors
        np.array([0, 1, 63, 64, 2**30 - 1, 2**30, 2**30 + 1,
                  2**31 - 1, 2**31, 2**31 + 1, idx.n - 1, idx.n], np.int64),
    ]))
    host = np.stack([idx.rank6(int(p)) for p in pos])
    dev = np.asarray(rank.rank6(t, jnp.asarray(pos, t.pos_dtype)))
    np.testing.assert_array_equal(dev, host)
    print(f"[bign] rank6 equality at {len(pos)} positions (incl. boundaries): OK")

    # LF-range through the device path vs host LF on random intervals
    codes = rng.integers(1, 6, size=64).astype(np.int64)
    f0 = rng.integers(0, idx.n - 1, size=64)
    s0 = np.minimum(f0 + rng.integers(0, idx.n // 2, size=64), idx.n - 1)
    df, ds = (np.asarray(a) for a in rank.lf_range(
        t, jnp.asarray(f0, t.pos_dtype), jnp.asarray(s0, t.pos_dtype),
        jnp.asarray(codes, t.pos_dtype)))
    for i in range(64):
        lo = idx.rank(int(f0[i]), int(codes[i]))
        hi = idx.rank(int(s0[i]) + 1, int(codes[i]))
        if hi - lo > 0:
            assert df[i] == lo + idx.C[codes[i]] and \
                   ds[i] == lo + idx.C[codes[i]] + (hi - lo) - 1, i
        else:
            assert (df[i], ds[i]) == (1, 0), i
    print("[bign] LF-range equality on 64 random intervals: OK")
    print("[bign] PASS: n > 2^31 serves through the two-level ckpt path")


if __name__ == "__main__":
    main()
