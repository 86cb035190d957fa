"""Serving-loop cost ablation (round-3 optimization, VERDICT item 1).

CAVEAT learned the hard way: the synthetic seed tables below are zeros/ones,
which XLA CONSTANT-FOLDS — the `2seed_onehot` variant therefore measured ~0
while the real seed block costs ~8.5us/iter of genuine [B, L+1] table reads
(PERF.md round 3). When ablating a memory-bound component, feed it data the
compiler cannot fold away (e.g. device-put random tables); the capacity-A/B
(find_mems_batch capacity=32 vs 2) was the trustworthy probe here.

Within ONE process (the tunnel has +-20-30% run-to-run variance, so only
within-run A/B is trusted), measures:

  1. bare extension loop (all lanes active, nothing but extend())
  2. bare + each serving-loop body component grafted in, one at a time,
     to get the MARGINAL cost of: the read-local codes one-hot select,
     the same lookup as a flat gather, the two m-mer seed one-hot blocks,
     the same as flat gathers, and the MEM-emission one-hot adds
  3. real serving with step counting -> in-serving steps/s + active-lane
     fraction (straggler/idle factor)

Usage: python examples/ablate_serving.py [--big] [--lanes 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def timed_loop(fn, *args, iters_warm=100, iters_hot=1100):
    """Rate of one loop iteration via the two-run subtraction trick."""
    float(fn(*args, iters_warm))
    t0 = time.perf_counter()
    float(fn(*args, iters_hot))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fn(*args, iters_warm))
    d0 = time.perf_counter() - t0
    return (iters_hot - iters_warm) / max(d1 - d0, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true", help="20 Mbp config")
    ap.add_argument("--lanes", type=int, default=4096)
    ap.add_argument("--skip-serving", action="store_true")
    args = ap.parse_args()

    B.setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pangenome_index_tpu.ops import fmd
    from pangenome_index_tpu.ops.mems import find_mems_batch
    from pangenome_index_tpu.ops.mertable import (mer_table_key, read_mer_keys,
                                                  seed_difficulty)
    from pangenome_index_tpu.ops.tables import rindex_to_device
    from pangenome_index_tpu.utils.synth import build_synth_index, synth_reads

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    base_len, seed = (B.BIG_BASE_LEN, B.BIG_SEED) if args.big else (B.BASE_LEN, 0)
    idx, lines = build_synth_index(base_len, B.N_HAPS, snp_rate=0.002,
                                   seed=seed, cache_dir=cache)
    print(f"[ablate] index n={idx.n} runs={idx.n_runs}", file=sys.stderr)
    dev = jax.devices()[0]
    t = jax.device_put(rindex_to_device(idx, checkpoint=True), dev)

    lanes = args.lanes
    L = B.READ_LEN
    M = 32
    pd = t.run_start.dtype

    reads = synth_reads(lines, lanes, L, error_rate=0.01, seed=1)
    codes_np, lens_np = B.encode_reads(reads, lanes, L)
    codes_pad = jnp.asarray(np.pad(codes_np, ((0, 0), (0, 1))), jnp.int32)
    lens_d = jax.device_put(jnp.asarray(lens_np), dev)

    # fake per-read seed tables with realistic shapes/dtypes
    seed_k = jnp.zeros((lanes, L + 1), pd)
    seed_kp = jnp.zeros((lanes, L + 1), pd)
    seed_s = jnp.ones((lanes, L + 1), pd)
    codes_flat = codes_pad.reshape(-1)
    seed_rows = jnp.stack((seed_k, seed_kp, seed_s,
                           jnp.zeros_like(seed_k)), -1).reshape(-1, 4)

    iotaL = jnp.arange(L + 1, dtype=jnp.int32)[None, :]
    iotaM = jnp.arange(M, dtype=jnp.int32)[None, :]
    lane_ids = jnp.arange(lanes, dtype=jnp.int32)

    def fold(k, extra):
        # data-dependent no-op: keeps `extra` alive without changing k
        return k + (extra > jnp.asarray(2**30, extra.dtype)).astype(k.dtype) \
            if extra.ndim == 1 else k + (extra.sum(-1) > jnp.asarray(2**30, k.dtype)).astype(k.dtype)

    def make_loop(body_extra):
        @jax.jit
        def loop(t, k, kp, s, c, iters2):
            def body(i, st):
                k, kp, s = st
                j = (k % (L + 1)).astype(jnp.int32)
                k = body_extra(k, kp, s, c, j)
                nk, nkp, ns = fmd.extend(t, k, kp, s, (c + i) % 5 + 1)
                empty = ns <= 0
                return (jnp.where(empty, 0, nk), jnp.where(empty, 0, nkp),
                        jnp.where(empty, t.n, ns))
            k, kp, s = jax.lax.fori_loop(0, iters2, body, (k, kp, s))
            return k.sum() + kp.sum() + s.sum()
        return loop

    def none_extra(k, kp, s, c, j):
        return k

    def codes_onehot(k, kp, s, c, j):
        v = jnp.where(iotaL == j[:, None], codes_pad, 0).sum(axis=1)
        return fold(k, v)

    def codes_gather(k, kp, s, c, j):
        v = codes_flat[lane_ids * (L + 1) + j]
        return fold(k, v)

    def seeds_onehot(k, kp, s, c, j):
        # the phase-0 seed block: 1 [B,L+1] one-hot + 4 masked reproductions
        oh = iotaL == j[:, None]
        row_s = jnp.where(oh, seed_s, 0).sum(axis=1)
        a = jnp.where(oh, seed_k, 0).sum(axis=1)
        b2 = jnp.where(oh, seed_kp, 0).sum(axis=1)
        return fold(fold(fold(k, row_s), a), b2)

    def seeds_gather(k, kp, s, c, j):
        row = seed_rows[lane_ids * (L + 1) + j]  # [B, 4] one gather row
        return fold(k, row)

    def both_seed_blocks_onehot(k, kp, s, c, j):
        k = seeds_onehot(k, kp, s, c, j)
        return seeds_onehot(k, kp, s, c, (j + 7) % (L + 1))

    def both_seed_blocks_gather(k, kp, s, c, j):
        k = seeds_gather(k, kp, s, c, j)
        return seeds_gather(k, kp, s, c, (j + 7) % (L + 1))

    def emit_onehot(k, kp, s, c, j):
        oh_col = (iotaM == (j[:, None] % M))
        v = (jnp.where(oh_col, k[:, None], 0).sum(axis=1)
             + jnp.where(oh_col, kp[:, None], 0).sum(axis=1)
             + jnp.where(oh_col, s[:, None], 0).sum(axis=1)
             + jnp.where(oh_col, c[:, None].astype(pd), 0).sum(axis=1))
        return fold(k, v)

    def full_body_onehot(k, kp, s, c, j):
        k = codes_onehot(k, kp, s, c, j)
        k = both_seed_blocks_onehot(k, kp, s, c, j)
        return emit_onehot(k, kp, s, c, j)

    def full_body_gather(k, kp, s, c, j):
        k = codes_gather(k, kp, s, c, j)
        k = both_seed_blocks_gather(k, kp, s, c, j)
        return emit_onehot(k, kp, s, c, j)

    kz = jnp.zeros(lanes, pd)
    sz = jnp.full(lanes, idx.n, pd)
    cz = jnp.zeros(lanes, jnp.int32)

    variants = [
        ("bare", none_extra),
        ("bare+codes_onehot", codes_onehot),
        ("bare+codes_gather", codes_gather),
        ("bare+2seed_onehot", both_seed_blocks_onehot),
        ("bare+2seed_gather", both_seed_blocks_gather),
        ("bare+emit_onehot", emit_onehot),
        ("bare+fullbody_onehot", full_body_onehot),
        ("bare+fullbody_gather", full_body_gather),
    ]
    base_rate = None
    for name, extra in variants:
        loop = make_loop(extra)
        r = timed_loop(loop, t, kz, kz, sz, cz)
        note = ""
        if name == "bare":
            base_rate = r
        elif base_rate:
            note = f"  (marginal {1e9*(1/r - 1/base_rate):+.0f} ns/iter," \
                   f" {base_rate/r:.2f}x slower)"
        print(f"[ablate] {name:24s} {r:9.0f} iters/s = "
              f"{r*lanes/1e6:7.1f} M lane-steps/s{note}", file=sys.stderr)

    if args.skip_serving:
        return

    # --- real serving with step counting ---
    mer_m = B.MER_M
    mer_path = os.path.join(cache, f"mer_{mer_table_key(idx, mer_m)}.npz")
    mer_table = None
    try:
        with np.load(mer_path, allow_pickle=False) as z:
            mer_table = jax.device_put(jnp.asarray(z["table"]), dev)
        print("[ablate] mer table from cache", file=sys.stderr)
    except FileNotFoundError:
        from pangenome_index_tpu.ops.mertable import build_mer_table_device
        mer_table = build_mer_table_device(t, mer_m)
    mk, mv = read_mer_keys(codes_np, lens_np, mer_m)
    proxy = np.asarray(seed_difficulty(np.asarray(mer_table), mk, mv, 1,
                                       lengths=lens_np, m=mer_m))
    order = np.argsort(proxy, kind="stable")
    codes_d = jax.device_put(jnp.asarray(codes_np[order]), dev)
    lens_o = jax.device_put(jnp.asarray(lens_np[order]), dev)
    mer_keys = jax.device_put(jnp.asarray(mk[order]), dev)
    mer_valid = jax.device_put(jnp.asarray(mv[order]), dev)

    for label, kw in [
        ("serving(seeded)", dict(mer_table=mer_table, mer_keys=mer_keys,
                                 mer_valid=mer_valid, mer_m=mer_m)),
        ("serving(no-seed)", {}),
    ]:
        res, stats = find_mems_batch(t, codes_d, lens_o, B.MIN_LEN, B.MIN_OCC,
                                     capacity=M, with_stats=True, **kw)
        steps = int(stats["steps"])
        iters = int(stats["iters"])
        t0 = time.perf_counter()
        n_rep = 3
        pend = [find_mems_batch(t, codes_d, lens_o, B.MIN_LEN, B.MIN_OCC,
                                capacity=M, with_stats=True, **kw)
                for _ in range(n_rep)]
        _ = [np.asarray(p[1]["steps"]) for p in pend]
        dt = (time.perf_counter() - t0) / n_rep
        print(f"[ablate] {label:17s} {lanes/dt:8.0f} reads/s | {iters} iters, "
              f"{steps} steps ({steps/lanes:.0f}/read), active "
              f"{steps/(iters*lanes)*100:.1f}% | in-serving "
              f"{steps/dt/1e6:.1f} M steps/s, iter rate {iters/dt:.0f}/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
