"""Single-chip overhead of the model-sharded serving formulation.

Runs the SAME read batch through (a) the plain single-device MEM engine and
(b) the distributed engine's shard_map step on a 1x1 mesh - the sharded
checkpoint-rank provider with owner masks, clipped local rows, and the psum
(a no-op collective at axis size 1). The delta is the pure formulation cost
a real (data x model) deployment pays per device on top of single-chip
serving, excluding ICI latency (not measurable on one chip).

Usage: python examples/model_shard_overhead.py [--lanes 4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=4096)
    ap.add_argument("--big", action="store_true")
    args = ap.parse_args()

    B.setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pangenome_index_tpu.ops.mems import find_mems_batch
    from pangenome_index_tpu.ops.tables import rindex_to_device
    from pangenome_index_tpu.parallel.engine import make_distributed_mem_step
    from pangenome_index_tpu.parallel.sharding import make_mesh, pad_rindex_tables
    from pangenome_index_tpu.utils.synth import build_synth_index, synth_reads

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    base_len, seed = (B.BIG_BASE_LEN, B.BIG_SEED) if args.big else (B.BASE_LEN, 0)
    idx, lines = build_synth_index(base_len, B.N_HAPS, snp_rate=0.002,
                                   seed=seed, cache_dir=cache)
    dev = jax.devices()[0]
    lanes, L = args.lanes, B.READ_LEN
    reads = synth_reads(lines, lanes, L, error_rate=0.01, seed=1)
    codes_np, lens_np = B.encode_reads(reads, lanes, L)
    codes = jax.device_put(jnp.asarray(codes_np), dev)
    lens = jax.device_put(jnp.asarray(lens_np), dev)

    t = jax.device_put(rindex_to_device(idx, checkpoint=True), dev)
    mesh = make_mesh(1, 1)
    t_pad = pad_rindex_tables(idx, 1, checkpoint=True)
    step = make_distributed_mem_step(mesh, capacity=8, tables=t_pad)

    def run_plain():
        return find_mems_batch(t, codes, lens, B.MIN_LEN, B.MIN_OCC, capacity=8)

    def run_sharded():
        with mesh:
            res, _ = step(t_pad, codes, lens,
                          jnp.asarray(B.MIN_LEN, t_pad.pos_dtype),
                          jnp.asarray(B.MIN_OCC, t_pad.pos_dtype))
        return res

    c_plain = np.asarray(run_plain().count)   # compile + correctness anchor
    c_shard = np.asarray(run_sharded().count)
    assert np.array_equal(c_plain, c_shard), "sharded formulation diverged"
    # extra warm launches so BOTH programs are equally warm before timing
    # (the round-3 A/B ran plain first and its warm-up asymmetry confounded
    # the comparison - VERDICT r4 weak #7)
    np.asarray(run_plain().count)
    np.asarray(run_sharded().count)

    # sharded/plain/sharded bracket in one process: the repeat sharded leg
    # bounds tunnel drift, so the honest overhead is plain vs the bracket
    results = {}
    for name, fn in [("sharded", run_sharded), ("plain", run_plain),
                     ("sharded2", run_sharded)]:
        t0 = time.perf_counter()
        n_rep = 3
        pend = [fn() for _ in range(n_rep)]
        _ = [np.asarray(p.count) for p in pend]
        dt = (time.perf_counter() - t0) / n_rep
        results[name] = lanes / dt
        print(f"[shard-overhead] {name:10s} {lanes/dt:8.0f} reads/s",
              file=sys.stderr)
    bracket = (results["sharded"] + results["sharded2"]) / 2
    print(f"[shard-overhead] overhead of the sharded formulation: "
          f"{(results['plain'] / bracket - 1) * 100:+.1f}% "
          f"(plain {results['plain']:.0f} vs sharded bracket {bracket:.0f}; "
          f"drift between sharded legs "
          f"{abs(results['sharded'] - results['sharded2']) / bracket * 100:.1f}%)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
