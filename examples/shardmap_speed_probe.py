"""Isolate WHY the shard_map serving step outruns the plain jit engine.

model_shard_overhead measured the 1x1-mesh sharded step 1.75x FASTER than
the plain jit of the identical computation (25.8k vs 14.8k reads/s,
bracketed, drift 2.5% - round-5). Two candidate causes:

  A. the shard_map WRAPPING itself (manual-partitioning lowering compiles
     the while_loop/gathers differently), or
  B. the distributed rank FORMULATION (owner-mask + clipped local gather +
     psum) happening to lower better than the direct ckpt gather.

Variants, all 4096 lanes on one chip, bracketed by repeats:
  plain        find_mems_batch(t, ...)                       [baseline]
  wrap         shard_map(1x1, all-replicated) around the SAME body with the
               LOCAL rank provider -> isolates A
  dist         the production sharded step (distributed provider) -> A + B
  plain_seed / wrap_seed: the m=14-seeded engine under the same wrap -> does
               the win carry to the production seeded path?

Usage: python examples/shardmap_speed_probe.py [lanes]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    B.setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from pangenome_index_tpu.ops.mems import MemResult, find_mems_batch, find_mems_impl
    from pangenome_index_tpu.ops.mertable import mer_table_key, read_mer_keys
    from pangenome_index_tpu.ops.tables import RIndexTables, rindex_to_device
    from pangenome_index_tpu.parallel.engine import make_distributed_mem_step
    from pangenome_index_tpu.parallel.sharding import make_mesh, pad_rindex_tables
    from pangenome_index_tpu.utils.synth import build_synth_index, synth_reads

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    idx, lines = build_synth_index(B.BIG_BASE_LEN, B.N_HAPS, snp_rate=0.002,
                                   seed=B.BIG_SEED, cache_dir=cache)
    dev = jax.devices()[0]
    reads = synth_reads(lines, lanes, B.READ_LEN, error_rate=0.01, seed=1)
    codes_np, lens_np = B.encode_reads(reads, lanes, B.READ_LEN)
    codes = jax.device_put(jnp.asarray(codes_np), dev)
    lens = jax.device_put(jnp.asarray(lens_np), dev)

    t = jax.device_put(rindex_to_device(idx, checkpoint=True), dev)
    mesh = make_mesh(1, 1)
    t_pad = pad_rindex_tables(idx, 1, checkpoint=True)
    step_dist = make_distributed_mem_step(mesh, capacity=8, tables=t_pad)

    # variant "wrap": same mesh, but every input replicated and the body
    # uses the LOCAL provider (no owner masks, no psum)
    specs_t = jax.tree.map(lambda _: P(), RIndexTables(*(0,) * 10),
                           is_leaf=lambda x: True)

    def make_wrap(mer_m=0):
        mer_in = (P(), P(), P()) if mer_m else ()

        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(specs_t, P(), P(), P(), P(), *mer_in),
                           out_specs=jax.tree.map(lambda _: P(),
                                                  MemResult(*(0,) * 6)),
                           check_vma=False)
        def wrap(t_l, codes, lengths, min_len, min_occ, *mer):
            kw = {}
            if mer_m:
                kw = dict(mer_table=mer[0], mer_keys=mer[1], mer_valid=mer[2],
                          mer_m=mer_m)
            return find_mems_impl(t_l, codes, lengths, min_len, min_occ,
                                  capacity=8, **kw)
        return jax.jit(wrap)

    wrap0 = make_wrap()
    ml = jnp.asarray(B.MIN_LEN, t.pos_dtype)
    mo = jnp.asarray(B.MIN_OCC, t.pos_dtype)

    # seeded variants (m=14 from the bench cache)
    mer_m = 14
    mt = None
    p = os.path.join(cache, f"mer_{mer_table_key(idx, mer_m)}.npz")
    if os.path.exists(p):
        with np.load(p) as z:
            mt = jax.device_put(jnp.asarray(z["table"]), dev)
        mk, mv = read_mer_keys(codes_np, lens_np, mer_m)
        mk = jax.device_put(jnp.asarray(mk), dev)
        mv = jax.device_put(jnp.asarray(mv), dev)
        wrap14 = make_wrap(mer_m)

    variants = {
        "plain": lambda: find_mems_batch(t, codes, lens, B.MIN_LEN, B.MIN_OCC,
                                         capacity=8),
        "wrap": lambda: wrap0(t, codes, lens, ml, mo),
        "dist": lambda: step_dist(t_pad, codes, lens, ml, mo)[0],
    }
    if mt is not None:
        variants["plain_seed"] = lambda: find_mems_batch(
            t, codes, lens, B.MIN_LEN, B.MIN_OCC, capacity=8, mer_table=mt,
            mer_keys=mk, mer_valid=mv, mer_m=mer_m)
        variants["wrap_seed"] = lambda: wrap14(t, codes, lens, ml, mo, mt, mk, mv)

    ref = None
    with mesh:
        for name, fn in variants.items():
            c = np.asarray(fn().count)
            if ref is None:
                ref = c
            assert np.array_equal(c, ref), f"{name} diverged"
        results = {}
        # interleaved 2-round bracket: drift shows up as round disagreement
        for rnd in range(2):
            for name, fn in variants.items():
                t0 = time.perf_counter()
                pend = [fn() for _ in range(3)]
                _ = [np.asarray(p.count) for p in pend]
                dt = (time.perf_counter() - t0) / 3
                results.setdefault(name, []).append(round(lanes / dt))
                print(f"[probe r{rnd}] {name:11s} {lanes/dt:8.0f} reads/s",
                      file=sys.stderr, flush=True)
    print(json.dumps({"lanes": lanes, **results}), flush=True)


if __name__ == "__main__":
    main()
