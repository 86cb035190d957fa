"""TPU serving measurements on the big cached indexes (VERDICT r4 items 2/7).

  600M : the 600 Mbp depth-90 index (n/r=33.4). mer_m=14 exercises the
         hybrid on-device seed-table build at the scale that crashed the
         TPU worker in round 3 (PERF.md:106-113) - the item-2 validation.
  2.3G : the 2.304 Gbp depth-90 index (n = 2^31 + 156.5M) through the
         two-level checkpoint + int64 position path - the item-7 serving
         measurement.

Usage: python examples/big_serve_probe.py [600M|2.3G] [mer_m]
(indexes must already be cached by examples/bign_build_serve.py and the
synth600 build; nothing here rebuilds them).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

CONFIGS = {
    "600M": dict(base_len=6_666_666, n_haps=90, seed=13, mer_m=14),
    "2.3G": dict(base_len=25_600_000, n_haps=90, seed=11, mer_m=12),
}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "600M"
    cfg = CONFIGS[name]
    mer_m = int(sys.argv[2]) if len(sys.argv) > 2 else cfg["mer_m"]

    bench.setup_compilation_cache()
    from pangenome_index_tpu.utils.synth import build_synth_index, synth_reads

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    t0 = time.perf_counter()
    idx, lines = build_synth_index(cfg["base_len"], cfg["n_haps"],
                                   snp_rate=0.002, seed=cfg["seed"],
                                   cache_dir=cache)
    print(f"[{name}] n={idx.n} r={idx.n_runs} n/r={idx.n/idx.n_runs:.1f} "
          f"load {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    reads = synth_reads(lines, bench.N_READS, bench.READ_LEN, error_rate=0.01,
                        seed=1)
    codes, lens = bench.encode_reads(reads, bench.N_READS, bench.READ_LEN)
    del lines

    # round 5: tag queries join the measured loop (cached synthetic tag
    # array) and the sparse long-seed dictionary runs as a second leg -
    # both opportunistic (cache-gated for the dictionary: the 2.3G host
    # frontier build is ~tens of minutes, pre-built by
    # examples/prebuild_big_aux.py)
    tags = None
    try:
        from pangenome_index_tpu.utils.synth import synth_tag_array

        t0 = time.perf_counter()
        tags = synth_tag_array(idx, cache_dir=cache)
        print(f"[{name}] tag array: {tags.n_runs} runs "
              f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)
    except Exception as exc:
        print(f"[{name}] tag array unavailable ({exc}); MEM-only",
              file=sys.stderr)

    # prefer_build: ~0 tunnel bytes for the seed table; step-down covers a
    # build failure. persist only when no cache exists yet.
    # mem_only: at 72M runs the per-run/locate tables are ~2.4 GB of pure
    # transfer that MEM serving never reads
    mem_only = idx.n_runs > 30_000_000
    m = bench.serve_measure(idx, codes, lens, chunk=None, mer_m=mer_m,
                            mer_cache_dir=cache, prefer_build=True,
                            measure_ext=False, mem_only=mem_only,
                            tag_tables=tags)
    row = {
        "scale": name, "n": idx.n, "r": int(idx.n_runs),
        "mer_m": m["mer_m"],
        "tpu_reads_per_s": round(m["device_rps"], 1),
        "tpu_mem_tags_reads_per_s": (round(m["tags_rps"], 1)
                                     if m.get("tags_rps") else None),
        "pos_dtype": "int64" if idx.n >= 2**31 else "int32",
    }
    print(json.dumps(row), flush=True)

    from pangenome_index_tpu.ops.sparsedict import sparse_dict_key

    s_long = bench.MIN_LEN - 1
    sd_path = os.path.join(cache, f"sdict_{sparse_dict_key(idx, s_long)}.npz")
    if os.path.exists(sd_path):
        import numpy as np

        from pangenome_index_tpu.ops.sparsedict import get_sparse_dict

        keys_sd, vals_sd = get_sparse_dict(idx, s_long, path=sd_path)
        msd = bench.serve_measure(idx, codes, lens, chunk=None,
                                  mer_m=m["mer_m"], mer_cache_dir=cache,
                                  prefer_build=True, measure_ext=False,
                                  mem_only=mem_only, tag_tables=tags,
                                  sdict=(keys_sd, vals_sd, s_long))
        assert np.array_equal(msd["counts"], m["counts"]), "count mismatch!"
        row.update(tpu_sdict_reads_per_s=round(msd["device_rps"], 1),
                   tpu_sdict_mem_tags_reads_per_s=(
                       round(msd["tags_rps"], 1) if msd.get("tags_rps")
                       else None),
                   long_seed_s=s_long)
        print(json.dumps(row), flush=True)
    else:
        print(f"[{name}] no sdict cache at {sd_path}; skipping the "
              f"long-seed leg", file=sys.stderr)

    r1 = bench.native_baseline(idx, codes, lens, m["counts"], n_threads=1,
                               tags=tags)
    if tags is not None:
        row["native_1t_reads_per_s"], row["native_1t_mem_tags_reads_per_s"] = \
            round(r1[0], 1), round(r1[1], 1)
        r1 = r1[0]
    else:
        row["native_1t_reads_per_s"] = round(r1, 1)
    row["vs_core"] = round(row.get("tpu_sdict_reads_per_s",
                                   row["tpu_reads_per_s"]) / r1, 2)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
