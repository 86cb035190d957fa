"""Sparse long-seed dictionary A/B on the aligner-realistic serving row.

VERDICT r4 item 1: the min_len=31/min_occ=5 row measures 14.1-14.2k reads/s
(8.4x vs ideal-linear 32-core) - the residual is the ~2(min_len-1-m)
DEPENDENT rank gathers per MEM call that the dense m=14 table cannot remove.
The sparse dictionary (ops/sparsedict.py) stores the bi-interval of every
OCCURRING (min_len-1)-mer, so a passing step-1 window becomes ONE stepwise
extension. This script runs the within-process bracket
base(m) -> m+sdict -> base(m) with identical-MEM-count assertions, plus the
native baseline. Done-bar: >= ~17.5k reads/s at depth90 ml=31/mo=5
(~10.5x ideal-linear at the 845/core round-3 baseline).

Usage: python examples/longseed_ab.py [depth90|20|100] [min_len] [min_occ]
       [mer_m] [s_long]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from examples.serve_scale_bench import SCALES


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "depth90"
    min_len = int(sys.argv[2]) if len(sys.argv) > 2 else 31
    min_occ = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    mer_m = int(sys.argv[4]) if len(sys.argv) > 4 else 14
    s_long = int(sys.argv[5]) if len(sys.argv) > 5 else min(min_len - 1, 31)

    bench.setup_compilation_cache()
    from pangenome_index_tpu.ops.sparsedict import get_sparse_dict
    from pangenome_index_tpu.utils.synth import build_synth_index, synth_reads

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    cfg = SCALES[scale]
    idx, lines = build_synth_index(cfg["base_len"], cfg["n_haps"],
                                   snp_rate=0.002, seed=cfg["seed"],
                                   cache_dir=cache)
    print(f"[ab {scale}] n={idx.n} r={idx.n_runs} ml={min_len} mo={min_occ} "
          f"m={mer_m} s={s_long}", file=sys.stderr)
    reads = synth_reads(lines, bench.N_READS, bench.READ_LEN, error_rate=0.01, seed=1)
    codes, lens = bench.encode_reads(reads, bench.N_READS, bench.READ_LEN)

    t0 = time.perf_counter()
    from pangenome_index_tpu.ops.sparsedict import sparse_dict_key

    sd_path = os.path.join(cache, f"sdict_{sparse_dict_key(idx, s_long)}.npz")
    keys, vals = get_sparse_dict(idx, s_long, path=sd_path)
    build_s = time.perf_counter() - t0
    mb = (keys.nbytes + vals.nbytes) / 1e6
    print(f"[ab] dict s={s_long}: {len(keys)} entries, {mb:.0f} MB, "
          f"{build_s:.1f}s (cached after)", file=sys.stderr)

    results = {"scale": scale, "cfg": f"ml={min_len} mo={min_occ} m={mer_m} "
                                      f"s={s_long}",
               "dict_entries": len(keys), "dict_mb": round(mb, 1),
               "dict_build_s": round(build_s, 1)}
    # base -> sdict -> base bracketing (tunnel drift is +-20-30%); every leg
    # prints immediately so a mid-bracket stall keeps the finished legs
    for label, sd in (("base", None), ("sdict", (keys, vals, s_long)),
                      ("base2", None)):
        m = bench.serve_measure(idx, codes, lens, min_len=min_len,
                                min_occ=min_occ, chunk=None, mer_m=mer_m,
                                mer_cache_dir=cache, measure_ext=False,
                                prefer_build=True, persist=False, sdict=sd)
        results[label] = round(m["device_rps"], 1)
        results.setdefault("counts", int(m["counts"].sum()))
        assert int(m["counts"].sum()) == results["counts"], "count mismatch!"
        print(json.dumps(results), flush=True)
    r1 = bench.native_baseline(idx, codes, lens, min_len=min_len,
                               min_occ=min_occ, n_threads=1)
    results["native_1t"] = round(r1, 1)
    results["sdict_vs_ideal32"] = round(results["sdict"] * 16 / (32 * r1), 2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
