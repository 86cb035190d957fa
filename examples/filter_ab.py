"""Realistic-filter serving A/B (VERDICT r4 item 6).

The aligner-style row (min_len=31, min_occ=5) measured 13.8k reads/s in
round 3 - 8.2x vs ideal-linear 32-core at v5e-16, below the 10x bar that the
dense min_occ=1 configs clear. The lever PERF.md identifies is rank-row
locality; `pair_rank` (ops/rank.ckpt_rank6_pair) clamps same-bucket second
gathers to a cache-resident row. This script A/Bs pair_rank off/on within one
process on the depth90 (HPRC-like) config and the bench config.

Usage: python examples/filter_ab.py [depth90|20|100] [min_len] [min_occ] [mer_m]
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

    bench.setup_compilation_cache()
    from pangenome_index_tpu.utils.synth import build_synth_index, synth_reads

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    cfg = SCALES[scale]
    idx, lines = build_synth_index(cfg["base_len"], cfg["n_haps"],
                                   snp_rate=0.002, seed=cfg["seed"],
                                   cache_dir=cache)
    print(f"[ab {scale}] n={idx.n} r={idx.n_runs} ml={min_len} mo={min_occ} "
          f"m={mer_m}", file=sys.stderr)
    reads = synth_reads(lines, bench.N_READS, bench.READ_LEN, error_rate=0.01, seed=1)
    codes, lens = bench.encode_reads(reads, bench.N_READS, bench.READ_LEN)

    results = {"scale": scale, "cfg": f"ml={min_len} mo={min_occ} m={mer_m}"}
    # off -> on -> off bracketing: tunnel drift is +-20-30%, so the repeat
    # baseline bounds it (PERF.md methodology). Each leg prints immediately:
    # the tunnel's healthy windows are minutes long, and a stall mid-bracket
    # must not lose the legs already measured.
    for label, pr in (("pair_off", False), ("pair_on", True),
                      ("pair_off2", False)):
        m = bench.serve_measure(idx, codes, lens, min_len=min_len,
                                min_occ=min_occ, chunk=None, mer_m=mer_m,
                                mer_cache_dir=cache, measure_ext=False,
                                pair_rank=pr, prefer_build=True,
                                persist=False)
        results[label] = round(m["device_rps"], 1)
        results.setdefault("counts", int(m["counts"].sum()))
        assert int(m["counts"].sum()) == results["counts"], "count mismatch!"
        print(json.dumps(results), flush=True)
    r1 = bench.native_baseline(idx, codes, lens, min_len=min_len,
                               min_occ=min_occ, n_threads=1)
    results["native_1t"] = round(r1, 1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
