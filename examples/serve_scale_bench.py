"""Serving scale series: MEM-finding reads/s on one TPU chip vs the native
C++ engine, across index scales (PERF.md's measurement series).

Covers the BASELINE.md configs 4-5 shape as far as one chip + one host
allows: a 20 Mbp and a 100 Mbp 8-haplotype pangenome, plus a 90-haplotype
depth point (HPRC-like haplotype count; run-length compression grows with
depth so r, not text size, sets the serving cost). The native baseline is
measured at 1 and 2 threads (this host has 2 vCPUs); PERF.md extrapolates
the 32-thread CPU comparison from the measured per-core rate, which favors
the CPU (real chips lose per-core throughput as cores contend for LLC/HBM).

Usage: python examples/serve_scale_bench.py [scale ...] with scales from
{20, 100, depth90}; default runs all three. One JSON line per scale.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # repo-root bench module (shared measurement path)

SCALES = {
    "20": dict(base_len=2_500_000, n_haps=8, seed=3),
    "100": dict(base_len=12_500_000, n_haps=8, seed=3),
    "depth90": dict(base_len=1_250_000, n_haps=90, seed=7),
}


def run_scale(name, base_len, n_haps, seed):
    from pangenome_index_tpu.utils.synth import build_synth_index, synth_reads

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    t0 = time.perf_counter()
    idx, lines = build_synth_index(base_len, n_haps, snp_rate=0.002, seed=seed,
                                   cache_dir=cache)
    print(f"[scale {name}] index: n={idx.n} r={idx.n_runs} n/r={idx.n/idx.n_runs:.1f} "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)
    reads = synth_reads(lines, bench.N_READS, bench.READ_LEN, error_rate=0.01, seed=1)
    codes, lens = bench.encode_reads(reads, bench.N_READS, bench.READ_LEN)
    # chunk=None = measurement autotune: the lane optimum is index-dependent
    # (shallow-hap configs want 4096, the deep-hap config 8192 - PERF.md), so
    # every scale races the candidates and serves at its own optimum
    m = bench.serve_measure(idx, codes, lens, mer_cache_dir=cache, chunk=None,
                            prefer_build=True, persist=False)
    r1 = bench.native_baseline(idx, codes, lens, m["counts"], n_threads=1)
    r2 = bench.native_baseline(idx, codes, lens, m["counts"], n_threads=2)
    print(json.dumps({
        "scale": name, "n": idx.n, "r": int(idx.n_runs),
        "tpu_reads_per_s": round(m["device_rps"], 1),
        "ext_steps_per_s": round(m["ext_rate"], 0),
        "native_1t_reads_per_s": round(r1, 1),
        "native_2t_reads_per_s": round(r2, 1),
        "vs_core": round(m["device_rps"] / r1, 2),
    }), flush=True)


def main():
    bench.setup_compilation_cache()
    names = sys.argv[1:] or list(SCALES)
    for name in names:
        run_scale(name, **SCALES[name])


if __name__ == "__main__":
    main()
