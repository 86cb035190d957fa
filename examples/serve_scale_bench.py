"""Serving scale series: reads/s on one TPU chip vs the native C++ engine,
across index scales (PERF.md's measurement series).

Covers the BASELINE.md configs 4-5 shape as far as one chip + one host
allows: a 20 Mbp and a 100 Mbp 8-haplotype pangenome, plus a 90-haplotype
depth point (HPRC-like haplotype count; run-length compression grows with
depth so r, not text size, sets the serving cost). The native baseline is
measured at 1 and 2 threads (this host has 2 vCPUs); PERF.md extrapolates
the 32-thread CPU comparison from the measured per-core rate, which favors
the CPU (real chips lose per-core throughput as cores contend for LLC/HBM).

Round 5: every row reports THREE numbers - MEM-only, MEM+tags (the
reference's full find_mems serving path over a synthetic tag array), and
MEM-only with the sparse long-seed dictionary - plus the same-loop native
baselines, so the headline table covers both serving halves and the round-5
seed tier (VERDICT r4 items 2 and 8).

Usage: python examples/serve_scale_bench.py [scale ...] with scales from
{20, 100, depth90}; default runs all three. One JSON line per scale,
emitted progressively (partial rows survive a tunnel stall).
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


def run_scale(name, base_len, n_haps, seed, min_len=None, min_occ=None):
    import numpy as np

    from pangenome_index_tpu.ops.sparsedict import (get_sparse_dict,
                                                    sparse_dict_key)
    from pangenome_index_tpu.utils.synth import (build_synth_index,
                                                 synth_reads, synth_tag_array)

    min_len = min_len or bench.MIN_LEN
    min_occ = min_occ or bench.MIN_OCC
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    t0 = time.perf_counter()
    idx, lines = build_synth_index(base_len, n_haps, snp_rate=0.002, seed=seed,
                                   cache_dir=cache)
    print(f"[scale {name}] index: n={idx.n} r={idx.n_runs} n/r={idx.n/idx.n_runs:.1f} "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)
    reads = synth_reads(lines, bench.N_READS, bench.READ_LEN, error_rate=0.01, seed=1)
    codes, lens = bench.encode_reads(reads, bench.N_READS, bench.READ_LEN)
    tags = synth_tag_array(idx, lines=lines, cache_dir=cache)
    row = {"scale": name, "n": idx.n, "r": int(idx.n_runs),
           "cfg": f"ml={min_len} mo={min_occ}"}

    # chunk=None = measurement autotune: the lane optimum is index-dependent
    # (shallow-hap configs want 4096, the deep-hap config 8192 - PERF.md), so
    # every scale races the candidates and serves at its own optimum
    m = bench.serve_measure(idx, codes, lens, min_len=min_len, min_occ=min_occ,
                            mer_cache_dir=cache, chunk=None,
                            prefer_build=True, persist=False,
                            measure_ext=False, tag_tables=tags)
    row.update(tpu_reads_per_s=round(m["device_rps"], 1),
               tpu_mem_tags_reads_per_s=(round(m["tags_rps"], 1)
                                         if m.get("tags_rps") else None),
               tag_overflow_frac=round(m.get("tag_ov_frac") or 0.0, 4),
               seed_m=m["mer_m"])
    print(json.dumps(row), flush=True)

    # long-seed dictionary leg (round 5): same counts asserted
    s_long = min(min_len - 1, 31)
    sd_path = os.path.join(cache, f"sdict_{sparse_dict_key(idx, s_long)}.npz")
    keys_sd, vals_sd = get_sparse_dict(idx, s_long, path=sd_path)
    msd = bench.serve_measure(idx, codes, lens, min_len=min_len,
                              min_occ=min_occ, mer_cache_dir=cache, chunk=None,
                              prefer_build=True, persist=False,
                              measure_ext=False, tag_tables=tags,
                              sdict=(keys_sd, vals_sd, s_long))
    assert np.array_equal(msd["counts"], m["counts"]), "sdict count mismatch!"
    row.update(tpu_sdict_reads_per_s=round(msd["device_rps"], 1),
               tpu_sdict_mem_tags_reads_per_s=(round(msd["tags_rps"], 1)
                                               if msd.get("tags_rps") else None),
               long_seed_s=s_long)
    print(json.dumps(row), flush=True)

    r1 = bench.native_baseline(idx, codes, lens, m["counts"], n_threads=1,
                               min_len=min_len, min_occ=min_occ, tags=tags,
                               tag_dev=(None if m.get("tag_nu") is None
                                        else (m["tag_nu"], m["tag_ov"])))
    r2 = bench.native_baseline(idx, codes, lens, m["counts"], n_threads=2,
                               min_len=min_len, min_occ=min_occ, tags=tags)
    row.update(native_1t_reads_per_s=round(r1[0], 1),
               native_1t_mem_tags_reads_per_s=round(r1[1], 1),
               native_2t_reads_per_s=round(r2[0], 1),
               vs_core=round(msd["device_rps"] / r1[0], 2),
               mem_tags_vs_core=(round(msd["tags_rps"] / r1[1], 2)
                                 if msd.get("tags_rps") else None))
    print(json.dumps(row), flush=True)


def main():
    bench.setup_compilation_cache()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    kw = {}
    for a in sys.argv[1:]:
        if a.startswith("--min-len="):
            kw["min_len"] = int(a.split("=")[1])
        if a.startswith("--min-occ="):
            kw["min_occ"] = int(a.split("=")[1])
    names = args or list(SCALES)
    for name in names:
        run_scale(name, **SCALES[name], **kw)


if __name__ == "__main__":
    main()
