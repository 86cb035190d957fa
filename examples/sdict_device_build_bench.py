"""Device-side sparse-dictionary build: TPU frontier vs the host build.

Round-5 follow-through on the round-6 queue item 3: the host build is
r-driven binary searches with DRAM-latency misses (64 s at 20 Mbp, 137 s at
depth90 s=30, 33 min at 2.3 Gbp); build_sparse_dict_device runs the same
level-synchronous frontier through the device checkpoint rank6 (one 64 B
gather + SWAR per query). This driver measures cold (incl. compiles) and
warm device build times per scale and asserts elementwise equality against
the host artifact (the cached npz when present, else a fresh host build).

Usage: python examples/sdict_device_build_bench.py [20|depth90|600 ...]
(default: 20 depth90). One JSON line per scale, progressive.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

SCALES = {
    "20": dict(base_len=2_500_000, n_haps=8, seed=3, s=19),
    "depth90": dict(base_len=1_250_000, n_haps=90, seed=7, s=30),
    "600": dict(base_len=6_660_000, n_haps=90, seed=13, s=19),
}


def run_scale(name, base_len, n_haps, seed, s):
    import numpy as np

    from pangenome_index_tpu.ops.sparsedict import (build_sparse_dict,
                                                    build_sparse_dict_device,
                                                    sparse_dict_key)
    from pangenome_index_tpu.ops.tables import rindex_to_device
    from pangenome_index_tpu.utils.synth import build_synth_index

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    t0 = time.perf_counter()
    idx, _lines = build_synth_index(base_len, n_haps, snp_rate=0.002,
                                    seed=seed, cache_dir=cache)
    print(f"[sdict {name}] index: n={idx.n} r={idx.n_runs} "
          f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)
    row = {"scale": name, "s": s, "n": idx.n, "r": int(idx.n_runs)}

    # the MEM device build only reads ckpt/C/n: mem_only keeps HBM for state
    t0 = time.perf_counter()
    tables = rindex_to_device(idx, checkpoint=True, mem_only=True)
    np.asarray(tables.C)  # force the upload before timing the build
    row["tables_upload_s"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    keys_d, vals_d = build_sparse_dict_device(idx, tables, s, verbose=True)
    row["dev_build_cold_s"] = round(time.perf_counter() - t0, 1)
    row["entries"] = len(keys_d)
    print(json.dumps(row), flush=True)

    t0 = time.perf_counter()
    keys_w, vals_w = build_sparse_dict_device(idx, tables, s)
    row["dev_build_warm_s"] = round(time.perf_counter() - t0, 1)
    assert np.array_equal(keys_w, keys_d) and np.array_equal(vals_w, vals_d)
    print(json.dumps(row), flush=True)

    sd_path = os.path.join(cache, f"sdict_{sparse_dict_key(idx, s)}.npz")
    if os.path.exists(sd_path):
        with np.load(sd_path, allow_pickle=False) as z:
            keys_h, vals_h = z["keys"], z["vals"]
        row["host_ref"] = "cached"
    else:
        t0 = time.perf_counter()
        keys_h, vals_h = build_sparse_dict(idx, s)
        row["host_build_s"] = round(time.perf_counter() - t0, 1)
        row["host_ref"] = "fresh"
    np.testing.assert_array_equal(keys_d, keys_h)
    np.testing.assert_array_equal(np.asarray(vals_d, np.int64),
                                  np.asarray(vals_h, np.int64))
    row["equal"] = True
    if not os.path.exists(sd_path):  # persist for bench.py's upgrade phase
        with open(sd_path, "wb") as fh:
            np.savez(fh, keys=keys_h, vals=vals_h,
                     key=sparse_dict_key(idx, s))
    print(json.dumps(row), flush=True)


def main():
    bench.setup_compilation_cache()
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or ["20", "depth90"]
    for name in names:
        run_scale(name, **SCALES[name])


if __name__ == "__main__":
    main()
