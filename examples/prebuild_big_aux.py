"""Pre-build the CPU-side serving auxiliaries for the big cached indexes:
the synthetic tag array and the sparse long-seed dictionary (s = 19, the
bench min_len - 1). Both are pure host work cached by content key, so they
can run while the TPU is busy; examples/big_serve_probe.py then picks the
caches up for its measured legs.

Usage: python examples/prebuild_big_aux.py [600M|2.3G ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from examples.big_serve_probe import CONFIGS


def main():
    from pangenome_index_tpu.ops.sparsedict import (get_sparse_dict,
                                                    sparse_dict_key)
    from pangenome_index_tpu.utils.synth import (build_synth_index,
                                                 synth_tag_array)

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    for name in sys.argv[1:] or ["600M", "2.3G"]:
        cfg = CONFIGS[name]
        t0 = time.time()
        idx, _ = build_synth_index(cfg["base_len"], cfg["n_haps"],
                                   snp_rate=0.002, seed=cfg["seed"],
                                   cache_dir=cache)
        print(f"[{name}] index loaded ({time.time()-t0:.0f}s)", flush=True)
        t0 = time.time()
        tags = synth_tag_array(idx, cache_dir=cache)
        print(f"[{name}] tag array: {tags.n_runs} runs ({time.time()-t0:.0f}s)",
              flush=True)
        del tags
        s = bench.MIN_LEN - 1
        sd_path = os.path.join(cache, f"sdict_{sparse_dict_key(idx, s)}.npz")
        t0 = time.time()
        keys, vals = get_sparse_dict(idx, s, path=sd_path)
        print(f"[{name}] sdict s={s}: {len(keys)} entries, "
              f"{(keys.nbytes+vals.nbytes)/1e6:.0f} MB ({time.time()-t0:.0f}s)",
              flush=True)
        del idx, keys, vals


if __name__ == "__main__":
    main()
