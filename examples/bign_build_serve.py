"""Build + validate a REAL n > 2^31 depth-90 index (VERDICT r4 item 7).

2.3 Gbp of synthetic depth-90 text (25.6 Mbp x 90 haplotypes, shared variant
sites) -> native SA-IS (int64 SA above 2^31 rows) -> r-index -> two-level
checkpoint table -> rank6/LF equality vs the host model. The index is cached
under .bench_cache so a TPU serving measurement (bench.serve_measure) can be
run against it separately when the tunnel cooperates:

    python - <<'PY'
    import bench, numpy as np
    from pangenome_index_tpu.utils.synth import build_synth_index, synth_reads
    idx, lines = build_synth_index(25_600_000, 90, seed=11, cache_dir=".bench_cache")
    reads = synth_reads(lines, 16384, 150, error_rate=0.01, seed=1)
    codes, lens = bench.encode_reads(reads, 16384, 150)
    bench.serve_measure(idx, codes, lens, chunk=8192, mer_m=13, mer_cache_dir=".bench_cache")
    PY

Run: JAX_PLATFORMS=cpu python examples/bign_build_serve.py [total_mbp]
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"[bign-build] {msg} | peak RSS {peak:.1f} GB", flush=True)


def main():
    total_mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 2304.0
    n_haps = 90
    base_len = int(total_mbp * 1e6 / n_haps)

    from pangenome_index_tpu.utils.synth import build_synth_index

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".bench_cache")
    t0 = time.perf_counter()
    idx, lines = build_synth_index(base_len, n_haps, snp_rate=0.002, seed=11,
                                   cache_dir=cache)
    del lines
    log(f"index built in {time.perf_counter()-t0:.0f}s: n={idx.n} "
        f"(2^31{'+' if idx.n >= 2**31 else '-'}{abs(idx.n - 2**31)}), "
        f"r={idx.n_runs}, n/r={idx.n/idx.n_runs:.1f}")
    assert idx.n > 2**31, "config must exceed 2^31 BWT rows"

    import jax.numpy as jnp

    from pangenome_index_tpu.ops import rank
    from pangenome_index_tpu.ops.tables import rindex_to_device

    t1 = time.perf_counter()
    t = rindex_to_device(idx, checkpoint=True)
    log(f"two-level ckpt built in {time.perf_counter()-t1:.0f}s: rows "
        f"{tuple(t.ckpt.shape)} int32 ({t.ckpt.size*4/idx.n:.2f} B/pos), "
        f"super {tuple(t.ckpt_super.shape)}, pos dtype {np.dtype(t.pos_dtype)}")
    assert t.ckpt_super is not None

    rng = np.random.default_rng(2)
    pos = np.unique(np.concatenate([
        rng.integers(0, idx.n + 1, size=384),
        np.array([0, 2**30, 2**31 - 1, 2**31, 2**31 + 1, idx.n - 1, idx.n],
                 np.int64)]))
    host = np.stack([idx.rank6(int(p)) for p in pos])
    dev = np.asarray(rank.rank6(t, jnp.asarray(pos, t.pos_dtype)))
    np.testing.assert_array_equal(dev, host)
    log(f"rank6 equality at {len(pos)} positions incl. 2^31 boundary: OK")
    print("[bign-build] PASS", flush=True)


if __name__ == "__main__":
    main()
