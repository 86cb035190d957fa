"""Benchmark: MEM-finding throughput (reads/sec) on the TPU device engine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: synthetic pangenome (8 haplotypes x 500 kbp, 0.2% SNP rate -> a
~4 Mbp BWT with realistic run-length structure), 150 bp reads with 1% errors,
min_len=20, min_occ=1 - the find_mems serving path (reference:
src/find_mems.cpp). vs_baseline is the speedup over the single-thread native
C++ engine (src/cpp) running the same algorithm on the same data.

Index build artifacts are cached under .bench_cache/ (first run pays the
oracle BWT construction).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASE_LEN = 500_000       # 4 Mbp total; auto-upgraded to 20 Mbp when cached
BIG_BASE_LEN = 2_500_000
BIG_SEED = 3
N_HAPS = 8
N_READS = 16384  # 4 work-sorted chunks of CHUNK lanes
READ_LEN = 150
MIN_LEN = 20
MIN_OCC = 1
BASELINE_READS = 24


def main():
    import jax

    # persistent XLA compilation cache: repeat runs skip the (tunnel-exposed)
    # compile round-trips for the MEM engine and the on-device mer-table build
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache", "xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from pangenome_index_tpu.models.mems import find_all_mems
    from pangenome_index_tpu.ops.mems import find_mems_batch
    from pangenome_index_tpu.ops.tables import rindex_to_device
    from pangenome_index_tpu.utils.alphabet import BYTE_TO_CODE
    from pangenome_index_tpu.utils.synth import build_synth_index, synth_reads

    import hashlib
    import pathlib

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    # PANIDX_BENCH_BIG=1 selects the 20 Mbp workload (see PERF.md for its
    # measured numbers); default is 4 Mbp - the ~190MB of 20 Mbp table
    # transfers are too exposed to tunnel-latency variance for a timed run
    big_key = hashlib.sha1(f"{BIG_BASE_LEN}-{N_HAPS}-0.002-{BIG_SEED}-v1".encode()).hexdigest()[:16]
    use_big = os.environ.get("PANIDX_BENCH_BIG") == "1" and pathlib.Path(
        cache, f"synth_{big_key}.npz").exists()
    base_len, seed = (BIG_BASE_LEN, BIG_SEED) if use_big else (BASE_LEN, 0)
    t0 = time.perf_counter()
    idx, lines = build_synth_index(base_len, N_HAPS, snp_rate=0.002, seed=seed, cache_dir=cache)
    print(f"[bench] index: n={idx.n} runs={idx.n_runs} ({time.perf_counter()-t0:.1f}s)",
          file=sys.stderr)

    reads = synth_reads(lines, N_READS, READ_LEN, error_rate=0.01, seed=1)
    codes = np.zeros((N_READS, READ_LEN), np.int32)
    for i, r in enumerate(reads):
        codes[i, :] = BYTE_TO_CODE[np.frombuffer(r, np.uint8)]
    lens = np.full(N_READS, READ_LEN, np.int32)

    dev = jax.devices()[0]
    print(f"[bench] device: {dev}", file=sys.stderr)
    # checkpoint tables: ONE 64B gather per rank6 query (see ops/tables.py);
    # measured 6.3x the dense mode's extension rate on v5e (PERF.md round 2)
    t = jax.device_put(rindex_to_device(idx, checkpoint=True), dev)

    # m-mer seed table (skips the first m extensions of MEM steps 1 and 3),
    # built on device: the expansion is itself batched extension, and at m=12
    # it avoids both a ~100 s host build and a 200 MB host->HBM transfer
    from pangenome_index_tpu.ops.mertable import build_mer_table_device, read_mer_keys

    MER_M = 12
    t0 = time.perf_counter()
    mer_table = build_mer_table_device(t, MER_M)
    np.asarray(mer_table[:4])  # host fetch = real sync (block_until_ready is
    # a no-op under the axon backend), so the timing covers the device work
    mk, mv = read_mer_keys(codes, lens, MER_M)
    mer_keys = jax.device_put(jnp.asarray(mk), dev)
    mer_valid = jax.device_put(jnp.asarray(mv), dev)
    print(f"[bench] mer table m={MER_M} built in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # work-sorted chunking: order reads by the seed-table difficulty proxy so
    # each lockstep chunk is work-homogeneous (results are inverse-permuted
    # back, so output order is unchanged). The proxy runs on device against
    # the device-resident table; the permutation of the already-uploaded
    # mer arrays is a device-side take, so every array crosses the
    # (latency-exposed) tunnel exactly once.
    from pangenome_index_tpu.ops.mertable import seed_difficulty

    proxy = np.asarray(seed_difficulty(mer_table, mer_keys, mer_valid, MIN_OCC,
                                       lengths=jnp.asarray(lens), m=MER_M))
    order = np.argsort(proxy, kind="stable")
    order_d = jax.device_put(jnp.asarray(order), dev)
    codes_d = jax.device_put(jnp.asarray(codes[order]), dev)
    lens_d = jax.device_put(jnp.asarray(lens[order]), dev)
    mer_kw = dict(mer_table=mer_table, mer_keys=mer_keys[order_d],
                  mer_valid=mer_valid[order_d], mer_m=MER_M)

    # lanes per launch (measured optimum 8192 on v5e with checkpoint rank;
    # the 4096 optimum of the gather-bound dense mode no longer applies)
    CHUNK = 8192

    def run_all():
        counts = []
        for s in range(0, N_READS, CHUNK):
            kw = {k: (v[s : s + CHUNK] if k in ("mer_keys", "mer_valid") else v)
                  for k, v in mer_kw.items()}
            res = find_mems_batch(t, codes_d[s : s + CHUNK], lens_d[s : s + CHUNK],
                                  MIN_LEN, MIN_OCC, capacity=32, **kw)
            counts.append(np.asarray(res.count))  # host fetch = real sync
        out = np.empty(N_READS, np.int32)
        out[order] = np.concatenate(counts)  # back to input read order
        return out

    # warmup / compile. NOTE: jax.block_until_ready does not synchronize under
    # the axon remote backend - force a host fetch to time real execution.
    t0 = time.perf_counter()
    all_counts = run_all()
    total_mems = int(all_counts.sum())
    compile_s = time.perf_counter() - t0
    print(f"[bench] compile+first run: {compile_s:.1f}s, {total_mems} MEMs", file=sys.stderr)

    profile_dir = os.environ.get("PANIDX_PROFILE_DIR")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            run_all()
        print(f"[bench] profiler trace written to {profile_dir}", file=sys.stderr)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        all_counts = run_all()
    dt = (time.perf_counter() - t0) / iters
    device_rps = N_READS / dt
    print(f"[bench] device: {dt*1e3:.1f} ms/batch -> {device_rps:.0f} reads/s", file=sys.stderr)

    # LF-steps/s (the BASELINE.json inner-loop metric): fixed-iteration
    # extension loop, all lanes always active
    import jax.numpy as jnp_
    from pangenome_index_tpu.ops import fmd

    @jax.jit
    def ext_loop(t, k, kp, s, c, iters2):
        def body(i, st):
            k, kp, s = st
            nk, nkp, ns = fmd.extend(t, k, kp, s, (c + i) % 5 + 1)
            empty = ns <= 0
            return (jnp_.where(empty, 0, nk), jnp_.where(empty, 0, nkp),
                    jnp_.where(empty, t.n, ns))
        k, kp, s = jax.lax.fori_loop(0, iters2, body, (k, kp, s))
        return k.sum() + kp.sum() + s.sum()

    Bx = 4096
    kz = jnp.zeros(Bx, t.run_start.dtype)
    sz = jnp.full(Bx, idx.n, t.run_start.dtype)
    cz = jnp.zeros(Bx, jnp.int32)
    float(ext_loop(t, kz, kz, sz, cz, 100))
    t0 = time.perf_counter()
    float(ext_loop(t, kz, kz, sz, cz, 1100))
    d1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(ext_loop(t, kz, kz, sz, cz, 100))
    d0 = time.perf_counter() - t0
    ext_rate = Bx * 1000 / max(d1 - d0, 1e-9)
    print(f"[bench] LF/extension steps: {ext_rate/1e6:.1f} M/s "
          f"(each = 2 six-symbol rank queries)", file=sys.stderr)

    # CPU baseline: native C++ engine (single thread - the per-core baseline;
    # the reference's deployment is one process per chromosome with OpenMP)
    from pangenome_index_tpu import native

    if native.available():
        nb = min(N_READS, 256)
        t0 = time.perf_counter()
        s, e, b, z, cnt = native.find_mems_native(
            idx, codes[:nb], lens[:nb], MIN_LEN, MIN_OCC, capacity=32, n_threads=1)
        host_dt = time.perf_counter() - t0
        host_rps = nb / host_dt
        print(f"[bench] native C++ 1-thread baseline: {host_rps:.1f} reads/s "
              f"({int(cnt.sum())} MEMs on subset)", file=sys.stderr)
        # sanity: native MEM counts equal device counts on the subset
        if not np.array_equal(cnt, all_counts[:nb]):
            print("[bench] WARNING: native/device MEM count mismatch", file=sys.stderr)
    else:
        t0 = time.perf_counter()
        host_mems = 0
        for r in reads[:BASELINE_READS]:
            host_mems += len(find_all_mems(idx, r, MIN_LEN, MIN_OCC))
        host_dt = time.perf_counter() - t0
        host_rps = BASELINE_READS / host_dt
        print(f"[bench] numpy host baseline: {host_rps:.1f} reads/s", file=sys.stderr)

    print(json.dumps({
        "metric": "mem_find_reads_per_s",
        "value": round(device_rps, 1),
        "unit": f"reads/s (150bp, minlen20, {idx.n // 1_000_000}Mbp synthetic pangenome)",
        "vs_baseline": round(device_rps / host_rps, 2),
    }))


def orchestrate():
    """Run the measurement in a subprocess with a timeout; the TPU tunnel in
    this environment has multi-minute stalls and occasional outages, and a
    hung transfer would otherwise leave the driver with no result. Falls back
    to the XLA-CPU backend (clearly labeled) if the TPU attempt dies."""
    import subprocess

    here = os.path.abspath(__file__)
    attempts = [
        (dict(os.environ), 480, "tpu"),
        ({**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"},
         420, "cpu-fallback"),
    ]
    for env, tmo, label in attempts:
        try:
            r = subprocess.run([sys.executable, here, "--inner"], env=env,
                               capture_output=True, timeout=tmo)
        except subprocess.TimeoutExpired:
            print(f"[bench] {label} attempt timed out after {tmo}s", file=sys.stderr)
            continue
        sys.stderr.write(r.stderr.decode(errors="replace"))
        out = r.stdout.decode(errors="replace").strip().splitlines()
        if r.returncode == 0 and out and out[-1].startswith("{"):
            if label != "tpu":
                rec = json.loads(out[-1])
                rec["unit"] += f" [{label}]"
                print(json.dumps(rec))
            else:
                print(out[-1])
            return 0
        print(f"[bench] {label} attempt failed (rc={r.returncode})", file=sys.stderr)
    print(json.dumps({"metric": "mem_find_reads_per_s", "value": 0,
                      "unit": "reads/s (bench could not run)", "vs_baseline": 0}))
    return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(orchestrate())
