"""Benchmark: MEM-finding throughput (reads/sec) on the TPU device engine.

Prints ONE JSON line per finished measurement; the orchestrator reports the
LAST one: {"metric", "value", "unit", "vs_baseline", ...}.

Workload: synthetic pangenome (20 Mbp across 8 haplotypes once cached, else
4 Mbp), 150 bp reads with 1% errors, min_len=20, min_occ=1 - the find_mems
serving path (reference: src/find_mems.cpp). vs_baseline is the speedup over
ONE thread of the native C++ engine (src/cpp) on the same algorithm + data;
vs_baseline_2core / vs_baseline_32core_ideal report the measured-2-thread and
ideal-linear-32-core ratios so the JSON self-describes what the number means.

Protocol (round 4): measure at m=12 seeds first and print the JSON the moment
it lands, then opportunistically upgrade to m=14 (+~25%) and print again; the
orchestrator harvests partial stdout on timeout, so a tunnel stall can only
ever cost the upgrade, not the round's TPU number (BENCH_r03 fell to a CPU
fallback exactly that way).

Index build artifacts are cached under .bench_cache/ (first run pays the
oracle BWT construction). examples/serve_scale_bench.py reuses serve_measure/
native_baseline for the 20-100 Mbp scale series (PERF.md).
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
N_READS = 16384  # work-sorted chunks of CHUNK lanes
READ_LEN = 150
MIN_LEN = 20
MIN_OCC = 1
BASELINE_READS = 24
MER_M = 14  # +25% reads/s over m=12 at depth90 (PERF.md round 3 A/B)
# fallback lanes per launch when the caller pins a chunk; the shipped default
# is the measurement autotune (chunk=None races 4096 vs 8192 - the optimum is
# workload-dependent: shallow configs pick 4096, depth90 picks 8192, PERF.md)
CHUNK = 4096
# MEM buffer capacity for BOTH engines: per-lane emission buffers carried
# through the loop cost real HBM traffic (ablate_serving: 24us/iter at 32,
# ~10us at 8), counts stay EXACT past the capacity on both engines (device:
# ops/mems.py emission one-hot masks out, cnt unconditional; native:
# panindex_native.cpp:126-129), and overflow is flagged for refind - so 8 is
# the shipped bounded-capacity serving contract (PERF.md round 3)
MEM_CAP = 8
#: engine kwargs sliced per read chunk (everything else is whole-table)
PER_READ_KEYS = ("mer_keys", "mer_valid", "sdict_idx")


def setup_compilation_cache():
    """Persistent XLA compile cache: repeat runs skip the (tunnel-exposed)
    compile round-trips for the MEM engine and the mer-table build."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_cache", "xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def encode_reads(reads, n_reads, read_len):
    from pangenome_index_tpu.utils.alphabet import BYTE_TO_CODE

    codes = np.zeros((n_reads, read_len), np.int32)
    for i, r in enumerate(reads):
        codes[i, :] = BYTE_TO_CODE[np.frombuffer(r, np.uint8)]
    return codes, np.full(n_reads, read_len, np.int32)


def serve_measure(idx, codes, lens, min_len=MIN_LEN, min_occ=MIN_OCC,
                  chunk=CHUNK, mer_m=MER_M, iters=3, measure_ext=True,
                  mer_cache_dir=None, ckpt_block=64, cache_only=False,
                  prefer_build=False, persist=True, pair_rank=None,
                  mem_only=False, on_provisional=None,
                  tag_tables=None, tag_capacity=8, on_mem_result=None,
                  sdict=None,
                  log=lambda s: print(s, file=sys.stderr)):
    """Full device serving measurement on one chip: checkpoint-rank tables,
    on-device m-mer seed table, work-sorted chunking. Returns a dict with
    reads/s, LF-steps/s, and the per-read MEM counts (for cross-checks).

    tag_tables (a host TagArray): additionally measure the COMBINED loop -
    MEM finding + per-buffered-MEM tag lookups (the reference's full
    find_mems serving path, find_mems.cpp:96-146) - reported as tags_rps
    with per-MEM unique counts (tag_nu/tag_ov) for cross-checks.
    on_mem_result(device_rps, mer_m) fires the moment the MEM-only number
    lands, BEFORE tag work, so the driver-critical line never waits on the
    tag-query compile.
    sdict = (keys, vals, s): the sparse long-seed dictionary tier
    (ops/sparsedict.py) cascaded over the dense table; window lookups run
    host-side once per batch (np.searchsorted), the same treatment as
    read_mer_keys.

    tag_capacity=8: the bounded tag-serving contract, like MEM_CAP -
    measured run spans per MEM interval are 1 at every bench workload (a
    MEM's occurrences are the same locus across haplotypes, which is one
    tag run - the tag-array paper's structural point), so 8 covers with 4x
    margin while reading 4x fewer gather rows than 32; overflow is counted
    and reported, and the CLI serving path re-queries overflowed lanes on
    the host."""
    import jax
    import jax.numpy as jnp

    from pangenome_index_tpu.ops.mems import find_mems_batch
    from pangenome_index_tpu.ops.mertable import (build_mer_table_device,
                                                  mer_table_key, read_mer_keys,
                                                  seed_difficulty)
    from pangenome_index_tpu.ops.tables import rindex_to_device

    n_reads = len(codes)
    dev = jax.devices()[0]
    log(f"[bench] device: {dev}")
    # checkpoint tables: ONE 64B gather per rank6 query (see ops/tables.py);
    # measured 6.3x the dense mode's extension rate on v5e (PERF.md round 2).
    # mem_only (opt-in, big indexes): MEM serving never touches the
    # per-run/locate tables, ~2.4 GB of pure transfer at 72M runs - but the
    # stub shapes are a DIFFERENT compiled program, so the small-index bench
    # keeps full tables and its warm compile cache (the driver-critical path)
    t = jax.device_put(rindex_to_device(idx, checkpoint=True,
                                        ckpt_block=ckpt_block,
                                        mem_only=mem_only), dev)

    # m-mer seed table (skips the first m extensions of MEM steps 1 and 3).
    # Device execution is ~1.5s but the builder's XLA compile is 90s+ cold
    # and the table shape depends on the index, so the table is persisted
    # next to the bench cache - a pure function of (index, m) - and loaded
    # through one ~7s device_put (the production engines do the same,
    # cli.py find-mems). The transfer rides the tunnel: under congestion it
    # has been observed to take minutes.
    t0 = time.perf_counter()
    mer_table = None
    # the on-device 4^m build can fail at big indexes (a reproducible worker
    # crash at 600 Mbp + m=14, PERF.md) - step m down rather than losing the
    # measurement; each -1 of m costs ~5% serving, a dead run costs all of it.
    # (stop includes mer_m itself so small mer_m still gets one attempt -
    # advisor r3 range-stop fix)
    for m_try in range(mer_m, max(mer_m - 3, 0), -1) if mer_m > 0 else ():
        cache_path = None
        if mer_cache_dir is not None:
            cache_path = os.path.join(mer_cache_dir,
                                      f"mer_{mer_table_key(idx, m_try)}.npz")

        def _load():
            if cache_path is None:
                return None
            try:
                with np.load(cache_path, allow_pickle=False) as z:
                    tab = jax.device_put(jnp.asarray(z["table"]), dev)
                log(f"[bench] mer table m={m_try} loaded from cache")
                return tab
            except FileNotFoundError:
                return None

        def _build():
            if cache_only:
                return None
            try:
                tab = build_mer_table_device(t, m_try)
                np.asarray(tab[:4])  # force execution before declaring success
                return tab
            except Exception as e:
                log(f"[bench] mer table m={m_try} build failed "
                    f"({type(e).__name__}: {str(e)[:300]}); stepping down")
                return None

        # prefer_build: an on-device build moves ~0 bytes over the
        # host<->device link, where a cached multi-GB table's device_put has
        # stalled past the driver timeout on this tunnel (BENCH_r03); with a
        # healthy link the cache load is the cheaper path.
        built = False
        if prefer_build:
            mer_table = _build()
            built = mer_table is not None
            if mer_table is None:
                mer_table = _load()
        else:
            mer_table = _load()
            if mer_table is None:
                mer_table = _build()
                built = mer_table is not None
        if mer_table is None:
            if cache_only:
                log(f"[bench] mer table m={m_try}: no cache, build skipped "
                    f"(cache_only)")
            continue
        if built and cache_path is not None and persist \
                and not os.path.exists(cache_path):
            host = np.asarray(mer_table)
            tmp = f"{cache_path}.tmp{os.getpid()}"
            with open(tmp, "wb") as fh:
                np.savez(fh, table=host)
            os.replace(tmp, cache_path)
        mer_m = m_try
        break
    if mer_table is None and mer_m > 0:
        if cache_only:
            mer_m = 0  # measured unseeded rather than risking a device build
        else:
            raise RuntimeError("mer table build failed at every m")
    mer_setup_s = 0.0
    if mer_table is not None:
        np.asarray(mer_table[:4])  # host fetch = real sync (block_until_ready
        # is a no-op under the axon backend), so the timing covers device work
        mer_setup_s = time.perf_counter() - t0
        from pangenome_index_tpu.ops.mertable import read_mer_keys_fast

        mk, mv = read_mer_keys_fast(codes, lens, mer_m)
        mer_keys = jax.device_put(jnp.asarray(mk), dev)
        mer_valid = jax.device_put(jnp.asarray(mv), dev)
        log(f"[bench] mer table m={mer_m} ready in {time.perf_counter()-t0:.1f}s")

        # work-sorted chunking: order reads by the seed-table difficulty proxy
        # so each lockstep chunk is work-homogeneous (results are
        # inverse-permuted back); every array crosses the tunnel once
        proxy = np.asarray(seed_difficulty(mer_table, mer_keys, mer_valid,
                                           min_occ, lengths=jnp.asarray(lens),
                                           m=mer_m))
        order = np.argsort(proxy, kind="stable")
        order_d = jax.device_put(jnp.asarray(order), dev)
        mer_kw = dict(mer_table=mer_table, mer_keys=mer_keys[order_d],
                      mer_valid=mer_valid[order_d], mer_m=mer_m)
    else:
        order = np.arange(n_reads)  # unseeded: no difficulty proxy to sort by
        mer_kw = {}
    if sdict is not None:
        from pangenome_index_tpu.ops.sparsedict import read_windows_fast

        keys_sd, vals_sd, s_sd = sdict
        rk, rv, di = read_windows_fast(codes, lens, s_sd, keys_sd)
        hit_frac = (di >= 0).sum() / max(rv.sum(), 1)
        log(f"[bench] long-seed dict s={s_sd}: {len(keys_sd)} entries, "
            f"window hit rate {hit_frac:.1%}")
        mer_kw.update(sdict_vals=jax.device_put(jnp.asarray(vals_sd), dev),
                      sdict_idx=jax.device_put(jnp.asarray(di[order]), dev),
                      sdict_m=s_sd)
    codes_d = jax.device_put(jnp.asarray(codes[order]), dev)
    lens_d = jax.device_put(jnp.asarray(lens[order]), dev)

    def run_all():
        pending = []
        for s in range(0, n_reads, chunk):
            kw = {k: (v[s : s + chunk] if k in PER_READ_KEYS else v)
                  for k, v in mer_kw.items()}
            pending.append(find_mems_batch(
                t, codes_d[s : s + chunk], lens_d[s : s + chunk],
                min_len, min_occ, capacity=MEM_CAP, pair_rank=pair_rank, **kw))
        # dispatch every chunk before the first host fetch: jax dispatch is
        # async, so the chunks queue back-to-back on the device instead of
        # paying one tunnel round-trip of idle time between chunks
        counts = [np.asarray(res.count) for res in pending]  # fetch = real sync
        out = np.empty(n_reads, np.int32)
        out[order] = np.concatenate(counts)  # back to input read order
        return out

    if chunk is None:
        # measurement autotune: the lane optimum is workload-dependent
        # (shallow-hap configs want 4096, the deep-hap config wants 8192 -
        # PERF.md), so race the candidates on the first reads and keep the
        # winner. Costs two small warm launches; compile is shared with the
        # main run when a candidate wins.
        best, best_dt = None, None
        for cand in (4096, 8192):
            sub = min(cand, n_reads)
            kw = {k: (v[:sub] if k in PER_READ_KEYS else v)
                  for k, v in mer_kw.items()}
            np.asarray(find_mems_batch(t, codes_d[:sub], lens_d[:sub], min_len,
                                       min_occ, capacity=MEM_CAP,
                                       pair_rank=pair_rank, **kw).count)  # compile
            t0 = time.perf_counter()
            np.asarray(find_mems_batch(t, codes_d[:sub], lens_d[:sub], min_len,
                                       min_occ, capacity=MEM_CAP,
                                       pair_rank=pair_rank, **kw).count)
            dt = (time.perf_counter() - t0) / sub
            log(f"[bench] autotune chunk={cand}: {1/dt:.0f} reads/s")
            if best_dt is None or dt < best_dt:
                best, best_dt = cand, dt
        chunk = best
        if on_provisional is not None:
            # a warm-subset number in hand beats nothing if the tunnel
            # stalls during the full-batch run (flickering-outage defense);
            # the full measurement overwrites it moments later
            on_provisional(1.0 / best_dt)

    t0 = time.perf_counter()
    all_counts = run_all()
    total_mems = int(all_counts.sum())
    log(f"[bench] compile+first run: {time.perf_counter()-t0:.1f}s, {total_mems} MEMs")

    profile_dir = os.environ.get("PANIDX_PROFILE_DIR")
    if profile_dir:
        import jax

        with jax.profiler.trace(profile_dir):
            run_all()
        log(f"[bench] profiler trace written to {profile_dir}")

    t0 = time.perf_counter()
    for _ in range(iters):
        all_counts = run_all()
    dt = (time.perf_counter() - t0) / iters
    device_rps = n_reads / dt
    log(f"[bench] device: {dt*1e3:.1f} ms/batch -> {device_rps:.0f} reads/s")

    if on_mem_result is not None:
        try:
            on_mem_result(device_rps, mer_m)
        except Exception:
            pass

    # combined loop: MEM finding + tag lookups for every buffered MEM
    # (opportunistic: a tag-measurement failure never costs the MEM number)
    tags_rps = tag_nu = tag_ov = None
    tag_ov_frac = 0.0
    if tag_tables is not None:
        try:
            from pangenome_index_tpu.ops.tables import tags_to_device
            from pangenome_index_tpu.ops.tagquery import query_mem_tags

            tt = jax.device_put(tags_to_device(tag_tables), dev)

            def run_all_tags():
                pend = []
                for s in range(0, n_reads, chunk):
                    kw = {k: (v[s : s + chunk]
                              if k in PER_READ_KEYS else v)
                          for k, v in mer_kw.items()}
                    res = find_mems_batch(
                        t, codes_d[s : s + chunk], lens_d[s : s + chunk],
                        min_len, min_occ, capacity=MEM_CAP,
                        pair_rank=pair_rank, **kw)
                    pend.append((res.count,
                                 *query_mem_tags(tt, res.bwt_start, res.size,
                                                 res.count,
                                                 capacity=tag_capacity)))
                cs = np.concatenate([np.asarray(c) for c, _, _ in pend])
                nus = np.concatenate([np.asarray(v) for _, v, _ in pend])
                ovs = np.concatenate([np.asarray(o) for _, _, o in pend])
                oc = np.empty_like(cs)
                onu = np.empty_like(nus)
                oov = np.empty_like(ovs)
                oc[order], onu[order], oov[order] = cs, nus, ovs
                return oc, onu, oov

            t0 = time.perf_counter()
            cs, tag_nu, tag_ov = run_all_tags()
            log(f"[bench] tag-query compile+first: {time.perf_counter()-t0:.1f}s")
            t0 = time.perf_counter()
            for _ in range(iters):
                cs, tag_nu, tag_ov = run_all_tags()
            dt = (time.perf_counter() - t0) / iters
            tags_rps = n_reads / dt
            n_buffered = int(np.minimum(cs, MEM_CAP).sum())
            tag_ov_frac = float(tag_ov.sum() / max(n_buffered, 1))
            log(f"[bench] mem+tags: {dt*1e3:.1f} ms/batch -> "
                f"{tags_rps:.0f} reads/s "
                f"({n_buffered} tag queries, overflow {tag_ov_frac:.2%})")
        except Exception as exc:
            log(f"[bench] tag measurement failed ({type(exc).__name__}: "
                f"{str(exc)[:300]}); MEM-only result stands")
            tags_rps = tag_nu = tag_ov = None

    ext_rate = 0.0
    if measure_ext:
        ext_rate = measure_ext_rate(t, idx.n)
        log(f"[bench] LF/extension steps: {ext_rate/1e6:.1f} M/s "
            f"(each = 2 six-symbol rank queries)")
    return dict(device_rps=device_rps, ext_rate=ext_rate, counts=all_counts,
                total_mems=total_mems, mer_m=mer_m, mer_setup_s=mer_setup_s,
                tables=t, tags_rps=tags_rps, tag_nu=tag_nu, tag_ov=tag_ov,
                tag_ov_frac=tag_ov_frac)


def measure_ext_rate(t, n, lanes=4096):
    """LF-steps/s (the BASELINE.json inner-loop metric): fixed-iteration
    extension loop, all lanes always active."""
    import jax
    import jax.numpy as jnp

    from pangenome_index_tpu.ops import fmd

    @jax.jit
    def ext_loop(t, k, kp, s, c, iters2):
        def body(i, st):
            k, kp, s = st
            nk, nkp, ns = fmd.extend(t, k, kp, s, (c + i) % 5 + 1)
            empty = ns <= 0
            return (jnp.where(empty, 0, nk), jnp.where(empty, 0, nkp),
                    jnp.where(empty, t.n, ns))
        k, kp, s = jax.lax.fori_loop(0, iters2, body, (k, kp, s))
        return k.sum() + kp.sum() + s.sum()

    kz = jnp.zeros(lanes, t.run_start.dtype)
    sz = jnp.full(lanes, n, t.run_start.dtype)
    cz = jnp.zeros(lanes, jnp.int32)
    float(ext_loop(t, kz, kz, sz, cz, 100))
    for _ in range(3):  # tunnel timing noise can swallow the 1000-iter delta
        t0 = time.perf_counter()
        float(ext_loop(t, kz, kz, sz, cz, 1100))
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(ext_loop(t, kz, kz, sz, cz, 100))
        d0 = time.perf_counter() - t0
        if d1 - d0 > 5e-3:  # a real 1000-iter delta is many milliseconds
            return lanes * 1000 / (d1 - d0)
    return 0.0  # non-measurement beats an absurd number in the JSON


def native_baseline(idx, codes, lens, counts=None, n_threads=1, nb=256,
                    min_len=MIN_LEN, min_occ=MIN_OCC, tags=None, tag_dev=None,
                    log=lambda s: print(s, file=sys.stderr)):
    """Native C++ engine baseline on a read subset; cross-checks MEM counts
    against the device result when provided. Returns reads/s; with `tags` (a
    host TagArray) the baseline also runs the tag half over every buffered
    MEM - the same both-halves loop the device combined measurement runs
    (find_mems.cpp:96-146) - and returns (mem_rps, combined_rps). tag_dev =
    (tag_nu, tag_ov) from serve_measure cross-checks per-MEM unique counts
    between the engines."""
    from pangenome_index_tpu import native

    nb = min(len(codes), nb)
    t0 = time.perf_counter()
    s, e, b, z, cnt = native.find_mems_native(
        idx, codes[:nb], lens[:nb], min_len, min_occ, capacity=MEM_CAP,
        n_threads=n_threads)
    host_dt = time.perf_counter() - t0
    host_rps = nb / host_dt
    log(f"[bench] native C++ {n_threads}-thread baseline: {host_rps:.1f} reads/s "
        f"({int(cnt.sum())} MEMs on subset)")
    if counts is not None and not np.array_equal(cnt, counts[:nb]):
        log("[bench] WARNING: native/device MEM count mismatch")
    if tags is None:
        return host_rps
    # tag half: one query per buffered MEM, flattened (find_mems.cpp:129)
    eff = np.minimum(cnt, s.shape[1]).astype(np.int64)
    ii = np.repeat(np.arange(nb), eff)
    within = np.arange(len(ii)) - np.repeat(np.cumsum(eff) - eff, eff)
    t0 = time.perf_counter()
    qs = b[ii, within]
    qe = qs + z[ii, within] - 1
    tpos, tuniq, truns = native.query_tags_native(
        tags, qs, qe, capacity=256, n_threads=n_threads)
    tag_dt = time.perf_counter() - t0
    comb_rps = nb / (host_dt + tag_dt)
    log(f"[bench] native {n_threads}-thread mem+tags: {comb_rps:.1f} reads/s "
        f"({len(ii)} tag queries, tag half {tag_dt:.2f}s)")
    if tag_dev is not None:
        nu_d, ov_d = tag_dev
        ok = ~ov_d[ii, within]  # device counts are capacity-partial on overflow
        if not np.array_equal(tuniq[ok], nu_d[ii, within][ok]):
            log("[bench] WARNING: native/device tag unique-count mismatch")
        else:
            log(f"[bench] tag unique counts cross-checked on "
                f"{int(ok.sum())} MEMs: identical")
    return host_rps, comb_rps


def main():
    import jax

    setup_compilation_cache()

    from pangenome_index_tpu.models.mems import find_all_mems
    from pangenome_index_tpu.utils.synth import build_synth_index, synth_reads
    from pangenome_index_tpu import native

    import hashlib
    import pathlib

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    # the 20 Mbp workload is the default once its index is cached (the
    # persisted mer table keeps cold-start in seconds, so the bigger config
    # fits the timed budget); PANIDX_BENCH_BIG=0 forces the 4 Mbp config
    big_key = hashlib.sha1(f"{BIG_BASE_LEN}-{N_HAPS}-0.002-{BIG_SEED}-v1".encode()).hexdigest()[:16]
    use_big = os.environ.get("PANIDX_BENCH_BIG", "1") != "0" and pathlib.Path(
        cache, f"synth_{big_key}.npz").exists()
    base_len, seed = (BIG_BASE_LEN, BIG_SEED) if use_big else (BASE_LEN, 0)
    t0 = time.perf_counter()
    idx, lines = build_synth_index(base_len, N_HAPS, snp_rate=0.002, seed=seed, cache_dir=cache)
    print(f"[bench] index: n={idx.n} runs={idx.n_runs} ({time.perf_counter()-t0:.1f}s)",
          file=sys.stderr)

    reads = synth_reads(lines, N_READS, READ_LEN, error_rate=0.01, seed=1)
    codes, lens = encode_reads(reads, N_READS, READ_LEN)

    # synthetic tag array (cached): puts the reference's SECOND serving half
    # (per-MEM tag lookups, find_mems.cpp:129) into the measured loop; a
    # failure here degrades to the round-4 MEM-only bench, never blocks it
    tags = None
    try:
        from pangenome_index_tpu.utils.synth import synth_tag_array

        t0 = time.perf_counter()
        tags = synth_tag_array(idx, lines=lines, cache_dir=cache)
        print(f"[bench] tag array: {tags.n_runs} runs "
              f"({time.perf_counter()-t0:.1f}s)", file=sys.stderr)
    except Exception as exc:
        print(f"[bench] synth tag array failed ({type(exc).__name__}: {exc}); "
              f"MEM-only bench", file=sys.stderr)

    # progressive-result protocol (round-4 fix for the round-3 CPU fallback):
    # measure at m=12 FIRST (201 MB table, proven in-budget in BENCH_r02) and
    # print a complete JSON line as soon as that lands; then opportunistically
    # upgrade to the m=14 optimum (3.2 GB table - its tunnel transfer has
    # blown the driver timeout before) and print a second, better line. The
    # orchestrator takes the LAST complete line, harvesting partial stdout if
    # the inner process dies mid-upgrade - so a stalled 3.2 GB transfer can
    # no longer cost the round its TPU number.
    deadline = float(os.environ.get("PANIDX_BENCH_DEADLINE", "0"))

    def emit(device_rps, host1, host2, mer_m, suffix="", tags_rps=None,
             host_comb=None, tag_ov_frac=None, s_long=None):
        rec = {
            "metric": "mem_find_reads_per_s",
            "value": round(device_rps, 1),
            "unit": f"reads/s (150bp, minlen20, {idx.n // 1_000_000}Mbp synthetic pangenome){suffix}",
            "vs_baseline": round(device_rps / host1, 2),
            "vs_baseline_meaning": "1 chip vs 1 native-engine CPU core (src/cpp, same algorithm+data)",
            "vs_baseline_2core": round(device_rps / host2, 2) if host2 else None,
            "vs_baseline_32core_ideal": round(device_rps / (32 * host1), 2),
            "seed_m": mer_m,
        }
        if s_long:
            rec["long_seed_s"] = s_long  # sparse dictionary tier active
        if tags_rps:
            # the same batch served through BOTH halves (MEM finding + one
            # tag lookup per buffered MEM, find_mems.cpp:96-146)
            rec["with_tags_reads_per_s"] = round(tags_rps, 1)
            if host_comb:
                rec["with_tags_vs_baseline"] = round(tags_rps / host_comb, 2)
                rec["with_tags_vs_32core_ideal"] = round(
                    tags_rps / (32 * host_comb), 2)
            rec["tag_overflow_frac"] = round(tag_ov_frac or 0.0, 4)
        print(json.dumps(rec), flush=True)

    def emit_tags(tags_rps, mem_rps, host_comb, mer_m, s_long=None):
        print(json.dumps({
            "metric": "mem_find_and_tags_reads_per_s",
            "value": round(tags_rps, 1),
            **({"long_seed_s": s_long} if s_long else {}),
            "unit": (f"reads/s through BOTH serving halves (MEM finding + "
                     f"per-buffered-MEM tag lookup, find_mems.cpp:96-146; "
                     f"150bp, minlen20, {idx.n // 1_000_000}Mbp synthetic "
                     f"pangenome + synthetic tag array)"),
            "vs_baseline": round(tags_rps / host_comb, 2) if host_comb else None,
            "vs_baseline_meaning": ("1 chip vs 1 native-engine CPU core "
                                    "running the same both-halves loop"),
            "vs_baseline_32core_ideal": round(
                tags_rps / (32 * host_comb), 2) if host_comb else None,
            "mem_only_reads_per_s": round(mem_rps, 1),
            "seed_m": mer_m,
        }), flush=True)

    # prefer_build: the on-device build moves ~0 bytes over the tunnel; the
    # 201 MB m=12 cache stays as the fallback if the build itself fails. On
    # the XLA-CPU fallback backend the cache load is the only sane path.
    prefer_build = jax.default_backend() != "cpu"
    # CPU baseline FIRST (device-independent, ~1s): the JSON line can then
    # go out the moment the device measurement lands. 1 thread = the
    # per-core baseline (the reference's deployment is one process per
    # chromosome with OpenMP); 2 threads = every core this host has, for an
    # honest multi-core point.
    host2 = 0.0
    host_comb1 = 0.0
    if native.available():
        if tags is not None:
            host_rps, host_comb1 = native_baseline(idx, codes, lens,
                                                   n_threads=1, tags=tags)
        else:
            host_rps = native_baseline(idx, codes, lens, n_threads=1)
        host2 = native_baseline(idx, codes, lens, n_threads=2)
    else:
        t0 = time.perf_counter()
        host_mems = 0
        for r in reads[:BASELINE_READS]:
            host_mems += len(find_all_mems(idx, r, MIN_LEN, MIN_OCC))
        host_dt = time.perf_counter() - t0
        host_rps = BASELINE_READS / host_dt
        print(f"[bench] numpy host baseline: {host_rps:.1f} reads/s", file=sys.stderr)

    # PANIDX_BENCH_MER overrides the first-phase seed size. On the XLA-CPU
    # fallback backend a 4^12 build can blow the fallback timeout, so when
    # no usable cache exists there, drop to a small table (builds in
    # seconds); a cached m=12/11/10 table is still preferred.
    mer_first = int(os.environ.get("PANIDX_BENCH_MER", "12"))
    if not prefer_build and "PANIDX_BENCH_MER" not in os.environ:
        from pangenome_index_tpu.ops.mertable import mer_table_key

        for mc in range(mer_first, mer_first - 3, -1):
            if os.path.exists(os.path.join(cache, f"mer_{mer_table_key(idx, mc)}.npz")):
                mer_first = mc
                break
        else:
            mer_first = min(mer_first, 8)
    # persist=True: only fires when the table was built AND no cache exists,
    # so later attempts / the cpu-fallback find a warm cache (the ~400 MB
    # d2h fetch at m=12 happens once per index, not per run)
    # on_mem_result fires the phase-1 JSON line the moment the MEM-only
    # number lands - BEFORE the tag-query compile, so the driver-critical
    # line never waits on the round-5 combined measurement
    m = serve_measure(idx, codes, lens, chunk=None, mer_m=mer_first,
                      mer_cache_dir=cache, prefer_build=prefer_build,
                      persist=True, measure_ext=False, tag_tables=tags,
                      on_mem_result=lambda rps, mm: emit(rps, host_rps,
                                                         host2, mm),
                      on_provisional=lambda rps: emit(
                          rps, host_rps, host2, mer_first,
                          suffix=" [warm-subset provisional]"))
    device_rps = m["device_rps"]
    if m.get("tags_rps"):
        emit_tags(m["tags_rps"], device_rps, host_comb1, m["mer_m"])
    # the LAST complete line carries both metrics (with_tags_* fields) so a
    # single BENCH record self-describes the full serving path
    emit(device_rps, host_rps, host2, m["mer_m"], tags_rps=m.get("tags_rps"),
         host_comb=host_comb1, tag_ov_frac=m.get("tag_ov_frac"))

    # everything past the first emitted line is opportunistic: a failure here
    # must never cost the phase-1 result (the orchestrator now also harvests
    # stdout from rc!=0 exits, but exiting 0 keeps the contract explicit)
    try:
        if native.available():
            # cross-check device vs native MEM counts AND per-MEM tag unique
            # counts now that both exist
            native_baseline(idx, codes, lens, m["counts"], n_threads=1,
                            tags=tags,
                            tag_dev=(None if m.get("tag_nu") is None
                                     else (m["tag_nu"], m["tag_ov"])))
        ext = measure_ext_rate(m["tables"], idx.n)
        print(f"[bench] LF/extension steps: {ext/1e6:.1f} M/s "
              f"(each = 2 six-symbol rank queries)", file=sys.stderr)

        # m=14 upgrade (+25% at the measured sweep, PERF.md round 3):
        # on-device build first (~0 tunnel bytes; stable at bench-scale
        # indexes - the worker-crash mode was 600 Mbp), cached npz as
        # fallback. Only attempted with wall budget for a cold builder
        # compile + build + measurement.
        best = m
        remaining = (deadline - time.monotonic()) if deadline else float("inf")
        budget = 300
        if prefer_build and remaining > budget:
            print(f"[bench] m=14 upgrade: {remaining:.0f}s left, "
                  f"budget {budget:.0f}s", file=sys.stderr)
            m14 = serve_measure(idx, codes, lens, chunk=None, mer_m=14,
                                mer_cache_dir=cache, prefer_build=True,
                                persist=False, measure_ext=False,
                                tag_tables=tags)
            if m14["mer_m"] == 14 and m14["device_rps"] > device_rps:
                if m14.get("tags_rps"):
                    emit_tags(m14["tags_rps"], m14["device_rps"],
                              host_comb1, 14)
                emit(m14["device_rps"], host_rps, host2, 14,
                     tags_rps=m14.get("tags_rps"), host_comb=host_comb1,
                     tag_ov_frac=m14.get("tag_ov_frac"))
                best = m14
        else:
            print(f"[bench] m=14 upgrade skipped: {remaining:.0f}s left < "
                  f"budget {budget:.0f}s (or cpu backend)", file=sys.stderr)

        # sparse long-seed dictionary upgrade (round 5): bi-intervals of
        # every OCCURRING (min_len-1)-mer collapse step-1 of each MEM call
        # to one stepwise extension (ops/sparsedict.py; 14.1k -> 68.8k
        # reads/s on the depth90 realistic-filter row, PERF.md round 5).
        # The host frontier build is ~2 min once per index, then cached;
        # without a cache it only runs with wall budget to spare.
        from pangenome_index_tpu.ops.sparsedict import (get_sparse_dict,
                                                        sparse_dict_key)

        s_long = MIN_LEN - 1
        sd_path = os.path.join(cache, f"sdict_{sparse_dict_key(idx, s_long)}.npz")
        remaining = (deadline - time.monotonic()) if deadline else float("inf")
        if prefer_build and (os.path.exists(sd_path) or remaining > 400):
            keys_sd, vals_sd = get_sparse_dict(idx, s_long, path=sd_path)
            msd = serve_measure(idx, codes, lens, chunk=None,
                                mer_m=best["mer_m"], mer_cache_dir=cache,
                                prefer_build=True, persist=False,
                                measure_ext=False, tag_tables=tags,
                                sdict=(keys_sd, vals_sd, s_long))
            if not np.array_equal(msd["counts"], m["counts"]):
                print("[bench] WARNING: long-seed MEM counts diverged; "
                      "upgrade discarded", file=sys.stderr)
            elif msd["device_rps"] > best["device_rps"]:
                if msd.get("tags_rps"):
                    emit_tags(msd["tags_rps"], msd["device_rps"],
                              host_comb1, msd["mer_m"], s_long)
                emit(msd["device_rps"], host_rps, host2, msd["mer_m"],
                     tags_rps=msd.get("tags_rps"), host_comb=host_comb1,
                     tag_ov_frac=msd.get("tag_ov_frac"), s_long=s_long)
        else:
            print(f"[bench] long-seed upgrade skipped: no cache and "
                  f"{remaining:.0f}s left", file=sys.stderr)
    except Exception as exc:
        print(f"[bench] post-measurement work failed ({type(exc).__name__}: "
              f"{exc}); phase-1 line stands", file=sys.stderr)


def orchestrate():
    """Run the measurement in a subprocess with a timeout; the TPU tunnel in
    this environment has multi-minute stalls and occasional outages, and a
    hung transfer would otherwise leave the driver with no result. Falls back
    to the XLA-CPU backend (clearly labeled) if the TPU attempt dies."""
    import subprocess

    here = os.path.abspath(__file__)
    attempts = [
        (dict(os.environ), 480, "tpu"),
        # tunnel stalls are transient and all caches are warm after attempt
        # one, so a short TPU retry usually lands (~140-200s warm); a third
        # try buys another chance to catch a healthy tunnel window (outages
        # observed to clear within minutes)
        (dict(os.environ), 300, "tpu-retry"),
        (dict(os.environ), 300, "tpu-retry2"),
        # fallback pins the small config: XLA-CPU at 20 Mbp would blow the
        # remaining budget and leave no result at all
        # fallback pins the small config; main() itself drops to a small
        # seed table on the cpu backend when no cache exists
        ({**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
          "PANIDX_BENCH_BIG": "0"}, 300, "cpu-fallback"),
    ]
    for env, tmo, label in attempts:
        # the inner process prints a complete JSON line after EACH finished
        # measurement (m=12 first, then the m=14 upgrade) and reads this
        # deadline to decide whether the upgrade fits; on timeout the kill
        # only ever costs the upgrade, never the phase-1 result
        env["PANIDX_BENCH_DEADLINE"] = str(time.monotonic() + tmo - 20)
        timed_out = False
        try:
            r = subprocess.run([sys.executable, here, "--inner"], env=env,
                               capture_output=True, timeout=tmo)
            stdout, stderr, rc = r.stdout, r.stderr, r.returncode
        except subprocess.TimeoutExpired as e:
            print(f"[bench] {label} attempt timed out after {tmo}s",
                  file=sys.stderr)
            stdout, stderr, rc = e.stdout or b"", e.stderr or b"", None
            timed_out = True
        sys.stderr.write(stderr.decode(errors="replace"))
        out = [l for l in stdout.decode(errors="replace").splitlines()
               if l.startswith("{")]
        if out and rc not in (0, None):
            # a crash AFTER a complete measurement line (e.g. the m=14
            # upgrade died) must not discard the valid result
            print(f"[bench] {label}: rc={rc} but a complete measurement "
                  f"line was printed - using it", file=sys.stderr)
        if out:
            rec = json.loads(out[-1])
            if label == "cpu-fallback":
                rec["unit"] += f" [{label}]"
            print(json.dumps(rec))
            return 0
        print(f"[bench] {label} attempt failed (rc={rc})", file=sys.stderr)
    print(json.dumps({"metric": "mem_find_reads_per_s", "value": 0,
                      "unit": "reads/s (bench could not run)", "vs_baseline": 0}))
    return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(orchestrate())
