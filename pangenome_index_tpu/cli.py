"""``panidx`` command-line interface.

Mirrors the reference's eight executables (src/*.cpp -> bin/, makefile:60)
with matching argv shapes and stdout formats so output parity is mechanical:

  build-rindex <rl_bwt>                        (build_rindex.cpp; stdout = .ri)
  find-mems <ri> <tags> <reads> <min_len> <min_occ>      (find_mems.cpp)
  query-tags <ri> <tags> <reads>                          (query_tags.cpp)
  print-stats <ri> <tags>                                 (print_stats.cpp)
  convert-tags <in.tags> <out.tags>                       (convert_tags.cpp)
  build-tags <gbz> <rl_bwt> <out.tags>                    (build_tags.cpp)
  merge-tags <gbz> <whole.ri> <tags_dir> <out>            (merge_tags.cpp)
  tags-check <tags...>                                    (tags_check.cpp)

Unlike the reference (positional argv only, knobs hard-coded - SURVEY §5),
every tuning knob is exposed as a flag. Queries run on the JAX device engine
by default (--engine host for the numpy reference path).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from .utils.alphabet import BYTE_TO_CODE


def _read_reads(path: str) -> list[bytes]:
    with open(path, "rb") as fh:
        return [l for l in fh.read().split(b"\n") if l]


def _pack_reads(reads: list[bytes]):
    L = max(len(r) for r in reads)
    codes = np.zeros((len(reads), L), np.int32)
    lens = np.array([len(r) for r in reads], np.int32)
    for i, r in enumerate(reads):
        codes[i, : len(r)] = BYTE_TO_CODE[np.frombuffer(r, np.uint8)]
    return codes, lens


def _setup_compile_cache():
    """Persistent XLA compile cache for the device engines: without it every
    `panidx` process pays the serving-program compiles cold (~30-90 s over
    the tunnel per invocation - the dominant cost of short CLI runs).
    PANIDX_XLA_CACHE overrides the location; empty disables."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "PANIDX_XLA_CACHE", os.path.expanduser("~/.cache/panidx/xla"))
        if cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _resolve_long_seed(arg: int, min_len: int, mer_m: int) -> int:
    """Sparse long-seed dictionary window (ops/sparsedict.py). -1 = auto:
    min_len - 1 (step 1 of every MEM call becomes ONE stepwise extension),
    capped at 31 (int64 2-bit keys); off when it would not beat the dense
    tier or min_len is tiny. 0 disables."""
    if arg == 0:
        return 0
    s = min(min_len - 1, 31) if arg == -1 else arg
    return s if s > max(mer_m, 3) else 0


def _resolve_mer_len(arg: int, min_len: int, n: int) -> int:
    """Seed-table size. -1 = auto: the measured serving optimum is the
    largest table that fits comfortably (PERF.md round 3: m=14 gives +25%
    reads/s over m=12 at depth90; every +1 of m removes one extension from
    each seeded step-1/step-3 entry), degraded to min_len-1 so seeds stay
    on for short patterns and capped at 13 for int64 position dtypes (the
    4^m x 3 table doubles). Returns 0 when seeds are off (m < 4 is not
    worth the table reads, and the engine requires min_len > m)."""
    if arg != -1:
        return arg if (arg and min_len > arg) else 0
    import jax

    if jax.default_backend() == "cpu":
        # the 4^m build is device work; on the CPU backend a 4^14 table
        # takes hours - keep the table small there (debug/host backends)
        cap = 8
    else:
        cap = 14 if n < 2**31 else 13
    # scale with index size: cap 4^m at ~128n entries - deeper tables on a
    # small index are mostly empty intervals and their build/cache/transfer
    # dwarfs the index they serve (a 2 Mbp index must not trigger a 3.2 GB
    # m=14 table - advisor r3). 128x keeps the measured m=14 optimum at the
    # 4 Mbp bench config (PERF.md round 3 sweep) while a 100 kbp fixture
    # resolves to m=11 (13 MB).
    cap = min(cap, int(np.log2(max(128 * n, 4)) / 2))
    m = min(cap, min_len - 1)
    return m if m >= 4 else 0


def cmd_build_sdict(args) -> int:
    """Prebuild the sparse long-seed dictionary artifact for an index.

    `find-mems --long-seed` builds and caches it on demand; this command
    materializes the same content-keyed artifact ahead of deployment (the
    reference's separate-build-step model, cf. its build_rindex/build_tags
    split). Uses the device frontier build when an accelerator is present,
    host otherwise - identical bytes either way."""
    from .formats import ri
    from .ops.sparsedict import get_sparse_dict

    idx = ri.load_file(args.ri, use_mmap=True)
    s = args.s if args.s > 0 else min(args.min_len - 1, 31)
    out = args.output or f"{args.ri}.sdict{s}.npz"
    tables = None
    if args.engine == "device":
        _setup_compile_cache()
        import jax

        if jax.default_backend() != "cpu":
            from .ops.tables import rindex_to_device

            tables = rindex_to_device(idx, checkpoint=True, mem_only=True)
    t0 = time.perf_counter()
    keys, vals = get_sparse_dict(idx, s, path=out, min_keep=args.min_keep,
                                 tables=tables)
    print(f"sparse dict s={s}: {len(keys)} entries, "
          f"{(keys.nbytes + vals.nbytes) >> 20} MB -> {out} "
          f"({time.perf_counter() - t0:.1f}s)", file=sys.stderr)
    return 0


def cmd_build_rindex(args) -> int:
    from .formats import ri
    from .formats.rlbwt import read_rlbwt
    from .models.rindex import build_rindex

    idx = build_rindex(read_rlbwt(args.rl_bwt))
    data = ri.serialize_legacy(idx) if args.format == "legacy" else ri.serialize_encoded(idx)
    out = sys.stdout.buffer if args.output == "-" else open(args.output, "wb")
    out.write(data)
    if args.output != "-":
        out.close()
    print(f"r-index: {idx.n_runs} runs, {idx.n_seq} sequences, BWT size {idx.n}", file=sys.stderr)
    return 0


def _load_serving(args):
    from .formats import ri, tags as tagfmt

    print("Reading the rindex file (encoded)", file=sys.stderr)
    idx = ri.load_file(args.ri)
    print("Reading the tag array index", file=sys.stderr)
    tags = tagfmt.load_tags_file(args.tags, fmt=getattr(args, "tags_format", "auto"))
    return idx, tags


def cmd_find_mems(args) -> int:
    reads = _read_reads(args.reads)
    idx, tags = _load_serving(args)
    t0 = time.perf_counter()
    total_mem_time = 0.0
    total_tag_time = 0.0

    if args.engine == "host":
        from .models.mems import find_all_mems

        for i, read in enumerate(reads, start=1):
            tm = time.perf_counter()
            mems = find_all_mems(idx, read, args.min_len, args.min_occ)
            total_mem_time += time.perf_counter() - tm
            print(f"Seq: {i}")
            for m in mems:
                print(f"MEM START: {m.start}, MEM END: {m.end} BWT START: {m.bwt_start} SIZE: {m.size}")
                tq = time.perf_counter()
                vals, nruns = tags.query(m.bwt_start, m.bwt_start + m.size - 1)
                total_tag_time += time.perf_counter() - tq
                print(f"Number of unique positions: {len(vals)}")
                print("".join(f"{v}, " for v in vals))
            print()
    elif args.engine == "native":
        from . import native

        codes, lens = _pack_reads(reads)
        tm = time.perf_counter()
        s, e, b, z, cnt = native.find_mems_native(
            idx, codes, lens, args.min_len, args.min_occ, capacity=args.mem_capacity)
        total_mem_time = time.perf_counter() - tm
        if (cnt > args.mem_capacity).any():
            from .models.mems import find_all_mems

            for i in np.flatnonzero(cnt > args.mem_capacity):
                mems = find_all_mems(idx, reads[i], args.min_len, args.min_occ)
                pad = max(len(mems) - s.shape[1], 0)
                if pad:
                    s = np.pad(s, ((0, 0), (0, pad)))
                    e = np.pad(e, ((0, 0), (0, pad)))
                    b = np.pad(b, ((0, 0), (0, pad)))
                    z = np.pad(z, ((0, 0), (0, pad)))
                for m, mm in enumerate(mems):
                    s[i, m], e[i, m], b[i, m], z[i, m] = mm.start, mm.end, mm.bwt_start, mm.size
                cnt[i] = len(mems)
        flat = [(i, m) for i in range(len(reads)) for m in range(int(cnt[i]))]
        tq = time.perf_counter()
        if flat:
            qs = np.array([b[i, m] for i, m in flat])
            qe = np.array([b[i, m] + z[i, m] - 1 for i, m in flat])
            tpos, tuniq, truns = native.query_tags_native(tags, qs, qe, capacity=args.tag_capacity)
        total_tag_time = time.perf_counter() - tq
        fi = 0
        for i in range(len(reads)):
            print(f"Seq: {i + 1}")
            for m in range(int(cnt[i])):
                print(f"MEM START: {s[i, m]}, MEM END: {e[i, m]} BWT START: {b[i, m]} SIZE: {z[i, m]}")
                print(f"Number of unique positions: {tuniq[fi]}")
                print("".join(f"{v}, " for v in tpos[fi, : tuniq[fi]]))
                fi += 1
            print()
    elif getattr(args, "mesh", None):
        _setup_compile_cache()
        # full serving step over a (data x model) jax.sharding.Mesh: reads
        # sharded over 'data', the checkpoint rank table range-sharded over
        # 'model' (one local gather + psum per rank query - the round-2
        # serving representation, distributed), tag tables replicated, m-mer
        # seed table replicated, chunked back-to-back dispatch - the
        # TPU-native deployment of the reference's per-chromosome sharding
        # (parallel/engine.py; merge_tags.cpp:42-284 is the model to match)
        import jax
        import jax.numpy as jnp

        from .ops.tables import tags_to_device
        from .parallel.engine import make_distributed_serving_step
        from .parallel.multihost import init_distributed
        from .parallel.sharding import make_mesh, pad_rindex_tables

        init_distributed()
        n_data, n_model = (int(v) for v in args.mesh.lower().split("x"))
        mesh = make_mesh(n_data, n_model)
        codes, lens = _pack_reads(reads)
        n_reads = len(reads)
        # mer table FIRST, padded mesh tables after: the builder makes its
        # own single-chip ckpt tables (freed when it returns), so only one
        # full table set is ever device-resident at a time (advisor r4: the
        # old order had t_pad + the builder's tables co-resident on device 0
        # exactly at the large indexes the mesh path exists for)
        mer_m = _resolve_mer_len(args.mer_len, args.min_len, idx.n)
        mer_args = ()
        if mer_m:
            from .ops.mertable import get_mer_table, read_mer_keys_fast

            mt_np, mt_dev, mer_m = get_mer_table(
                idx, mer_m, path=None if args.no_mer_cache
                else (lambda m: f"{args.ri}.mer{m}.npz"))
            if mt_np is None:  # cache-less device build: fetch for resharding
                mt_np = np.asarray(mt_dev)
            del mt_dev  # free the single-chip copy before t_pad lands
            mk, mv = read_mer_keys_fast(codes, lens, mer_m)
        s_long = _resolve_long_seed(getattr(args, "long_seed", 0),
                                    args.min_len, mer_m)
        sd_vals = None
        if s_long:
            from .ops.sparsedict import get_sparse_dict, read_windows_fast

            sd_keys, sd_vals = get_sparse_dict(
                idx, s_long, path=None if args.no_mer_cache
                else f"{args.ri}.sdict{s_long}.npz")
            from .ops.sparsedict import DEVICE_BYTES_CAP

            if sd_vals.nbytes > DEVICE_BYTES_CAP:
                print(f"long-seed dictionary over the HBM budget; dense tier "
                      f"only (PANIDX_SDICT_MAX_BYTES overrides)", file=sys.stderr)
                s_long, sd_vals = 0, None
            else:
                _, _, di = read_windows_fast(codes, lens, s_long, sd_keys)
        # the two-level ckpt layout (ops/tables.py) serves any n now; the
        # rows stay int32 (superblock-relative) at n >= 2^31
        use_ckpt = args.rank_mode == "checkpoint"
        t_pad = pad_rindex_tables(idx, n_model, checkpoint=use_ckpt)
        tt = tags_to_device(tags)
        step = make_distributed_serving_step(
            mesh, capacity=args.mem_capacity, tag_capacity=args.tag_capacity,
            tables=t_pad, mer_m=mer_m, sdict_m=s_long)
        B = (args.batch_size or 4096) * n_data  # global lanes per dispatch
        chunks = []
        tm = time.perf_counter()
        with mesh:
            mer_head = ()
            if mer_m:
                mer_head = (jnp.asarray(mt_np, t_pad.pos_dtype),)
            sd_head = ()
            if s_long:
                sd_head = (jnp.asarray(sd_vals, t_pad.pos_dtype),)
            for s0 in range(0, n_reads, B):
                hi = min(s0 + B, n_reads)
                pad = (-(hi - s0)) % n_data
                codes_p = np.pad(codes[s0:hi], ((0, pad), (0, 0)))
                lens_p = np.pad(lens[s0:hi], (0, pad))
                mer_args = ()
                if mer_m:
                    mer_args = mer_head + (
                        jnp.asarray(np.pad(mk[s0:hi], ((0, pad), (0, 0)))),
                        jnp.asarray(np.pad(mv[s0:hi], ((0, pad), (0, 0)))))
                if s_long:
                    mer_args = mer_args + sd_head + (jnp.asarray(
                        np.pad(di[s0:hi], ((0, pad), (0, 0)),
                               constant_values=-1)),)
                chunks.append((hi - s0, step(
                    t_pad, tt, jnp.asarray(codes_p), jnp.asarray(lens_p),
                    jnp.asarray(args.min_len, t_pad.pos_dtype),
                    jnp.asarray(args.min_occ, t_pad.pos_dtype), *mer_args)))
        # all chunks dispatched before the first fetch (async queueing)
        res = [np.concatenate([np.array(r[a])[:nn] for nn, (r, _, _) in chunks])
               for a in range(6)]
        starts, ends, bwts, sizes, counts, overflow = res
        total_mem_time = time.perf_counter() - tm
        M = starts.shape[1]
        tp = np.concatenate(
            [np.asarray(tq.positions).reshape(-1, M, args.tag_capacity)[:nn]
             for nn, (_, tq, _) in chunks])
        tu = np.concatenate([np.asarray(tq.n_unique)[:nn]
                             for nn, (_, tq, _) in chunks])
        tof = np.concatenate([np.asarray(tq.overflow)[:nn]
                              for nn, (_, tq, _) in chunks])
        tq = time.perf_counter()
        fi = 0
        for i in range(n_reads):
            print(f"Seq: {i + 1}")
            if overflow[i]:
                from .models.mems import find_all_mems

                mems = find_all_mems(idx, reads[i], args.min_len, args.min_occ)
                for m in mems:
                    print(f"MEM START: {m.start}, MEM END: {m.end} BWT START: {m.bwt_start} SIZE: {m.size}")
                    vals, _ = tags.query(m.bwt_start, m.bwt_start + m.size - 1)
                    print(f"Number of unique positions: {len(vals)}")
                    print("".join(f"{v}, " for v in vals))
                print()
                continue
            for m in range(int(counts[i])):
                print(f"MEM START: {starts[i, m]}, MEM END: {ends[i, m]} BWT START: {bwts[i, m]} SIZE: {sizes[i, m]}")
                if tof[i, m]:
                    vals, _ = tags.query(int(bwts[i, m]), int(bwts[i, m] + sizes[i, m] - 1))
                else:
                    vals = tp[i, m, : tu[i, m]]
                print(f"Number of unique positions: {len(vals)}")
                print("".join(f"{v}, " for v in vals))
            print()
        total_tag_time = time.perf_counter() - tq
    else:
        _setup_compile_cache()
        import jax.numpy as jnp

        from .ops.mems import find_mems_batch
        from .ops.tables import rindex_to_device, tags_to_device
        from .ops.tagquery import query_tags_batch

        mode = args.rank_mode
        if mode in ("dense", "ultra") and idx.n >= 2**31:
            # dense/ultra would materialize O(n) int64 HBM tables (>=17 GB
            # exactly when this fires); checkpoint serves any n via the
            # two-level superblock-relative layout (ops/tables.py)
            mode = "bucketed"
        t = rindex_to_device(idx, **({} if mode == "bucketed" else {mode: True}))
        tt = tags_to_device(tags)
        codes, lens = _pack_reads(reads)
        mer_kw = {}
        mer_m = _resolve_mer_len(args.mer_len, args.min_len, idx.n)
        if mer_m:
            from .ops.mertable import get_mer_table, read_mer_keys_fast

            # the table is a pure function of (index, m): persist it next to
            # the index so serving pays the expansion once per index, not
            # once per process (VERDICT r1: cold start). Built on-device
            # when a device is present (~70s at m=14 vs tens of minutes of
            # host numpy - VERDICT r3 item 3), reusing the serving tables;
            # on device-build failure the builder steps m down (advisor r4).
            mt_np, mt_dev, mer_m = get_mer_table(
                idx, mer_m, path=None if args.no_mer_cache
                else (lambda m: f"{args.ri}.mer{m}.npz"), tables=t)
            mt = (mt_dev if mt_dev is not None
                  else jnp.asarray(mt_np, t.run_start.dtype))
            mk, mv = read_mer_keys_fast(codes, lens, mer_m)
            mer_kw = dict(mer_table=mt, mer_keys=jnp.asarray(mk),
                          mer_valid=jnp.asarray(mv), mer_m=mer_m)
        s_long = _resolve_long_seed(getattr(args, "long_seed", 0),
                                    args.min_len, mer_m)
        di = None
        if s_long:
            # sparse long-seed tier: one host searchsorted per read window,
            # then step-1 entries collapse to ONE stepwise extension
            # (ops/sparsedict.py; cached next to the index like the table)
            from .ops.sparsedict import get_sparse_dict, read_windows_fast

            sd_path = (None if args.no_mer_cache
                       else f"{args.ri}.sdict{s_long}.npz")
            sd_keys, sd_vals = get_sparse_dict(idx, s_long, path=sd_path,
                                               tables=t)
            from .ops.sparsedict import DEVICE_BYTES_CAP

            if sd_vals.nbytes > DEVICE_BYTES_CAP:
                print(f"long-seed dictionary is {sd_vals.nbytes >> 20} MB "
                      f"(> {DEVICE_BYTES_CAP >> 20} MB HBM budget); "
                      f"serving with the dense tier only "
                      f"(PANIDX_SDICT_MAX_BYTES overrides)", file=sys.stderr)
                di = None
            else:
                _, _, di = read_windows_fast(codes, lens, s_long, sd_keys)
                mer_kw.update(sdict_vals=jnp.asarray(sd_vals),
                              sdict_idx=jnp.asarray(di), sdict_m=s_long)
        tm = time.perf_counter()
        B = args.batch_size
        if B == 0 and len(reads) > 4096:
            # measurement autotune (PERF.md: the lane optimum is
            # workload-dependent): race the candidates on the first reads
            best, best_dt = None, None
            for cand in (4096, 8192):
                sub = min(cand, len(reads))
                kw = {k: (v[:sub] if k in ("mer_keys", "mer_valid", "sdict_idx") else v)
                      for k, v in mer_kw.items()}
                args_bc = (t, jnp.asarray(codes[:sub]), jnp.asarray(lens[:sub]),
                           args.min_len, args.min_occ)
                np.asarray(find_mems_batch(*args_bc, capacity=args.mem_capacity,
                                           **kw).count)  # compile
                t1 = time.perf_counter()
                np.asarray(find_mems_batch(*args_bc, capacity=args.mem_capacity,
                                           **kw).count)
                dt = (time.perf_counter() - t1) / sub
                if best_dt is None or dt < best_dt:
                    best, best_dt = cand, dt
            B = best
            print(f"autotuned batch size: {B}", file=sys.stderr)
        elif B == 0:
            B = 4096
        # work-sorted chunking: with multiple chunks, order reads by the
        # seed-table difficulty proxy so each lockstep chunk is
        # work-homogeneous; results are inverse-permuted back below
        codes0, lens0 = codes, lens  # input order (overflow re-dispatch)
        order = np.arange(len(reads))
        if mer_kw.get("mer_table") is not None and len(reads) > B:
            from .ops.mertable import seed_difficulty

            # mt_np is None when the table skipped the npz cache (big-table
            # device rebuild): index the device table then - one [B, L]
            # gather + small fetch, not a multi-GB table transfer
            proxy = np.asarray(seed_difficulty(
                mt_np if mt_np is not None else mer_kw["mer_table"],
                mk, mv, args.min_occ, lengths=lens, m=mer_m))
            order = np.argsort(proxy, kind="stable")
            codes, lens = codes[order], lens[order]
            mer_kw["mer_keys"] = jnp.asarray(mk[order])
            mer_kw["mer_valid"] = jnp.asarray(mv[order])
            if di is not None:
                mer_kw["sdict_idx"] = jnp.asarray(di[order])
        pending = []
        for s0 in range(0, len(reads), B):
            kw = {k: (v[s0 : s0 + B] if k in ("mer_keys", "mer_valid", "sdict_idx") else v)
                  for k, v in mer_kw.items()}
            pending.append(find_mems_batch(
                t, jnp.asarray(codes[s0 : s0 + B]), jnp.asarray(lens[s0 : s0 + B]),
                args.min_len, args.min_occ, capacity=args.mem_capacity, **kw))
        # every chunk is dispatched before the first fetch: chunks queue
        # back-to-back on the device (jax dispatch is async), no idle gap
        parts = [[np.array(a) for a in r] for r in pending]  # writable copies
        res = [np.concatenate([p[i] for p in parts]) for i in range(6)]
        if not np.array_equal(order, np.arange(len(reads))):
            inv = np.empty_like(order)
            inv[order] = np.arange(len(reads))
            res = [a[inv] for a in res]
        starts, ends, bwts, sizes, counts, overflow = res
        # Reads whose MEM count exceeded the device buffer re-dispatch ON THE
        # DEVICE at escalated capacity before any host work (VERDICT r4
        # item 3: the per-read scalar host loop made dense min_occ=1
        # workloads host-bound - at that workload EVERY read overflows the
        # serving capacity). `count` is exact even on overflow, so each
        # read's tier is known up front: one dispatch per tier, no repeated
        # overflow, only counts past the top tier ever touch the host path.
        # The reference's contract being matched: unbounded per-read emission
        # (find_mems.cpp:105-139).
        for tier in (t_ for t_ in (128, 1024) if t_ > args.mem_capacity):
            sel = np.flatnonzero(overflow & (counts <= tier))
            if not len(sel):
                continue
            kw = {}
            if mer_kw.get("mer_table") is not None:
                kw = dict(mer_table=mt, mer_keys=jnp.asarray(mk[sel]),
                          mer_valid=jnp.asarray(mv[sel]), mer_m=mer_m)
            if di is not None:
                kw.update(sdict_vals=mer_kw["sdict_vals"],
                          sdict_idx=jnp.asarray(di[sel]), sdict_m=s_long)
            r2 = find_mems_batch(t, jnp.asarray(codes0[sel]),
                                 jnp.asarray(lens0[sel]), args.min_len,
                                 args.min_occ, capacity=tier, **kw)
            pad = tier - starts.shape[1]
            if pad > 0:
                starts, ends, bwts, sizes = (
                    np.pad(a, ((0, 0), (0, pad)))
                    for a in (starts, ends, bwts, sizes))
            for dst, src in ((starts, r2.start), (ends, r2.end),
                             (bwts, r2.bwt_start), (sizes, r2.size)):
                dst[sel, :tier] = np.asarray(src)
            overflow[sel] = False
            print(f"escalated {len(sel)} overflowed reads to device "
                  f"capacity {tier}", file=sys.stderr)
        total_mem_time = time.perf_counter() - tm
        if overflow.any():
            from .models.mems import find_all_mems

            print(f"{int(overflow.sum())} reads past the top device tier: "
                  f"host refind", file=sys.stderr)
            for i in np.flatnonzero(overflow):
                mems = find_all_mems(idx, reads[i], args.min_len, args.min_occ)
                counts[i] = len(mems)
                full = np.zeros((4, len(mems)), dtype=starts.dtype)
                for m, mm in enumerate(mems):
                    full[:, m] = (mm.start, mm.end, mm.bwt_start, mm.size)
                pad = max(len(mems) - starts.shape[1], 0)
                if pad:
                    starts = np.pad(starts, ((0, 0), (0, pad)))
                    ends = np.pad(ends, ((0, 0), (0, pad)))
                    bwts = np.pad(bwts, ((0, 0), (0, pad)))
                    sizes = np.pad(sizes, ((0, 0), (0, pad)))
                starts[i, : len(mems)] = full[0]
                ends[i, : len(mems)] = full[1]
                bwts[i, : len(mems)] = full[2]
                sizes[i, : len(mems)] = full[3]
        # batched tag queries over all MEMs at once (vectorized flat build -
        # a Python pair-list at dense workloads is millions of tuples)
        tq = time.perf_counter()
        counts = counts.astype(np.int64)
        n_flat = int(counts.sum())
        if n_flat:
            ii = np.repeat(np.arange(len(reads)), counts)
            within = np.arange(n_flat) - np.repeat(np.cumsum(counts) - counts,
                                                   counts)
            qs = bwts[ii, within]
            qe = qs + sizes[ii, within] - 1
            tags_res = query_tags_batch(tt, jnp.asarray(qs, tt.bwt_start.dtype),
                                        jnp.asarray(qe, tt.bwt_start.dtype),
                                        capacity=args.tag_capacity)
            tuniq = np.asarray(tags_res.n_unique)
            # positions are compacted to the front of each lane: fetch only
            # the occupied columns (at dense workloads n_unique is ~1 while
            # capacity is 256 - a ~100x cut of the device->host transfer)
            tpos = np.asarray(tags_res.positions[:, : max(int(tuniq.max()), 1)])
            toflow = np.asarray(tags_res.overflow)
        total_tag_time = time.perf_counter() - tq
        if n_flat and toflow.any():
            # resolve device tag-capacity overflows on host (0.0% at the
            # measured workloads) so emission sees uniform arrays
            ov = np.flatnonzero(toflow)
            vals_ov = [tags.query(int(qs[f]), int(qe[f]))[0] for f in ov]
            wid = max(int(tuniq.max()), max(len(v) for v in vals_ov))
            if wid > tpos.shape[1]:
                tpos = np.pad(tpos, ((0, 0), (0, wid - tpos.shape[1])))
            for f, v in zip(ov, vals_ov):
                tpos[f, : len(v)] = v
                tuniq[f] = len(v)
            toflow[:] = False
        emitted = False
        if n_flat:
            # native formatter (src/cpp/mem_format.cpp): the Python loop
            # below is ~5.5M print calls at dense workloads (~60s for 1.8M
            # MEMs); the native path renders the same bytes in well under a
            # second straight to the stdout fd
            try:
                from . import native as _native

                sys.stdout.flush()
                _native.format_mems_native(
                    counts, starts[ii, within], ends[ii, within], qs,
                    sizes[ii, within], tuniq, tpos, sys.stdout.fileno())
                emitted = True
            except Exception as exc:
                print(f"native formatter unavailable ({exc}); "
                      f"python emission", file=sys.stderr)
        if not emitted:
            fi = 0
            for i in range(len(reads)):
                print(f"Seq: {i + 1}")
                for m in range(int(counts[i])):
                    print(f"MEM START: {starts[i, m]}, MEM END: {ends[i, m]} BWT START: {bwts[i, m]} SIZE: {sizes[i, m]}")
                    vals = tpos[fi, : tuniq[fi]]
                    print(f"Number of unique positions: {len(vals)}")
                    print("".join(f"{v}, " for v in vals))
                    fi += 1
                print()

    print(f"\nTotal time for finding all MEMs: {total_mem_time} seconds")
    print(f"Total time for all tag queries: {total_tag_time} seconds")
    return 0


def cmd_query_tags(args) -> int:
    reads = _read_reads(args.reads)
    idx, tags = _load_serving(args)

    if args.engine == "host":
        ranges = [idx.count(r) for r in reads]
    elif args.engine == "native":
        from . import native

        codes, lens = _pack_reads(reads)
        f, s = native.count_native(idx, codes, lens)
        ranges = list(zip(f.tolist(), s.tolist()))
    else:
        _setup_compile_cache()
        import jax.numpy as jnp

        from .ops.rank import count as count_batch
        from .ops.tables import rindex_to_device

        t = rindex_to_device(idx, checkpoint=True)
        codes, lens = _pack_reads(reads)
        f, s = count_batch(t, jnp.asarray(codes), jnp.asarray(lens))
        ranges = list(zip(np.asarray(f).tolist(), np.asarray(s).tolist()))

    device_tags = None
    if args.engine == "device":
        # batch the tag half on device too (query_tags.cpp:92-108 runs both
        # halves per read; the old CLI only batched the count half and looped
        # tags.query on the host - VERDICT r4 item 6). Lanes that overflow
        # the capacity re-query on the host below; output is unchanged.
        from .ops.tables import tags_to_device
        from .ops.tagquery import query_tags_batch

        tt = tags_to_device(tags)
        qs = np.array([fi for fi, se in ranges], np.int64)
        qe = np.array([se for fi, se in ranges], np.int64)
        ok = qs <= qe
        res = query_tags_batch(tt, jnp.asarray(np.where(ok, qs, 0), tt.bwt_start.dtype),
                               jnp.asarray(np.where(ok, qe, 0), tt.bwt_start.dtype),
                               capacity=args.tag_capacity)
        device_tags = (np.asarray(res.positions), np.asarray(res.n_unique),
                       np.asarray(res.n_runs), np.asarray(res.overflow))

    for i, (read, (first, second)) in enumerate(zip(reads, ranges)):
        if first > second:
            print(f"Read {i} has no matches", file=sys.stderr)
            continue
        if device_tags is not None and not device_tags[3][i]:
            tpos, tuniq, truns, _ = device_tags
            vals, nruns = tpos[i, : tuniq[i]], int(truns[i])
        else:
            vals, nruns = tags.query(first, second)
        print(f"Number of unique positions: {len(vals)}")
        print("".join(f"{v}, " for v in vals))
        print(f"read_index={i}\tlen={len(read)}\tbwt_start={first}\tbwt_end={second}\truns={nruns}")
    return 0


def cmd_print_stats(args) -> int:
    """Per-ON-DISK-substructure sizes and bits/run, in the reference's
    categories and print format (print_stats.cpp:100-117, 175-184; its
    sdsl::size_in_bytes equals the serialized length, so numbers are
    directly comparable). --runtime adds the device flat-table sizes."""
    from .formats import ri, tags as tagfmt

    def human(name, nbytes, runs):
        mb = nbytes / (1024.0 * 1024.0)
        line = f"{name}: {nbytes} bytes ({mb:g} MB)"
        if runs:
            line += f", {nbytes * 8.0 / runs:g} bits/run"
        print(line)

    with open(args.ri, "rb") as fh:
        ri_data = fh.read()
    idx = ri.load(ri_data)
    r = idx.n_runs
    print("=== High-level ===")
    print(f"Total sequence length (BWT size): {idx.n}")
    print(f"BWT runs (r-index): {r}")
    tags = None
    if args.tags:
        with open(args.tags, "rb") as fh:
            tags_data = fh.read()
        tags = tagfmt.load_tags(tags_data)
        print(f"Tag array runs: {tags.n_runs}")
    print()
    print("=== R-index components ===")
    sections = ri.file_sections(ri_data)
    for name, nbytes in sections:
        human(name, nbytes, r)
    human("TOTAL r-index (on disk)", sum(b for _, b in sections), r)
    print()
    if tags is not None:
        print("=== Tag arrays (compressed) components ===")
        tsections = tagfmt.file_sections(tags_data)
        for name, nbytes in tsections:
            human(name, nbytes, tags.n_runs)
        human("TOTAL tag arrays (compressed)", sum(b for _, b in tsections), tags.n_runs)
    if args.runtime:
        print()
        print("=== Runtime flat tables (device layout) ===")
        subs = [
            ("run symbols", idx.run_sym.nbytes), ("run starts", idx.run_start.nbytes),
            ("cumulative counts", idx.cum.nbytes), ("SA samples", idx.samples.nbytes),
            ("last (run tails)", idx.last_sorted.nbytes), ("last_to_run", idx.last_to_run.nbytes),
        ]
        for name, nbytes in subs:
            human(name, nbytes, r)
        human("TOTAL runtime", sum(b for _, b in subs), r)
    return 0


def cmd_convert_tags(args) -> int:
    from .formats import tags as tagfmt

    with open(args.input, "rb") as fh:
        raw = fh.read()
    data = tagfmt.convert_algorithm(raw, compact=args.compact, compat=args.compat)
    if getattr(args, "wrapped", False):
        data = tagfmt.wrap_payload(
            data, "bytecode-compact" if args.compact else "bytecode")
    with open(args.output, "wb") as fh:
        fh.write(data)
    return 0


def cmd_tags_check(args) -> int:
    """Run-count reporting per file (tags_check.cpp:343-358); with
    --verify-gbz/--verify-rlbwt, additionally cross-checks every tag value
    against a fresh ground-truth build (the full r-index-vs-tags check the
    reference carries commented out, tags_check.cpp:368-441)."""
    import numpy as np

    from .formats import tags as tagfmt

    truth = None
    if args.verify_gbz and args.verify_rlbwt:
        from .core.tagbuild import tags_per_row
        from .formats.gbz import load_gbz
        from .formats.rlbwt import read_rlbwt
        from .models.rindex import build_rindex

        gbz = load_gbz(args.verify_gbz)
        idx = build_rindex(read_rlbwt(args.verify_rlbwt), keep_sa=True)
        truth = tags_per_row(gbz, idx)

    rc = 0
    for path in args.tags:
        try:
            tags = tagfmt.load_tags_file(path)
        except Exception as exc:
            print(f"{path}: FAILED to load ({exc})", file=sys.stderr)
            return 1
        print(f"{path}: {tags.n_runs} runs, covers {tags.total} BWT positions")
        if truth is not None:
            per_pos = np.repeat(tags.pos_enc, tags.run_lengths())
            cmp = per_pos[-len(truth):] if len(per_pos) >= len(truth) else per_pos
            ok = np.array_equal(cmp, truth[: len(cmp)])
            mism = int((cmp != truth[: len(cmp)]).sum()) if not ok else 0
            print(f"{path}: verification {'OK' if ok else f'FAILED ({mism} positions differ)'}")
            rc = rc or (0 if ok else 1)
    return rc


def cmd_extract_text(args) -> int:
    """GBZ -> newline-separated haplotype text (replaces the external
    gbz_extract step of the reference pipeline, README.md:74-96)."""
    from .formats.gbz import load_gbz, node_seq

    gbz = load_gbz(args.gbz)
    out = sys.stdout.buffer if args.output == "-" else open(args.output, "wb")
    n = gbz.index.sequences if not args.forward_only else gbz.index.sequences // 2
    for i in range(n):
        sid = 2 * i if args.forward_only else i
        nodes = gbz.index.extract(sid)
        for nd in nodes:
            out.write(node_seq(gbz, nd >> 1, bool(nd & 1)))
        out.write(b"\n")
    if args.output != "-":
        out.close()
    return 0


def cmd_build_bwt(args) -> int:
    """Text -> .rl_bwt (replaces the external grlbwt-cli step): linear-time
    SA-IS in the native engine (default), prefix-doubling XLA sorts on the
    accelerator (--engine device), or the host rotation sort (--engine host)."""
    from .formats.rlbwt import rlbwt_from_text, write_rlbwt

    engine = args.engine
    if engine == "native":
        from . import native

        if not native.available():
            print("native engine unavailable; falling back to host", file=sys.stderr)
            engine = "host"
    if engine == "native":
        from . import native

        with open(args.text, "rb") as fh:
            lines = [l for l in fh.read().split(b"\n") if l]
        bwt, _, _, _ = native.build_bwt_native(lines)
    elif engine == "device":
        from .ops.bwt import bwt_from_lines_device

        with open(args.text, "rb") as fh:
            lines = [l for l in fh.read().split(b"\n") if l]
        bwt, _, _, _ = bwt_from_lines_device(lines)
    else:
        from .models.oracle import oracle_from_file

        bwt = oracle_from_file(args.text).bwt
    rlbwt = rlbwt_from_text(bwt.tobytes())
    write_rlbwt(args.output, rlbwt)
    print(f"build-bwt: {rlbwt.n_runs} runs over {rlbwt.size} characters", file=sys.stderr)
    return 0


def cmd_build_tags(args) -> int:
    from .core.tagbuild import build_tags_pipeline

    return build_tags_pipeline(args.gbz, args.rl_bwt, args.output, k=args.k,
                               stats=args.stats, stream_sa=args.stream_sa,
                               sa_window_bytes=args.sa_window_bytes)


def cmd_merge_tags(args) -> int:
    from .core.merge import merge_tags_pipeline

    return merge_tags_pipeline(args.gbz, args.ri, args.tags_dir, args.output,
                               window=args.window, chunk_runs=args.chunk_runs,
                               engine=args.engine)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="panidx", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-rindex")
    b.add_argument("rl_bwt")
    b.add_argument("-o", "--output", default="-")
    b.add_argument("--format", choices=["encoded", "legacy"], default="encoded")
    b.set_defaults(fn=cmd_build_rindex)

    for name, fn, extra in [("find-mems", cmd_find_mems, True), ("query-tags", cmd_query_tags, False)]:
        q = sub.add_parser(name)
        q.add_argument("ri")
        q.add_argument("tags")
        q.add_argument("reads")
        q.add_argument("--tag-capacity", type=int, default=256,
                       help="device tag-query lanes per MEM/read interval; "
                            "overflowing intervals re-query on the host")
        if extra:
            q.add_argument("min_len", type=int)
            q.add_argument("min_occ", type=int)
            q.add_argument("--mem-capacity", type=int, default=32)
            q.add_argument("--mer-len", type=int, default=-1,
                           help="m-mer seed table size; -1 = auto "
                                "(min(14, min_len-1), the measured serving "
                                "optimum - PERF.md round 3), 0 disables")
            q.add_argument("--long-seed", type=int, default=-1,
                           help="sparse long-seed dictionary window size "
                                "(ops/sparsedict.py): -1 = auto "
                                "(min(min_len-1, 31), the measured optimum: "
                                "2.0x at min_occ=1, 4.9x on the "
                                "aligner-filter row - PERF.md round 5), "
                                "0 = off. Collapses step-1 of every MEM "
                                "call to one stepwise extension when the "
                                "window occurs; built once (~1-2 min) and "
                                "cached next to the index")
            q.add_argument("--no-mer-cache", action="store_true",
                           help="do not persist the seed table next to the index")
            q.add_argument("--batch-size", type=int, default=0,
                           help="device lanes per launch (default 0 = "
                                "measure-and-pick between 4096/8192 on the "
                                "first reads; the optimum is workload-"
                                "dependent, PERF.md)")
            q.add_argument("--mesh", default=None, metavar="DATAxMODEL",
                           help="serve over a (data x model) device mesh, "
                                "e.g. 4x2: reads data-sharded, run table "
                                "model-sharded (rank = one psum over ICI)")
            q.add_argument("--rank-mode", default="checkpoint",
                           choices=["checkpoint", "dense", "ultra", "bucketed"],
                           help="device rank representation (checkpoint: one "
                                "64B gather per rank6 query - the fastest, "
                                "see PERF.md)")
        q.add_argument("--engine", choices=["device", "host", "native"], default="device")
        q.add_argument("--tags-format", default="auto",
                       choices=["auto", "algorithm", "sdsl", "bytecode",
                                "bytecode-compact"],
                       help="tag container format (the on-disk formats carry "
                            "no magic; auto-detection is structural and can "
                            "be overridden for ambiguous payloads)")
        q.set_defaults(fn=fn)

    bs = sub.add_parser("build-sdict")
    bs.add_argument("ri")
    bs.add_argument("-o", "--output", default=None,
                    help="artifact path (default <ri>.sdict<s>.npz - the "
                         "path find-mems --long-seed reads)")
    bs.add_argument("-s", type=int, default=0,
                    help="window length (default min(min_len-1, 31))")
    bs.add_argument("--min-len", type=int, default=20,
                    help="serving min MEM length the dictionary targets")
    bs.add_argument("--min-keep", type=int, default=1)
    bs.add_argument("--engine", choices=["device", "host"], default="device")
    bs.set_defaults(fn=cmd_build_sdict)

    s = sub.add_parser("print-stats")
    s.add_argument("ri")
    s.add_argument("tags", nargs="?")
    s.add_argument("--runtime", action="store_true",
                   help="also report the device flat-table sizes")
    s.set_defaults(fn=cmd_print_stats)

    c = sub.add_parser("convert-tags")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("--compact", action="store_true")
    c.add_argument("--no-compat", dest="compat", action="store_false",
                   help="skip the int_vector header instead of decoding it as data (reference-bug compat is on by default)")
    c.add_argument("--wrapped", action="store_true",
                   help="prefix the output with a self-describing magic + "
                        "format byte (format detection becomes deterministic;"
                        " off by default for byte-parity with the reference)")
    c.set_defaults(fn=cmd_convert_tags)

    t = sub.add_parser("tags-check")
    t.add_argument("tags", nargs="+")
    t.add_argument("--verify-gbz", help="cross-check tag values against a fresh build from this GBZ")
    t.add_argument("--verify-rlbwt", help="the matching rl_bwt for --verify-gbz")
    t.set_defaults(fn=cmd_tags_check)

    et = sub.add_parser("extract-text")
    et.add_argument("gbz")
    et.add_argument("-o", "--output", default="-")
    et.add_argument("--forward-only", action="store_true")
    et.set_defaults(fn=cmd_extract_text)

    bb = sub.add_parser("build-bwt")
    bb.add_argument("text")
    bb.add_argument("output")
    bb.add_argument("--engine", choices=["native", "device", "host"], default="native")
    bb.set_defaults(fn=cmd_build_bwt)

    bt = sub.add_parser("build-tags")
    bt.add_argument("gbz")
    bt.add_argument("rl_bwt")
    bt.add_argument("output")
    bt.add_argument("--k", type=int, default=31)
    bt.add_argument("--stats", action="store_true",
                    help="run the anchored pipeline for coverage statistics")
    bt.add_argument("--stream-sa", action="store_true",
                    help="never materialize the 16 B/row SA: windowed native "
                         "psi walks per row window (O(r + window) memory - "
                         "for imported whole-chromosome shards)")
    bt.add_argument("--sa-window-bytes", type=int, default=2 << 30,
                    help="per-pass SA window budget for --stream-sa")
    bt.set_defaults(fn=cmd_build_tags)

    mt = sub.add_parser("merge-tags")
    mt.add_argument("gbz")
    mt.add_argument("ri")
    mt.add_argument("tags_dir")
    mt.add_argument("output")
    mt.add_argument("--window", type=int, default=1 << 22,
                    help="BWT rows processed per batch (bounds peak memory)")
    mt.add_argument("--chunk-runs", type=int, default=1 << 20,
                    help="input-cursor refill size in runs per tag file "
                         "(the ring-buffer analog, merge_tags.cpp:221-245; "
                         "bounds input-side resident memory)")
    mt.add_argument("--engine", choices=["host", "device"], default="host",
                    help="device: the sharded all_gather scan-merge over the "
                         "device mesh (parallel/merge.py; HBM-resident, one "
                         "collective round) - output identical to host")
    mt.set_defaults(fn=cmd_merge_tags)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except FileNotFoundError as exc:
        print(f"panidx: {exc}", file=sys.stderr)
        return 1
    except ValueError as exc:
        print(f"panidx: invalid input: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
