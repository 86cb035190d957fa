"""Build-plane scale benchmark: text -> r-index + tags wall time.

Measures every phase of the chromosome-scale build pipeline on a synthetic
pangenome GRAPH (shared-variant-site bubbles, utils/synth.synth_graph_gbz):

  1. graph + GBWT construction (core/gbwt_build, suffix-rank array program
     + native record encoder)
  2. multi-string BWT via native SA-IS (src/cpp/sais.cpp)
  3. r-index construction with full SA (models/rindex)
  4. tag-array build (batched record decode + native path walk + one SA
     gather; core/tagbuild + formats/gbwt_table)

Usage: python examples/build_scale_bench.py <total_mbp> [n_haps]
The reference's equivalent is `build_rindex` + `build_tags`
(src/r-index.cpp:1025-1094, src/build_tags.cpp:51-196) which it deploys
per-chromosome; one shard here = one chromosome there.
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _phase_logger():
    t_prev = time.perf_counter()

    def log(name, detail=""):
        nonlocal t_prev
        now = time.perf_counter()
        peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
        print(f"[scale] {name}: {now - t_prev:.1f}s"
              f"{' (' + detail + ')' if detail else ''}"
              f" | running-peak RSS {peak_gb:.1f} GB", flush=True)
        t_prev = time.perf_counter()
        return now

    return log


def main():
    total_mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    n_haps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    base_len = int(total_mbp * 1e6 / n_haps)
    workdir = sys.argv[3] if len(sys.argv) > 3 else None

    import numpy as np

    from pangenome_index_tpu import native
    from pangenome_index_tpu.core.tagbuild import build_tags
    from pangenome_index_tpu.formats.rlbwt import rlbwt_from_text
    from pangenome_index_tpu.models.rindex import build_rindex
    from pangenome_index_tpu.utils.synth import synth_graph_gbz

    assert native.available(), "native toolchain required for the scale bench"
    log = _phase_logger()
    t_start = time.perf_counter()

    gbz, lines = synth_graph_gbz(base_len, n_haps, site_rate=0.002, seed=17)
    n_chars = sum(len(l) for l in lines)
    log("graph+GBWT", f"{len(gbz.graph.sequences)} nodes, "
        f"{gbz.index.sequences} seqs, {n_chars/1e6:.0f} Mbp text")

    bwt, da, sa_pos, seq_lengths = native.build_bwt_native(lines)
    log("SA-IS BWT", f"{len(bwt)/1e6:.1f}M rows")
    del lines

    rl = rlbwt_from_text(bwt.tobytes())
    idx = build_rindex(rl, _sa_hint=(da, sa_pos, seq_lengths), keep_sa=True)
    log("r-index", f"r={idx.n_runs}, n/r={idx.n/idx.n_runs:.1f}")

    tags = build_tags(gbz, idx)
    log("tags", f"{tags.n_runs} runs")

    total = time.perf_counter() - t_start
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"[scale] TOTAL text->index+tags: {total:.1f}s for {n_chars/1e6:.0f} Mbp "
          f"({n_chars/total/1e6:.2f} Mbp/s, peak RSS {peak_gb:.1f} GB "
          f"= {peak_gb*1e9/n_chars:.1f} B/char)", flush=True)

    if workdir:
        # the serving-artifact phases: encoded .ri serialize + reload (the
        # genome-scale ingest path, formats/ri.py vectorized decode) and the
        # checkpoint-table build (ops/tables.build_ckpt_rows, chunked)
        from pangenome_index_tpu.formats import ri as rifmt
        from pangenome_index_tpu.ops.tables import build_ckpt_rows

        log2 = _phase_logger()
        path = os.path.join(workdir, f"scale_{int(total_mbp)}m_{n_haps}h.ri")
        data = rifmt.serialize_encoded(idx)
        with open(path, "wb") as fh:
            fh.write(data)
        log2("serialize_encoded .ri", f"{len(data)/1e6:.0f} MB")
        idx2 = rifmt.load_file(path)
        t_load = log2(".ri load (vectorized)",
                      f"{idx2.n_runs/1e6:.1f}M runs")
        assert np.array_equal(idx2.run_len, idx.run_len)
        rows, _ = build_ckpt_rows(idx2, 64)
        log2("ckpt table build (chunked)",
             f"{rows.nbytes/1e6:.0f} MB = {rows.nbytes/idx.n:.2f} B/pos")


if __name__ == "__main__":
    main()
