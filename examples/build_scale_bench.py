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


def main():
    total_mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    n_haps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    base_len = int(total_mbp * 1e6 / n_haps)

    from pangenome_index_tpu import native
    from pangenome_index_tpu.core.tagbuild import build_tags
    from pangenome_index_tpu.formats.rlbwt import rlbwt_from_text
    from pangenome_index_tpu.models.rindex import build_rindex
    from pangenome_index_tpu.utils.synth import synth_graph_gbz

    assert native.available(), "native toolchain required for the scale bench"

    t0 = time.perf_counter()
    gbz, lines = synth_graph_gbz(base_len, n_haps, site_rate=0.002, seed=17)
    t_graph = time.perf_counter() - t0
    n_chars = sum(len(l) for l in lines)
    print(f"[scale] graph+GBWT: {t_graph:.1f}s "
          f"({len(gbz.graph.sequences)} nodes, {gbz.index.sequences} seqs, "
          f"{n_chars/1e6:.0f} Mbp text)", flush=True)

    t0 = time.perf_counter()
    bwt, da, sa_pos, seq_lengths = native.build_bwt_native(lines)
    t_bwt = time.perf_counter() - t0
    print(f"[scale] SA-IS BWT: {t_bwt:.1f}s ({len(bwt)/1e6:.1f}M rows)", flush=True)

    t0 = time.perf_counter()
    rl = rlbwt_from_text(bwt.tobytes())
    idx = build_rindex(rl, _sa_hint=(da, sa_pos, seq_lengths), keep_sa=True)
    t_ri = time.perf_counter() - t0
    print(f"[scale] r-index: {t_ri:.1f}s (r={idx.n_runs}, n/r={idx.n/idx.n_runs:.1f})",
          flush=True)

    t0 = time.perf_counter()
    tags = build_tags(gbz, idx)
    t_tags = time.perf_counter() - t0
    print(f"[scale] tags: {t_tags:.1f}s ({tags.n_runs} runs)", flush=True)

    total = t_graph + t_bwt + t_ri + t_tags
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"[scale] TOTAL text->index+tags: {total:.1f}s for {n_chars/1e6:.0f} Mbp "
          f"({n_chars/total/1e6:.2f} Mbp/s, peak RSS {peak_gb:.1f} GB)", flush=True)


if __name__ == "__main__":
    main()
