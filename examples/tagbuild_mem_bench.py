"""Tag-build memory: resident-SA vs streamed (VERDICT r4 item 5 evidence).

Two modes over the same synthetic depth-90 graph (shared variant sites):

  resident  text -> native SA-IS -> r-index w/ full per-row SA -> build_tags
            (the round-3 pipeline: the SA arrays are 16 B/row)
  streamed  .rl_bwt import -> r-index via the native psi walk (keep_sa=False,
            O(r) memory) -> build_tags with windowed walk passes
            (PsiSAWindows) - the whole-chromosome-shard memory mode

Each mode runs in a fresh subprocess and reports wall time + VmHWM (ru_maxrss
survives fork, import_bench.py lesson). Byte-equality of the two outputs is
asserted. Usage:

    python examples/tagbuild_mem_bench.py [total_mbp] [n_haps] [sa_window_mb]
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vmhwm_gb():
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1e6
    return 0.0


def child(mode, total_mbp, n_haps, sa_window_mb, workdir):
    import hashlib

    import numpy as np

    from pangenome_index_tpu import native
    from pangenome_index_tpu.core.tagbuild import build_tags
    from pangenome_index_tpu.formats import tags as tagfmt
    from pangenome_index_tpu.formats.rlbwt import read_rlbwt, rlbwt_from_text
    from pangenome_index_tpu.models.rindex import build_rindex
    from pangenome_index_tpu.utils.synth import synth_graph_gbz

    base_len = int(total_mbp * 1e6 / n_haps)
    gbz, lines = synth_graph_gbz(base_len, n_haps, site_rate=0.002, seed=17)
    rl_path = os.path.join(workdir, f"tagmem_{int(total_mbp)}m.rl_bwt")

    t0 = time.perf_counter()
    if mode == "resident":
        bwt, da, sa_pos, seq_lengths = native.build_bwt_native(lines)
        del lines
        idx = build_rindex(rlbwt_from_text(bwt.tobytes()),
                           _sa_hint=(da, sa_pos, seq_lengths), keep_sa=True)
        del bwt, da, sa_pos
        t1 = time.perf_counter()
        tags = build_tags(gbz, idx)
    else:
        del lines
        idx = build_rindex(read_rlbwt(rl_path), keep_sa=False)
        t1 = time.perf_counter()
        # PANIDX_TAGMEM_FLAT0=1 forces the searchsorted per-char mode (the
        # configuration a 22 Gbp shard would use: no 8 B/char flat array)
        cap = 0 if os.environ.get("PANIDX_TAGMEM_FLAT0") else 8 << 30
        tags = build_tags(gbz, idx, sa_window_bytes=sa_window_mb << 20,
                          flat_bytes_cap=cap)
    t2 = time.perf_counter()
    data = tagfmt.write_algorithm(tags)
    digest = hashlib.sha1(data).hexdigest()[:16]
    print(f"[tagmem {mode}] index {t1-t0:.1f}s, tags {t2-t1:.1f}s, "
          f"runs={tags.n_runs}, sha1={digest}, VmHWM={vmhwm_gb():.2f} GB",
          flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], float(sys.argv[3]), int(sys.argv[4]),
              int(sys.argv[5]), sys.argv[6])
        return
    total_mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 600.0
    n_haps = int(sys.argv[2]) if len(sys.argv) > 2 else 90
    sa_window_mb = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    workdir = "/tmp/tagmem"
    os.makedirs(workdir, exist_ok=True)
    # rl_bwt prepared once by a throwaway child (so neither measured child
    # pays SA-IS twice); then one child per mode
    prep = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--prep",
         str(total_mbp), str(n_haps), workdir])
    if prep.returncode:
        sys.exit(prep.returncode)
    for mode in ("streamed", "resident"):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode,
             str(total_mbp), str(n_haps), str(sa_window_mb), workdir])
        if r.returncode:
            sys.exit(r.returncode)


def prep(total_mbp, n_haps, workdir):
    from pangenome_index_tpu import native
    from pangenome_index_tpu.formats import rlbwt as rlfmt
    from pangenome_index_tpu.utils.synth import synth_graph_gbz

    base_len = int(total_mbp * 1e6 / n_haps)
    rl_path = os.path.join(workdir, f"tagmem_{int(total_mbp)}m.rl_bwt")
    if os.path.exists(rl_path):
        return
    _, lines = synth_graph_gbz(base_len, n_haps, site_rate=0.002, seed=17)
    bwt, *_ = native.build_bwt_native(lines)
    rlfmt.write_rlbwt(rl_path + ".tmp", rlfmt.rlbwt_from_text(bwt.tobytes()))
    os.replace(rl_path + ".tmp", rl_path)
    print(f"[tagmem prep] {rl_path} "
          f"({os.path.getsize(rl_path)/1e6:.0f} MB)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--prep":
        prep(float(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        main()
