"""`.rl_bwt` import benchmark: the whole-genome entry point, measured.

The reference's deployment builds BWTs of deep repetitive text with grlBWT
and imports them via the FastLocate constructor's per-sequence psi walk
(src/r-index.cpp:1025-1094). Our equivalent is `build_rindex(read_rlbwt(..))`;
round 3 moved its walk to native code recording samples at run boundaries
only (src/cpp/psi_walk.cpp), making import memory O(r) instead of ~25 B/char.

This harness measures that path in ISOLATION: the parent synthesizes a
depth-N pangenome text, SA-IS's it, and writes the .rl_bwt plus a samples
fingerprint; a fresh subprocess then imports the .rl_bwt and reports wall
time + peak RSS + fingerprint equality.

Usage: python examples/import_bench.py <total_mbp> [n_haps] [--both]
  --both additionally times the numpy fallback walk (PANIDX_NO_NATIVE_WALK=1).
"""

import json
import os
import resource
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = """
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
from pangenome_index_tpu.formats.rlbwt import read_rlbwt
from pangenome_index_tpu.models.rindex import build_rindex
t0 = time.perf_counter()
rl = read_rlbwt(%(path)r)
t1 = time.perf_counter()
idx = build_rindex(rl)
t2 = time.perf_counter()
import hashlib
fp = hashlib.sha256(idx.samples.tobytes() + idx.last_sorted.tobytes()
                    + idx.last_to_run.tobytes()).hexdigest()
# VmHWM, NOT ru_maxrss: the latter survives fork+exec on Linux, so a child
# of a big-RSS parent would report the parent's peak
hwm_kb = int([l for l in open("/proc/self/status") if "VmHWM" in l][0].split()[1])
print(json.dumps({
    "read_s": round(t1 - t0, 1), "walk_s": round(t2 - t1, 1),
    "peak_rss_gb": round(hwm_kb / 1e6, 2),
    "r": idx.n_runs, "n": idx.n, "fingerprint": fp,
}))
"""


def main():
    total_mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    n_haps = int(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("-") else 90
    both = "--both" in sys.argv

    import hashlib

    import numpy as np

    from pangenome_index_tpu import native
    from pangenome_index_tpu.formats.rlbwt import rlbwt_from_text, write_rlbwt
    from pangenome_index_tpu.models.rindex import build_rindex
    from pangenome_index_tpu.utils.synth import synth_graph_gbz

    base_len = int(total_mbp * 1e6 / n_haps)
    t0 = time.perf_counter()
    gbz, lines = synth_graph_gbz(base_len, n_haps, site_rate=0.002, seed=17)
    del gbz
    bwt, da, sa_pos, seq_lengths = native.build_bwt_native(lines)
    n_chars = len(bwt)
    del lines
    rl = rlbwt_from_text(bwt.tobytes())
    del bwt
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "import_bench.rl_bwt")
        write_rlbwt(path, rl)
        # ground truth from the SA-hint build (no psi walk at all)
        ref_idx = build_rindex(rl, _sa_hint=(da, sa_pos, seq_lengths))
        ref_fp = hashlib.sha256(
            ref_idx.samples.tobytes() + ref_idx.last_sorted.tobytes()
            + ref_idx.last_to_run.tobytes()).hexdigest()
        print(f"[import] setup {time.perf_counter()-t0:.0f}s: {n_chars/1e6:.0f} Mbp, "
              f"r={ref_idx.n_runs/1e6:.2f}M (n/r={ref_idx.n/ref_idx.n_runs:.1f}), "
              f"rl_bwt {os.path.getsize(path)/1e6:.0f} MB", flush=True)
        del rl, ref_idx, da, sa_pos

        variants = [("native-walk", {})]
        if both:
            variants.append(("numpy-walk", {"PANIDX_NO_NATIVE_WALK": "1"}))
        for name, extra_env in variants:
            env = dict(os.environ, **extra_env)
            src = CHILD % {"repo": REPO, "path": path}
            t = time.perf_counter()
            out = subprocess.run([sys.executable, "-c", src], env=env,
                                 capture_output=True, text=True)
            wall = time.perf_counter() - t
            if out.returncode != 0:
                print(f"[import] {name} FAILED:\n{out.stderr[-2000:]}")
                continue
            res = json.loads(out.stdout.strip().splitlines()[-1])
            ok = "samples-identical" if res.pop("fingerprint") == ref_fp else "MISMATCH"
            print(f"[import] {name}: subprocess {wall:.0f}s "
                  f"(read {res['read_s']}s + walk {res['walk_s']}s), "
                  f"peak {res['peak_rss_gb']} GB = "
                  f"{res['peak_rss_gb']*1e9/n_chars:.1f} B/char, {ok}", flush=True)


if __name__ == "__main__":
    main()
