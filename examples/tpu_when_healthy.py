"""Probe the TPU tunnel and exec a measurement script in a healthy window.

The tunnel has multi-hour rolling outages with ~minutes-long healthy bursts
(CLAUDE.md); measurements launched blind mostly die. This wrapper loops:
1 MB device_put round-trip probe -> if under the threshold, exec the target
script in THIS process (the warm backend handle carries over); else sleep
and retry until the deadline.

Usage: python examples/tpu_when_healthy.py <threshold_s> <total_budget_s>
       <script.py> [args...]
"""

import os
import runpy
import subprocess
import sys
import time

_PROBE = """
import time, numpy as np, jax
t0 = time.time()
x = jax.device_put(np.zeros(1 << 18, np.float32))
np.asarray(x)
print(time.time() - t0)
"""


def probe(threshold: float) -> bool:
    # subprocess + hard timeout: a stalled device_put otherwise hangs THIS
    # process through later healthy windows (observed: 1 MB transfers
    # wedged 25+ min during an outage)
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE],
                           capture_output=True, timeout=max(threshold * 6, 60))
        dt = float(r.stdout.split()[-1])
        print(f"[healthy?] 1MB round-trip {dt:.1f}s (threshold {threshold})",
              file=sys.stderr, flush=True)
        return dt < threshold
    except subprocess.TimeoutExpired:
        print("[healthy?] probe timed out (outage)", file=sys.stderr, flush=True)
        return False
    except Exception as exc:
        print(f"[healthy?] probe failed: {exc}", file=sys.stderr, flush=True)
        return False


def main():
    threshold = float(sys.argv[1])
    budget = float(sys.argv[2])
    script = sys.argv[3]
    deadline = time.time() + budget
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        if probe(threshold):
            print(f"[healthy?] window found (attempt {attempt}); launching "
                  f"{script}", file=sys.stderr, flush=True)
            sys.argv = sys.argv[3:]
            runpy.run_path(script, run_name="__main__")
            return
        time.sleep(45)
    print(f"[healthy?] no healthy window within {budget}s", file=sys.stderr)
    sys.exit(3)


if __name__ == "__main__":
    main()
