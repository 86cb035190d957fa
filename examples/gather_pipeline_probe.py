"""Gather issue-rate probe: XLA native gather vs Pallas manual DMA pipelines.

Round-6 queue item 1 (PERF.md): rank6 is one 64 B row gather per query and
the serving loop sits at the XLA gather issue rate (~78M rows/s on v5e,
~0.6% of line bandwidth). This probe measures, on the real chip:

  1. xla_gather: jitted T[idx] for random idx - the engine's current path.
  2. pallas_dma_K: one kernel invocation, fori over B rows, K async row
     copies in flight (HBM -> VMEM out), indices scalar-prefetched. If
     per-DMA issue cost < gather cost, deeper K should win.
  3. pallas_dma_G: same but each DMA moves G CONSECUTIVE rows (G*64 B) -
     calibrates DMA issue overhead vs bandwidth (rows/s scaling with G
     tells whether small-row DMAs are issue-bound).

Each timing is a host fetch of a reduction (jax.block_until_ready is a
no-op under the axon backend). Prints one JSON line per config.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 312_500   # ~20 Mbp ckpt table: [R, 16] int32 = 20 MB
W = 16


def timed(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(out)  # warm + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


@jax.jit
def xla_gather(T, idx):
    return T[idx].sum(axis=0)


ITERS = 64


@jax.jit
def xla_gather_loop(T, idx):
    """ITERS dependent gathers in ONE program: each iteration's indices are
    a hash of the previous gather's values, so nothing hoists and the
    dispatch latency (which dominates single-gather timings through the
    tunnel - ~5 ms floor) amortizes away. This is the serving engine's
    actual regime (hundreds of loop iterations per dispatch)."""
    R = T.shape[0]

    def body(i, carry):
        idx, acc = carry
        rows = T[idx]
        acc = acc + rows[:, 0]
        mixed = (rows[:, 0] ^ (idx * 40503)) + i  # int32-safe hash mix
        idx = jnp.remainder(mixed, R)             # non-negative for R > 0
        return idx, acc

    idx, acc = jax.lax.fori_loop(0, ITERS, body,
                                 (idx, jnp.zeros_like(idx)))
    return acc.sum()


def make_pallas_rowdma(K: int, G: int = 1):
    """B//G DMAs, each G rows, K in flight; returns rows [B, W] in VMEM."""

    def kernel(idx_ref, T_hbm, out_vmem, sems):
        nd = out_vmem.shape[0] // G

        def start(j):
            row = idx_ref[j * G]
            pltpu.make_async_copy(
                T_hbm.at[pl.ds(row, G), :],
                out_vmem.at[pl.ds(j * G, G), :],
                sems.at[j % K],
            ).start()

        def wait(j):
            row = idx_ref[j * G]
            pltpu.make_async_copy(
                T_hbm.at[pl.ds(row, G), :],
                out_vmem.at[pl.ds(j * G, G), :],
                sems.at[j % K],
            ).wait()

        def body(j, _):
            wait(j)

            @pl.when(j + K < nd)
            def _():
                start(j + K)

            return 0

        for j0 in range(K):  # prime the pipeline (nd is static)
            if j0 < nd:
                start(j0)
        jax.lax.fori_loop(0, nd, body, 0)

    @functools.partial(jax.jit, static_argnames=())
    def run(T, idx):
        B = idx.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
        )
        rows = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
            grid_spec=grid_spec,
            interpret=bool(int(os.environ.get("PROBE_INTERPRET", "0"))),
        )(idx, T)
        return rows.sum(axis=0)

    return run


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)
    T = jnp.asarray(rng.integers(0, 1 << 20, (R, W)).astype(np.int32))

    for B in (4096, 16384, 65536, 262144):
        idx = jnp.asarray(rng.integers(0, R, B).astype(np.int32))
        dt = timed(xla_gather, T, idx)
        print(json.dumps({"kind": "xla_gather", "B": B,
                          "rows_per_s": round(B / dt / 1e6, 1),
                          "us": round(dt * 1e6, 1)}), flush=True)
    for B in (4096, 16384, 65536, 262144):
        idx = jnp.asarray(rng.integers(0, R, B).astype(np.int32))
        dt = timed(xla_gather_loop, T, idx)
        print(json.dumps({"kind": "xla_gather_loop", "B": B, "iters": ITERS,
                          "rows_per_s": round(B * ITERS / dt / 1e6, 1),
                          "us_per_iter": round(dt / ITERS * 1e6, 1)}),
              flush=True)

    for K in (4, 16, 64):
        for B in (16384, 65536):
            idx = jnp.asarray(rng.integers(0, R, B).astype(np.int32))
            try:
                fn = make_pallas_rowdma(K)
                dt = timed(fn, T, idx)
                print(json.dumps({"kind": f"pallas_dma_K{K}", "B": B,
                                  "rows_per_s": round(B / dt / 1e6, 1),
                                  "us": round(dt * 1e6, 1)}), flush=True)
            except Exception as exc:
                print(json.dumps({"kind": f"pallas_dma_K{K}", "B": B,
                                  "error": f"{type(exc).__name__}: {exc}"[:300]}),
                      flush=True)

    # grouped-DMA calibration: G consecutive rows per descriptor
    for G in (8, 64):
        B = 65536
        # group-aligned random starts so each DMA stays in range
        idx = jnp.asarray((rng.integers(0, (R - G) // G, B // G) * G)
                          .repeat(G).astype(np.int32))
        try:
            fn = make_pallas_rowdma(16, G)
            dt = timed(fn, T, idx)
            print(json.dumps({"kind": f"pallas_dma_G{G}_K16", "B": B,
                              "rows_per_s": round(B / dt / 1e6, 1),
                              "us": round(dt * 1e6, 1)}), flush=True)
        except Exception as exc:
            print(json.dumps({"kind": f"pallas_dma_G{G}_K16", "B": B,
                              "error": f"{type(exc).__name__}: {exc}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
