"""Pallas TPU prototype: scalar-prefetch gather for the rank hot path.

The LF/extension inner loop is bound by XLA's gather issue rate (~78M rows/s
on v5e, see PERF.md). This kernel explores the alternative the hardware
offers: `PrefetchScalarGridSpec` lets a BlockSpec's index_map read the query
indices before the body runs, so the pipeline DMAs exactly the 32-byte run
records the batch needs - one grid step per group of queries, with Mosaic's
automatic double buffering overlapping the DMAs.

Measured status (v5e, documented in PERF.md): per-row DMAs through the grid
pipeline cannot beat XLA's native gather for 4-32 byte rows - the DMA issue
overhead exceeds the gather cost. The kernel is kept as (a) a working
template for the round-2 two-level VMEM-cached design (sampled tables in
VMEM + contiguous block DMAs), and (b) the regression harness proving the
Pallas path stays correct (tests/test_pallas_rank.py runs it in interpreter
mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rows gathered per grid step; each step DMAs GROUP rows found via the
#: prefetched indices
GROUP = 8


def _kernel(idx_ref, rows_ref, out_ref):
    # rows_ref: [GROUP, 8] block selected by the index_map from HBM
    out_ref[...] = rows_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(rec: jax.Array, idx: jax.Array, interpret: bool = False):
    """rec: [r, 8] packed run records; idx: [B] (B % GROUP == 0).

    Returns rec[idx] ([B, 8]) via scalar-prefetch DMA groups.
    """
    B = idx.shape[0]
    assert B % GROUP == 0
    grid = (B // GROUP,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (GROUP, 8),
                # the index map may read the prefetched scalars: block g
                # starts at row idx[g * GROUP] - we pre-sort and pad so each
                # group's rows are contiguous (see caller contract below).
                lambda g, idx_ref: (idx_ref[g * GROUP] // GROUP, 0),
            ),
        ],
        out_specs=pl.BlockSpec((GROUP, 8), lambda g, idx_ref: (g, 0)),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, 8), rec.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, rec)


def rank6_pallas(rec: jax.Array, pos_to_run: jax.Array, pos: jax.Array,
                 interpret: bool = False):
    """Dense-mode rank6 with the record fetch done by the Pallas kernel.

    Caller contract for the prototype: queries are grouped by aligned
    GROUP-row windows - we fetch the window containing each query's run and
    select the row inside it, which is exact because the kernel fetches
    rec[align(j) : align(j)+GROUP] and we pick j - align(j).
    """
    j = pos_to_run[pos]
    aligned = (j // GROUP) * GROUP
    # fetch each query's aligned window; one window per query
    B = pos.shape[0]
    win_idx = jnp.repeat(aligned, GROUP) + jnp.tile(jnp.arange(GROUP, dtype=j.dtype), B)
    rows = gather_rows_pallas(rec, win_idx, interpret=interpret)  # [B*GROUP, 8]
    rows = rows.reshape(B, GROUP, 8)
    sel = rows[jnp.arange(B), j - aligned]  # [B, 8]
    sym = sel[:, 1].astype(jnp.int32)
    onehot = (jnp.arange(6, dtype=jnp.int32)[None, :] == sym[:, None]).astype(sel.dtype)
    return sel[:, 2:8] + onehot * (pos - sel[:, 0])[:, None]
