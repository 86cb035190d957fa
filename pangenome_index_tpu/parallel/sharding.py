"""Multi-chip sharding for the query engine.

The reference's only distribution mechanisms are per-chromosome index shards
on the filesystem plus OpenMP within a host (SURVEY §2.1). The TPU-native
design replaces them with a 2-D device mesh:

  * ``data`` axis - reads are batch-sharded; each device runs the full MEM
    state machine on its slice (the analog of OpenMP-over-reads,
    find_mems.cpp:96-139).
  * ``model`` axis - the run table itself is sharded by contiguous BWT run
    ranges (the analog of per-chromosome shards, merge_tags.cpp). rank6
    becomes: every model-shard answers locally if it owns the position's run,
    else contributes zeros; one psum over ``model`` combines - exactly one
    shard owns any position, so the sum is exact. Collectives ride ICI.

`shard_rindex` pads the run table to the mesh size with sentinel runs
(run_start = n+1) that can never be a predecessor of a valid position.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.rindex import RIndex
from ..ops.tables import RIndexTables, rindex_to_device


def make_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if devices.size < n_data * n_model:
        raise ValueError(f"need {n_data * n_model} devices, have {devices.size}")
    grid = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def pad_rindex_tables(idx: RIndex, n_shards: int) -> RIndexTables:
    """Device tables with the run dimension padded to a multiple of n_shards
    using sentinel runs (start = n+1, full cumulative counts)."""
    r = idx.n_runs
    pad = (-r) % n_shards
    if pad == 0:
        return rindex_to_device(idx)
    full_cum = idx.cum[-1].copy()
    full_cum[idx.run_sym[-1]] += idx.run_len[-1]
    idx2 = RIndex(
        run_sym=np.concatenate((idx.run_sym, np.zeros(pad, np.int8))),
        run_start=np.concatenate((idx.run_start, np.full(pad, idx.n + 1, np.int64))),
        run_len=np.concatenate((idx.run_len, np.zeros(pad, np.int64))),
        cum=np.concatenate((idx.cum, np.tile(full_cum, (pad, 1)))),
        C=idx.C, n=idx.n, n_seq=idx.n_seq, max_len=idx.max_len,
        samples=np.concatenate((idx.samples, np.zeros(pad, np.int64))),
        last_sorted=np.concatenate((idx.last_sorted, np.full(pad, np.iinfo(np.int64).max // 4, np.int64))),
        last_to_run=np.concatenate((idx.last_to_run, np.zeros(pad, np.int64))),
    )
    return rindex_to_device(idx2)


def shard_tables(t: RIndexTables, mesh: Mesh) -> RIndexTables:
    """Place tables on the mesh: run-dimension arrays sharded over 'model',
    small tables replicated."""
    run_sharded = NamedSharding(mesh, P("model"))
    run_sharded2 = NamedSharding(mesh, P("model", None))
    repl = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    return RIndexTables(
        run_sym=put(t.run_sym, run_sharded),
        run_start=put(t.run_start, run_sharded),
        cum=put(t.cum, run_sharded2),
        C=put(t.C, repl),
        samples=put(t.samples, repl),
        last_sorted=put(t.last_sorted, repl),
        last_to_run=put(t.last_to_run, repl),
        n=put(t.n, repl),
        n_seq=put(t.n_seq, repl),
        max_len=put(t.max_len, repl),
    )


def distributed_rank6(local_run_start, local_run_sym, local_cum, pos, axis="model"):
    """rank6 with the run table sharded over `axis` (call inside shard_map).

    local_run_start: [r_local] this shard's contiguous run slice;
    pos: [B] (replicated over `axis`). Exactly one shard's slice contains the
    predecessor run of each position; the others contribute zeros and a psum
    combines.
    """
    j = jnp.searchsorted(local_run_start, pos, side="right") - 1
    owns = j >= 0
    nxt = jax.lax.ppermute(
        local_run_start[0], axis, [(i, (i - 1) % jax.lax.axis_size(axis)) for i in range(jax.lax.axis_size(axis))]
    )
    is_last = jax.lax.axis_index(axis) == jax.lax.axis_size(axis) - 1
    upper = jnp.where(is_last, jnp.iinfo(pos.dtype).max, nxt)
    owns = owns & (pos < upper)
    jc = jnp.clip(j, 0, local_run_start.shape[0] - 1)
    base = local_cum[jc]
    sym = local_run_sym[jc].astype(jnp.int32)
    onehot = (jnp.arange(6, dtype=jnp.int32)[None, :] == sym[:, None]).astype(base.dtype)
    local = jnp.where(owns[:, None], base + onehot * (pos - local_run_start[jc])[:, None], 0)
    return jax.lax.psum(local, axis)
