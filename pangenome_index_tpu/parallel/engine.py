"""Distributed query engine: data-parallel reads x model-parallel index.

The full serving step (MEM finding over a read batch + tag lookup + global
stats) jitted over a ('data', 'model') mesh:

* reads are sharded over 'data' (each device slice runs its own MEM lanes)
* the r-index run table is sharded over 'model' by contiguous run ranges;
  every rank query inside the MEM state machine resolves with one psum over
  'model' (see parallel/sharding.py:distributed_rank6)
* per-batch statistics (total MEMs) reduce with a psum over 'data'

This is the TPU-native replacement for the reference's process-per-chromosome
+ filesystem sharding (SURVEY §2.1 items 4-5): the index shards live in HBM
across the mesh and the "merge" is a collective, not a file protocol.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.mems import MemResult, find_mems_impl
from ..ops.tables import RIndexTables, TagTables
from ..ops.tagquery import TagQueryResult, query_tags_batch
from .sharding import distributed_rank6

_RUN_SPECS = RIndexTables(
    run_sym=P("model"), run_start=P("model"), cum=P("model", None),
    C=P(), samples=P(), last_sorted=P(), last_to_run=P(),
    n=P(), n_seq=P(), max_len=P(),
)


def make_distributed_mem_step(mesh: Mesh, capacity: int = 16):
    """Returns a jitted step: (tables, codes, lengths, min_len, min_occ)
    -> (MemResult sharded over 'data', total MEM count replicated)."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_RUN_SPECS, P("data", None), P("data"), P(), P()),
        out_specs=(jax.tree.map(lambda _: P("data"), MemResult(*(0,) * 6)), P()),
        check_vma=False,
    )
    def step(t_local: RIndexTables, codes, lengths, min_len, min_occ):
        rank6_fn = lambda pos: distributed_rank6(
            t_local.run_start, t_local.run_sym, t_local.cum, pos, axis="model"
        )
        res = find_mems_impl(t_local, codes, lengths, min_len, min_occ,
                             capacity=capacity, rank6_fn=rank6_fn)
        total = jax.lax.psum(res.count.sum(), "data")
        return res, total

    return jax.jit(step, static_argnames=())


def make_distributed_serving_step(mesh: Mesh, capacity: int = 16,
                                  tag_capacity: int = 32):
    """The FULL serving step over the mesh: MEM finding (model-sharded rank
    via psum) followed by tag lookups for every found MEM (tag tables
    replicated; find_mems.cpp:96-139 semantics). Outputs are data-sharded;
    the total MEM count reduces over 'data'."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(_RUN_SPECS, jax.tree.map(lambda _: P(), TagTables(0, 0, 0)),
                  P("data", None), P("data"), P(), P()),
        out_specs=(jax.tree.map(lambda _: P("data"), MemResult(*(0,) * 6)),
                   jax.tree.map(lambda _: P("data"), TagQueryResult(*(0,) * 4)),
                   P()),
        check_vma=False,
    )
    def step(t_local, tt, codes, lengths, min_len, min_occ):
        rank6_fn = lambda pos: distributed_rank6(
            t_local.run_start, t_local.run_sym, t_local.cum, pos, axis="model"
        )
        res = find_mems_impl(t_local, codes, lengths, min_len, min_occ,
                             capacity=capacity, rank6_fn=rank6_fn)
        B, M = res.bwt_start.shape
        starts = res.bwt_start.reshape(B * M)
        ends = (res.bwt_start + res.size - 1).reshape(B * M)
        valid = (jnp.arange(M)[None, :] < res.count[:, None]).reshape(B * M)
        starts = jnp.where(valid, starts, 0)
        ends = jnp.where(valid, ends, 0)
        tq = query_tags_batch(tt, starts, ends, capacity=tag_capacity)
        tq = TagQueryResult(
            positions=tq.positions.reshape(B, M * tag_capacity),
            n_unique=jnp.where(valid, tq.n_unique, 0).reshape(B, M),
            n_runs=jnp.where(valid, tq.n_runs, 0).reshape(B, M),
            overflow=(tq.overflow & valid).reshape(B, M),
        )
        total = jax.lax.psum(res.count.sum(), "data")
        return res, tq, total

    return jax.jit(step)
