"""Batched locate: SA values for BWT intervals.

The reference's locate() walks locateNext sequentially across an interval
(r-index.cpp:1253-1298). Here lanes are intervals: every step advances all
lanes by one locateNext (two searchsorted-free gathers after the predecessor
lookup), emitting into capacity-bounded buffers. Document-array results
(sequence ids) come from dividing by max_len, matching seqId (r-index.hpp:429).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rank import locate_next, run_of
from .tables import RIndexTables


class LocateResult(NamedTuple):
    positions: jax.Array  # [B, capacity] packed (seq, offset) SA values
    count: jax.Array      # [B] number of valid entries
    overflow: jax.Array   # [B]


@functools.partial(jax.jit, static_argnames=("capacity",))
def locate_batch(t: RIndexTables, start: jax.Array, size: jax.Array,
                 capacity: int = 64) -> LocateResult:
    """start/size: [B] BWT intervals. Returns packed SA samples of rows
    start .. start+min(size, capacity)-1 per lane."""
    B = start.shape[0]
    pd = t.pos_dtype

    # first SA value: sample at the head of the run containing `start`, then
    # locateNext up to the in-run offset (locate(), r-index.cpp:1260-1283)
    j = run_of(t, start)
    first = t.samples[j]
    offset_of_first = t.run_start[j]

    def chase(state):
        first, off = state
        return jnp.where(off < start, locate_next(t, first), first), jnp.minimum(off + 1, start)

    def chase_cond(state):
        return (state[1] < start).any()

    first, _ = jax.lax.while_loop(chase_cond, chase, (first, offset_of_first))

    out = jnp.zeros((B, capacity), pd)
    lanes = jnp.arange(B)

    def body(i, state):
        out, cur = state
        valid = i < size
        out = out.at[lanes, i].set(jnp.where(valid, cur, out[lanes, i]))
        cur = jnp.where(valid, locate_next(t, cur), cur)
        return out, cur

    out, _ = jax.lax.fori_loop(0, capacity, body, (out, first))
    n_valid = jnp.minimum(size, capacity)
    return LocateResult(out, n_valid.astype(jnp.int32), size > capacity)
