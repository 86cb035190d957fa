"""Batched FMD bidirectional extension.

backward_extend (reference: src/r-index.cpp:1395-1428) per lane:
    delta = rank6(k+s) - rank6(k)
    k'   += sum_d kp_weight[c, d] * delta[d]
    s'    = delta[c];  k' stays, fail -> (0,0,0)
    k'new = rank(k)[c] + C[c]

forward_extend is the swap+complement trick (r-index.cpp:1500-1509); we fold
it in as a flag so a single fused primitive serves both directions - one
kernel, two rank6 gathers per lane per step.
"""

from __future__ import annotations

import jax.numpy as jnp

from .rank import rank6
from .tables import RIndexTables


def extend(t: RIndexTables, k, kp, s, code, forward=None, rank6_fn=None):
    """Batched bidirectional extension.

    k, kp, s, code: [B]. forward: bool [B] or None (all backward).
    rank6_fn(pos)->[B,6] overrides the rank provider (used by the
    model-sharded distributed engine, parallel/engine.py).
    Returns (k, kp, s) after extension; failed lanes get (0, 0, 0).
    """
    if forward is None:
        forward = jnp.zeros(k.shape, dtype=bool)
    if rank6_fn is None:
        rank6_fn = lambda pos: rank6(t, pos)
    code = code.astype(jnp.int32)
    ext_code = jnp.where(forward, t.comp[code], code)
    bk = jnp.where(forward, kp, k)
    bkp = jnp.where(forward, k, kp)

    # one fused double-width rank batch (halves kernel launches per step)
    both = rank6_fn(jnp.concatenate((bk, bk + s)))
    r_k = both[: k.shape[0]]    # [B, 6]
    r_ks = both[k.shape[0] :]   # [B, 6]
    delta = r_ks - r_k

    w = t.kp_weight[ext_code]   # [B, 6]
    nkp = bkp + (w * delta).sum(axis=1)

    lane = jnp.arange(k.shape[0])
    d_c = delta[lane, ext_code]
    nk = r_k[lane, ext_code] + t.C[ext_code]
    ns = d_c

    ok = ns > 0
    nk = jnp.where(ok, nk, 0)
    nkp = jnp.where(ok, nkp, 0)
    ns = jnp.where(ok, ns, 0)

    # swap back for forward lanes
    out_k = jnp.where(forward, nkp, nk)
    out_kp = jnp.where(forward, nk, nkp)
    return out_k, out_kp, ns
