"""Ring flash attention: exact attention with KV (and Q) sharded over a
mesh axis — TPU-native sequence/context parallelism.

The reference has no sequence parallelism at all (SURVEY §5.7: absent);
this is the TPU-native seam the blockwise flash kernel was designed to
keep open.  Long-context Anima video training (T'>2 clips are 12k+
self-attention tokens) shards the token axis over the mesh: each device
holds its Q/K/V shard, K/V shards rotate around the ring via
``lax.ppermute`` (ICI neighbor hops — no all-gather, no O(S^2) or O(S)
replicated memory), and each hop's partial attention merges exactly
through the kernel's log-sum-exp statistics.

Why a custom VJP: the flash kernel's public custom_vjp deliberately
ignores the lse cotangent (flash_attention.py: "callers must not feed it
into the loss"), but the ring merge *does* consume lse, so differentiating
through the merge would silently drop that gradient path.  Instead we
implement the standard ring backward: with the GLOBAL (out, lse) saved
from the forward, each (q_i, kv_j) pair's exact (dq, dk, dv) contribution
is computable locally by the existing backward kernels
(``flash_bwd_stats``) — dq accumulates in place while (dk, dv) travel the
ring with their kv shard and arrive home fully accumulated.

Use inside ``shard_map`` with the token axis sharded over ``axis_name``:

    out = ring_flash_attention(q, k, v, axis_name="sp", axis_size=8)

q, k, v: (B, S_local, H, D).  S_global = S_local * axis_size.  Exactness
is pinned against single-device attention in tests/test_ring_attention.py
(forward AND gradients).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from .flash_attention import flash_bwd_stats, flash_fwd_stats


class SPRingConfig(NamedTuple):
    """Sequence-parallel attention config, passed where a plain
    ``attn_impl`` string is otherwise accepted (models/anima/dit.py).

    ``base_impl`` is the local implementation used for the attention
    sites that need no communication under SP (cross-attention to the
    replicated 512-token context, the LLM adapter)."""
    mesh: Any
    axis_name: str
    axis_size: int
    base_impl: str = "flash"


def _shard_map(fn, mesh, in_specs, out_specs):
    from jax import shard_map as _sm
    try:
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except TypeError:  # older jax spells the flag check_rep
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def sp_ring_attention(q, k, v, sp: SPRingConfig, *,
                      scale: float | None = None):
    """Ring attention as a shard_map island over ``sp.axis_name``.

    q, k, v: GLOBAL (B, S, H, D) values inside a jit over ``sp.mesh``;
    the island reshards them to token-sharded layout (GSPMD inserts the
    transfers if they aren't already laid out that way)."""
    spec = P(None, sp.axis_name)
    fn = functools.partial(ring_flash_attention, axis_name=sp.axis_name,
                           axis_size=sp.axis_size, scale=scale)
    return _shard_map(fn, sp.mesh, (spec, spec, spec), spec)(q, k, v)


def _ring_perm(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def _merge(o_acc, l_acc, o_new, l_new):
    """Exact pairwise merge of two attention partials via their lse."""
    m = jnp.maximum(l_acc, l_new)
    w_acc = jnp.exp(l_acc - m)
    w_new = jnp.exp(l_new - m)
    denom = w_acc + w_new
    o = (o_acc * w_acc[..., None] + o_new.astype(jnp.float32)
         * w_new[..., None]) / denom[..., None]
    return o, m + jnp.log(denom)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ring_flash_attention(q, k, v, axis_name: str, axis_size: int,
                         scale: float | None = None):
    out, _ = _ring_forward(q, k, v, axis_name, axis_size, scale)
    return out


def _ring_forward(q, k, v, axis_name, axis_size, scale):
    perm = _ring_perm(axis_size)
    out, lse = flash_fwd_stats(q, k, v, scale=scale)
    o_acc = out.astype(jnp.float32)
    l_acc = lse
    kk, vv = k, v
    for _ in range(axis_size - 1):
        kk = lax.ppermute(kk, axis_name, perm)
        vv = lax.ppermute(vv, axis_name, perm)
        o_s, l_s = flash_fwd_stats(q, kk, vv, scale=scale)
        o_acc, l_acc = _merge(o_acc, l_acc, o_s, l_s)
    return o_acc.astype(q.dtype), l_acc


def _ring_fwd(q, k, v, axis_name, axis_size, scale):
    out, lse = _ring_forward(q, k, v, axis_name, axis_size, scale)
    return out, (q, k, v, out, lse)


def _ring_bwd(axis_name, axis_size, scale, res, do):
    q, k, v, out, lse = res
    perm = _ring_perm(axis_size)
    kk, vv = k, v
    dq = None
    dk_ring = jnp.zeros(k.shape, jnp.float32)
    dv_ring = jnp.zeros(v.shape, jnp.float32)
    for step in range(axis_size):
        if step:
            # dk/dv accumulators travel WITH their kv shard: each device
            # adds its q rows' contribution as the shard passes through
            kk = lax.ppermute(kk, axis_name, perm)
            vv = lax.ppermute(vv, axis_name, perm)
            dk_ring = lax.ppermute(dk_ring, axis_name, perm)
            dv_ring = lax.ppermute(dv_ring, axis_name, perm)
        dq_s, dk_s, dv_s = flash_bwd_stats(q, kk, vv, out, lse, do,
                                           scale=scale)
        dq = dq_s.astype(jnp.float32) if dq is None else dq + dq_s
        dk_ring = dk_ring + dk_s
        dv_ring = dv_ring + dv_s
    # after axis_size-1 rotations each kv shard sits one hop short of
    # home; one more hop delivers the fully-accumulated (dk, dv)
    dk_ring = lax.ppermute(dk_ring, axis_name, perm)
    dv_ring = lax.ppermute(dv_ring, axis_name, perm)
    return dq.astype(q.dtype), dk_ring.astype(k.dtype), dv_ring.astype(v.dtype)


ring_flash_attention.defvjp(_ring_fwd, _ring_bwd)
