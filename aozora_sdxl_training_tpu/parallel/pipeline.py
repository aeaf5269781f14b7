"""Pipeline parallelism (GPipe) for the Anima DiT block stack.

The reference has no parallelism of any kind (SURVEY.md §2.9/§5.8); the
rebuild's existing axes are dp (batch / ZeRO), tp (Megatron attention
sharding) and sp (ring-attention sequence parallelism).  This module adds
the fourth classic axis: the 28 identical DiT blocks are split into
``pp`` contiguous stages, one per rank along a ``pp`` mesh axis, and
microbatches stream through the stage ring GPipe-style.

Design (TPU-idiomatic, no NCCL/MPI analogue):

* block parameters are **stage-stacked**: every ``blocks.{i}.<suffix>``
  leaf becomes one ``[num_blocks, ...]`` array sharded ``P("pp")`` on the
  stage axis, so each rank physically holds only its own blocks.
* the schedule is a single ``lax.scan`` over ``M + pp - 1`` ticks inside
  ``shard_map``; activations hop ranks via non-cyclic ``ppermute`` (an
  XLA collective riding ICI), rank 0 injects a fresh microbatch each
  tick, the last rank collects outputs.  ``jax.grad`` through the scan +
  ppermute yields the reversed schedule automatically — no hand-written
  backward pipeline.
* bubble fraction is ``(pp-1)/(M+pp-1)``; per-dp-shard batch must be
  divisible by ``M`` (microbatches split the batch axis, as in GPipe).

This is a beyond-reference scaling feature: at the 2B Anima scale one
chip fits the whole model, but video training (T' frames) and larger
DiTs push per-stage activation memory down by ``pp`` while keeping every
rank's MXU busy.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.ring_attention import _shard_map

BLOCK_RE = re.compile(r"blocks\.(\d+)\.(.+)$")


def split_block_params(params: dict, num_blocks: int):
    """Flat param dict -> (stacked {suffix: [L, ...]}, rest flat dict)."""
    rest = {k: v for k, v in params.items() if not BLOCK_RE.match(k)}
    suffixes = sorted({m.group(2) for k in params
                       if (m := BLOCK_RE.match(k))})
    stacked = {s: jnp.stack([params[f"blocks.{i}.{s}"]
                             for i in range(num_blocks)]) for s in suffixes}
    return stacked, rest


def merge_block_params(stacked: dict, rest: dict, num_blocks: int) -> dict:
    """Inverse of :func:`split_block_params`."""
    out = dict(rest)
    for s, leaf in stacked.items():
        for i in range(num_blocks):
            out[f"blocks.{i}.{s}"] = leaf[i]
    return out


def pipeline_blocks(stacked: dict, x: jax.Array, emb: jax.Array,
                    context: jax.Array, rope, lora, *, mesh,
                    block_fn, num_blocks: int, microbatches: int):
    """Run the DiT block stack pipelined over the mesh's ``pp`` axis.

    stacked: {suffix: [num_blocks, ...]} (sharded P("pp") on axis 0).
    x: (B, T, H, W, D) activations, batch sharded over ``dp``.
    emb/lora: (B, T, d'); context: (B, Lc, Dc) — per-sample conditioning,
    microbatched alongside x.  rope: (cos, sin), replicated.
    block_fn: ``make_block_fn(...)`` result (cfg/attn/remat baked in).
    """
    pp = int(mesh.shape["pp"])
    if num_blocks % pp:
        raise ValueError(f"num_blocks={num_blocks} not divisible by pp={pp}")
    per_stage = num_blocks // pp
    cos, sin = rope

    def body(pl_, xl, el, cl, ll, cosl, sinl):
        r = jax.lax.axis_index("pp")
        b = xl.shape[0]
        m_count = microbatches
        if b % m_count:
            raise ValueError(
                f"per-dp-shard batch {b} not divisible by "
                f"microbatches={m_count}")
        mb = b // m_count
        xs = xl.reshape(m_count, mb, *xl.shape[1:])
        es = el.reshape(m_count, mb, *el.shape[1:])
        cs = cl.reshape(m_count, mb, *cl.shape[1:])
        ls = ll.reshape(m_count, mb, *ll.shape[1:])

        def stage(x_in, e, c, lo):
            for i in range(per_stage):
                pdict = {f"blk.{s}": leaf[i] for s, leaf in pl_.items()}
                x_in = block_fn(pdict, "blk", x_in, e, c, (cosl, sinl), lo)
            return x_in

        def tick(carry, t):
            buf, outs = carry
            m = t - r
            active = (m >= 0) & (m < m_count)
            mc = jnp.clip(m, 0, m_count - 1)
            fresh = jax.lax.dynamic_index_in_dim(xs, mc, keepdims=False)
            x_in = jnp.where(r == 0, fresh, buf)
            e = jax.lax.dynamic_index_in_dim(es, mc, keepdims=False)
            c = jax.lax.dynamic_index_in_dim(cs, mc, keepdims=False)
            lo = jax.lax.dynamic_index_in_dim(ls, mc, keepdims=False)
            # bubble ticks (pipeline fill/drain) skip the stage compute
            # entirely — with M microbatches the naive schedule wastes
            # (pp-1)/(M+pp-1) of each rank's FLOPs on garbage
            y = jax.lax.cond(active, lambda op: stage(*op),
                             lambda op: op[0], (x_in, e, c, lo))
            # last rank stores finished microbatches
            prev = jax.lax.dynamic_index_in_dim(outs, mc, keepdims=False)
            write = jnp.where(active & (r == pp - 1), y, prev)
            outs = jax.lax.dynamic_update_index_in_dim(outs, write, mc, 0)
            # hop the activation to the next stage (non-cyclic: rank 0
            # receives zeros, which it never reads)
            buf = jax.lax.ppermute(y, "pp",
                                   [(i, i + 1) for i in range(pp - 1)])
            return (buf, outs), None

        buf0 = jnp.zeros_like(xs[0])
        outs0 = jnp.zeros_like(xs)
        (buf, outs), _ = jax.lax.scan(
            tick, (buf0, outs0), jnp.arange(m_count + pp - 1))
        # replicate the collected outputs across the pp axis
        outs = jnp.where(r == pp - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, "pp")
        return outs.reshape(b, *xl.shape[1:])

    spec_stacked = jax.tree.map(lambda _: P("pp"), stacked)
    fn = _shard_map(
        body, mesh,
        (spec_stacked, P("dp"), P("dp"), P("dp"), P("dp"), P(), P()),
        P("dp"))
    return fn(stacked, x, emb, context, lora, cos, sin)


def pp_dit_forward(stacked: dict, rest: dict, latents, timesteps, context,
                   *, cfg, mesh, microbatches: int,
                   t5_ids=None, t5_weights=None, attn_impl="xla",
                   compute_dtype=jnp.bfloat16, remat=True,
                   fp32_residual: bool = False):
    """Full Anima DiT forward with the block stack pipeline-parallel.

    ``stacked``/``rest`` come from :func:`split_block_params`; the
    prologue (patchify/embedders/LLM adapter) and epilogue (final AdaLN +
    unpatchify) run GSPMD-sharded like the sequential path, only the
    28-block stack streams through the pp ring.
    """
    from ..models.anima import dit

    x, emb, ctx, rope, lora, orig = dit.dit_prologue(
        rest, latents, timesteps, context, cfg=cfg, t5_ids=t5_ids,
        t5_weights=t5_weights, attn_impl=attn_impl,
        compute_dtype=compute_dtype, fp32_residual=fp32_residual)
    block_fn = dit.make_block_fn(cfg, attn_impl, remat)
    x = pipeline_blocks(stacked, x, emb, ctx, rope, lora, mesh=mesh,
                        block_fn=block_fn, num_blocks=cfg.num_blocks,
                        microbatches=microbatches)
    return dit.dit_epilogue(rest, x, emb, lora, orig, cfg=cfg,
                            compute_dtype=compute_dtype)


# --------------------------------------------------------------------------
# Trainer integration: stacked params living inside an ordinary flat dict
# --------------------------------------------------------------------------

STACK_PREFIX = "__stack__."


class PPConfig:
    """Pipeline-parallel run settings threaded into the loss function."""

    def __init__(self, mesh, microbatches: int):
        self.mesh = mesh
        self.microbatches = int(microbatches)


def stackify_params(params: dict, num_blocks: int) -> dict:
    """Flat dict -> flat dict where every ``blocks.{i}.<suffix>`` family
    becomes one ``__stack__.<suffix>`` leaf of shape ``[num_blocks, ...]``.

    The stacked layout keeps the optimizer / grad-accum / checkpoint-state
    machinery oblivious to pipeline parallelism (they see ordinary
    name->tensor dicts); only the loss function and the sharding rules
    special-case the prefix.  Every suffix must be present for every block
    (freezing must be block-uniform) — otherwise the stage stacking is
    ill-defined and this raises.
    """
    block_names = [k for k in params if BLOCK_RE.match(k)]
    per_suffix: dict[str, int] = {}
    for k in block_names:
        per_suffix.setdefault(BLOCK_RE.match(k).group(2), 0)
        per_suffix[BLOCK_RE.match(k).group(2)] += 1
    bad = {s: n for s, n in per_suffix.items() if n != num_blocks}
    if bad:
        raise ValueError(
            "pipeline parallelism needs block-uniform trainability; these "
            f"suffixes are not present for all {num_blocks} blocks: "
            f"{sorted(bad)} (adjust the trained-keywords filter)")
    stacked, rest = split_block_params(params, num_blocks)
    return {**{STACK_PREFIX + s: v for s, v in stacked.items()}, **rest}


def unstackify_params(params: dict, num_blocks: int) -> dict:
    """Inverse of :func:`stackify_params` (no-op without stacked keys)."""
    stacked = {k[len(STACK_PREFIX):]: v for k, v in params.items()
               if k.startswith(STACK_PREFIX)}
    rest = {k: v for k, v in params.items()
            if not k.startswith(STACK_PREFIX)}
    if not stacked:
        return rest
    return merge_block_params(stacked, rest, num_blocks)


def split_stacked(params: dict):
    """{__stack__.s: v, rest...} -> (stacked {s: v}, rest)."""
    stacked = {k[len(STACK_PREFIX):]: v for k, v in params.items()
               if k.startswith(STACK_PREFIX)}
    rest = {k: v for k, v in params.items()
            if not k.startswith(STACK_PREFIX)}
    return stacked, rest
