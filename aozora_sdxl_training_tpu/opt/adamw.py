"""Raven-semantics AdamW with GSPMD-sharded state (the TPU "Raven/Titan").

The reference's Raven/Titan optimizers exist to fit AdamW state in 12 GB of
VRAM by parking moments in CPU RAM and streaming them over PCIe per step
(/root/reference/training_utils/optimizers/raven.py, titan.py) — ~15 s per
optimizer step.  On TPU the same memory pressure is solved by *sharding* the
moments across the data-parallel axis (ZeRO-1): state lives in HBM, sliced
1/N per chip, and the update runs fully parallel — no host transfers at all.

What we preserve exactly is the *math*, including the reference's behavioral
quirks that shape training curves:

* partial bias correction: ``bc = 1 - (1 - bc) * debias_strength``
  (raven.py:129-137);
* decoupled weight decay applied as ``p *= 1 - lr * wd`` *before* the Adam
  update (raven.py:103,139-140);
* moments stored in a configurable dtype (bf16 default) while the update
  itself is fp32 (raven.py:122-143).

State is a plain pytree matching the param tree, so pjit shards it with a
simple rule (see parallel/sharding.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AdamWConfig:
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.01
    debias_strength: float = 0.3
    momentum_dtype: Any = jnp.bfloat16

    @classmethod
    def from_params_dict(cls, raw: dict) -> "AdamWConfig":
        dtype = {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
                 "float32": jnp.float32}.get(
                     str(raw.get("momentum_dtype", "bfloat16")), jnp.bfloat16)
        return cls(
            betas=tuple(raw.get("betas", (0.9, 0.999))),
            eps=float(raw.get("eps", 1e-8)),
            weight_decay=float(raw.get("weight_decay", 0.01)),
            debias_strength=float(raw.get("debias_strength", 1.0)),
            momentum_dtype=dtype,
        )


class AdamWState(NamedTuple):
    step: jax.Array             # () int32 — shared across params
    exp_avg: Any                # pytree like params, momentum_dtype
    exp_avg_sq: Any             # pytree like params, momentum_dtype


def init_state(params, cfg: AdamWConfig, trainable_mask=None) -> AdamWState:
    """Zero moments; frozen params get zero-size placeholders to save HBM."""
    def zeros(p, trainable):
        if not trainable:
            return jnp.zeros((), cfg.momentum_dtype)
        return jnp.zeros(p.shape, cfg.momentum_dtype)

    if trainable_mask is None:
        trainable_mask = jax.tree.map(lambda _: True, params)
    m = jax.tree.map(zeros, params, trainable_mask)
    v = jax.tree.map(zeros, params, trainable_mask)
    return AdamWState(step=jnp.zeros((), jnp.int32), exp_avg=m, exp_avg_sq=v)


def apply_updates(params, grads, state: AdamWState, cfg: AdamWConfig, *,
                  lr, trainable_mask=None):
    """One AdamW step with Raven debias semantics. fp32 math, any storage dtype.

    ``lr`` is a traced scalar so LR-curve changes don't recompile.
    Returns (new_params, new_state).
    """
    beta1, beta2 = cfg.betas
    step = state.step + 1
    sf = step.astype(jnp.float32)
    bc1 = 1.0 - jnp.power(beta1, sf)
    bc2 = 1.0 - jnp.power(beta2, sf)
    if cfg.debias_strength < 1.0:
        bc1 = 1.0 - (1.0 - bc1) * cfg.debias_strength
        bc2 = 1.0 - (1.0 - bc2) * cfg.debias_strength
    step_size = lr / bc1
    sqrt_bc2 = jnp.sqrt(bc2)
    wd_factor = 1.0 - lr * cfg.weight_decay

    if trainable_mask is None:
        trainable_mask = jax.tree.map(lambda _: True, params)

    def update_one(p, g, m, v, trainable):
        if not trainable:
            return p, m, v
        g32 = g.astype(jnp.float32)
        m32 = m.astype(jnp.float32) * beta1 + g32 * (1.0 - beta1)
        v32 = v.astype(jnp.float32) * beta2 + g32 * g32 * (1.0 - beta2)
        p32 = p.astype(jnp.float32)
        if cfg.weight_decay != 0.0:
            p32 = p32 * wd_factor
        denom = jnp.sqrt(v32) / sqrt_bc2 + cfg.eps
        p32 = p32 - step_size * m32 / denom
        return (p32.astype(p.dtype),
                m32.astype(cfg.momentum_dtype),
                v32.astype(cfg.momentum_dtype))

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.exp_avg)
    flat_v = treedef.flatten_up_to(state.exp_avg_sq)
    flat_t = treedef.flatten_up_to(trainable_mask)

    new_p, new_m, new_v = [], [], []
    for p, g, m, v, t in zip(flat_p, flat_g, flat_m, flat_v, flat_t):
        np_, nm, nv = update_one(p, g, m, v, t)
        new_p.append(np_)
        new_m.append(nm)
        new_v.append(nv)

    return (
        jax.tree.unflatten(treedef, new_p),
        AdamWState(step=step,
                   exp_avg=jax.tree.unflatten(treedef, new_m),
                   exp_avg_sq=jax.tree.unflatten(treedef, new_v)),
    )


def global_grad_norm(grads, trainable_mask=None) -> jax.Array:
    leaves = jax.tree.leaves(grads)
    if trainable_mask is not None:
        mask = jax.tree.leaves(trainable_mask)
        leaves = [g for g, t in zip(leaves, mask) if t]
    sq = sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves)
    return jnp.sqrt(sq)


def clip_by_global_norm(grads, max_norm: float, *, trainable_mask=None,
                        precomputed_norm=None):
    """Returns (clipped_grads, raw_norm). max_norm <= 0 disables clipping."""
    norm = precomputed_norm if precomputed_norm is not None else global_grad_norm(
        grads, trainable_mask)
    if max_norm is None or max_norm <= 0:
        return grads, norm
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype),
                        grads), norm
