"""Attention dispatch: XLA reference path and the Pallas flash kernel.

The UNet/DiT call :func:`attention` with ``(B, S_q, H, D)`` tensors and an
implementation name — the TPU analogue of the reference's attention-backend
switch (/root/reference/train.py:197-229, sdpa/cudnn/xformers flags). Here the
choices are:

* ``"xla"``   — plain ``einsum`` + fp32 softmax; always available, used as the
  numerics reference in tests.
* ``"flash"`` — Pallas blockwise flash-attention (ops/flash_attention.py),
  used on TPU for the big self-attention sequences.

Softmax is always computed in fp32 regardless of compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_product_attention_xla(q: jax.Array, k: jax.Array, v: jax.Array,
                              scale: float | None = None) -> jax.Array:
    """q: (B, Sq, H, D); k, v: (B, Skv, H, D) -> (B, Sq, H, D)."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    if _bf16_probs_enabled():
        return _attn_core_bf16_probs(q, k, v, scale)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _bf16_probs_enabled() -> bool:
    import os
    return os.environ.get("AOZORA_XLA_ATTN", "") == "bf16probs"


@jax.custom_vjp
def _attn_core_bf16_probs(q, k, v, scale):
    """XLA attention with bf16 S^2 residuals.

    The r2 trace shows the default XLA path at the S=1024 levels is
    HBM-bound on f32 softmax residuals (f32[20,1024,1024] tensors at
    620-700 GiB/s, ~27 ms/step).  This variant stores the probabilities in
    compute dtype (bf16) instead — the softmax backward recomputes in fp32
    from the bf16 probs, like torch SDPA's half-precision path.  Fallback
    A/B for sites where the flash kernel does not win (AOZORA_XLA_ATTN=
    bf16probs).
    """
    out, _ = _attn_core_fwd(q, k, v, scale)
    return out


def _attn_core_fwd(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out, (q, k, v, probs, scale)


def _attn_core_bwd(res, do):
    q, k, v, probs, scale = res
    pf = probs.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", pf, do.astype(jnp.float32))
    dp = jnp.einsum("bqhd,bkhd->bhqk", do, v,
                    preferred_element_type=jnp.float32)
    dlogits = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", dlogits, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", dlogits, q.astype(jnp.float32)) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


_attn_core_bf16_probs.defvjp(lambda q, k, v, s: _attn_core_fwd(q, k, v, s),
                             _attn_core_bwd)


FLASH_MIN_KV = 2048


def _flash_min_kv() -> int:
    """Dispatch threshold: sequences with KV below this use the XLA path.

    Default 2048 is the measured e2e optimum on v5e (r2 sweep, full SDXL
    1024px micro-step under hires remat): the Pallas kernel wins decisively
    at the 4096-token level (266.5 ms/step vs 304.9 with XLA there) but
    LOSES in-context at the 1024-token level (282.0 ms with min_kv=256)
    and at short-KV cross attention, where XLA's fused path is better.
    Override via AOZORA_FLASH_MIN_KV for probes."""
    import os
    return int(os.environ.get("AOZORA_FLASH_MIN_KV", FLASH_MIN_KV))


def attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
              impl: str = "xla", scale: float | None = None) -> jax.Array:
    if impl == "flash" and k.shape[1] >= _flash_min_kv():
        from .flash_attention import flash_attention
        return flash_attention(q, k, v, scale=scale)
    return dot_product_attention_xla(q, k, v, scale=scale)
