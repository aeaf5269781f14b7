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
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


FLASH_MIN_KV = 256


def attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
              impl: str = "xla", scale: float | None = None) -> jax.Array:
    if impl == "flash" and k.shape[1] >= FLASH_MIN_KV:
        # short-KV cross attention (77 x caption chunks, 512-token adapter
        # context) has tiny logits; XLA's fused path wins there while the
        # flash kernel wins on the O(S^2) self-attention (measured on v5e,
        # tools_dev/attn_probe.py: self-L2 4.1 ms flash vs 9.1 ms xla,
        # cross-L2 1.7 vs 1.6 — so flash dispatches only at long KV)
        from .flash_attention import flash_attention
        return flash_attention(q, k, v, scale=scale)
    return dot_product_attention_xla(q, k, v, scale=scale)
