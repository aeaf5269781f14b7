"""Qwen3-0.6B text encoder in JAX — the Anima caption tower.

Functional re-implementation of the encoder the reference wraps via
transformers' ``Qwen3Model`` (/root/reference/training_utils/anima/models/
text_encoder.py): 28 layers, hidden 1024, GQA 16 query / 8 KV heads with
explicit head_dim 128, per-head QK-RMSNorm, SwiGLU MLP (intermediate 3072),
RMSNorm eps 1e-6, RoPE theta 1e6, causal attention with padding mask.

The Anima pipeline consumes ``hidden_states[-1]`` at 512 tokens
(train_anima.py:709-726) — i.e. the output of the final decoder layer
*before* the model-level final norm; this module returns exactly that.

Weights load from HF-format checkpoints (``model.layers.N...`` keys after
the loader strips ``text_encoder.`` prefixes) transposed to (in, out).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

Params = dict[str, jax.Array]


@dataclass(frozen=True)
class Qwen3Config:
    vocab_size: int = 151936
    hidden_size: int = 1024
    num_layers: int = 28
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 3072
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0


QWEN3_0_6B = Qwen3Config()

TINY_QWEN3 = Qwen3Config(vocab_size=256, hidden_size=64, num_layers=2,
                         num_heads=4, num_kv_heads=2, head_dim=16,
                         intermediate_size=128, rope_theta=10000.0)


def _rms_norm(weight: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    norm = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * norm * weight.astype(jnp.float32)).astype(x.dtype)


def _linear(params: Params, name: str, x: jax.Array) -> jax.Array:
    return jnp.dot(x, params[f"{name}.weight"].astype(x.dtype))


def _rope_tables(seq_len: int, head_dim: int, theta: float):
    inv = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                           / head_dim))
    ang = jnp.arange(seq_len, dtype=jnp.float32)[:, None] * inv[None]
    emb = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """HF rotate-half convention; x: (B, S, H, D)."""
    d2 = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)
    return (x * cos[None, :, None, :] + rot * sin[None, :, None, :]).astype(x.dtype)


def qwen3_forward(params: Params, token_ids: jax.Array,
                  attention_mask: jax.Array | None, cfg: Qwen3Config,
                  *, compute_dtype=jnp.float32) -> jax.Array:
    """token_ids: (B, S); attention_mask: (B, S) bool/int or None.

    Returns the final decoder layer output (B, S, hidden) — the reference's
    ``hidden_states[-1]``; the model-level final norm is intentionally NOT
    applied.
    """
    b, s = token_ids.shape
    x = params["model.embed_tokens.weight"][token_ids].astype(compute_dtype)
    cos, sin = _rope_tables(s, cfg.head_dim, cfg.rope_theta)

    causal = jnp.tril(jnp.ones((s, s), jnp.bool_))[None, None]
    if attention_mask is not None:
        pad = attention_mask.astype(jnp.bool_)[:, None, None, :]
        mask = jnp.logical_and(causal, pad)
    else:
        mask = causal

    rep = cfg.num_heads // cfg.num_kv_heads
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        h = _rms_norm(params[f"{p}.input_layernorm.weight"], x, cfg.rms_norm_eps)
        q = _linear(params, f"{p}.self_attn.q_proj", h).reshape(
            b, s, cfg.num_heads, cfg.head_dim)
        k = _linear(params, f"{p}.self_attn.k_proj", h).reshape(
            b, s, cfg.num_kv_heads, cfg.head_dim)
        v = _linear(params, f"{p}.self_attn.v_proj", h).reshape(
            b, s, cfg.num_kv_heads, cfg.head_dim)
        q = _rms_norm(params[f"{p}.self_attn.q_norm.weight"], q, cfg.rms_norm_eps)
        k = _rms_norm(params[f"{p}.self_attn.k_norm.weight"], k, cfg.rms_norm_eps)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits * (cfg.head_dim ** -0.5)
        logits = jnp.where(mask, logits, -1e30)
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(
            b, s, cfg.num_heads * cfg.head_dim)
        x = x + _linear(params, f"{p}.self_attn.o_proj", attn)

        h = _rms_norm(params[f"{p}.post_attention_layernorm.weight"], x,
                      cfg.rms_norm_eps)
        gate = jax.nn.silu(_linear(params, f"{p}.mlp.gate_proj", h))
        up = _linear(params, f"{p}.mlp.up_proj", h)
        x = x + _linear(params, f"{p}.mlp.down_proj", gate * up)
    return x


# --------------------------------------------------------------------------
# Parameters
# --------------------------------------------------------------------------

def param_shapes(cfg: Qwen3Config) -> dict[str, tuple[int, ...]]:
    d, hd = cfg.hidden_size, cfg.head_dim
    qd = cfg.num_heads * hd
    kvd = cfg.num_kv_heads * hd
    shapes = {
        "model.embed_tokens.weight": (cfg.vocab_size, d),
        "model.norm.weight": (d,),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        shapes[f"{p}.input_layernorm.weight"] = (d,)
        shapes[f"{p}.post_attention_layernorm.weight"] = (d,)
        shapes[f"{p}.self_attn.q_proj.weight"] = (d, qd)
        shapes[f"{p}.self_attn.k_proj.weight"] = (d, kvd)
        shapes[f"{p}.self_attn.v_proj.weight"] = (d, kvd)
        shapes[f"{p}.self_attn.o_proj.weight"] = (qd, d)
        shapes[f"{p}.self_attn.q_norm.weight"] = (hd,)
        shapes[f"{p}.self_attn.k_norm.weight"] = (hd,)
        shapes[f"{p}.mlp.gate_proj.weight"] = (d, cfg.intermediate_size)
        shapes[f"{p}.mlp.up_proj.weight"] = (d, cfg.intermediate_size)
        shapes[f"{p}.mlp.down_proj.weight"] = (cfg.intermediate_size, d)
    return shapes


def init_params(cfg: Qwen3Config, key: jax.Array, dtype=jnp.float32) -> Params:
    shapes = param_shapes(cfg)
    params: Params = {}
    keys = jax.random.split(key, len(shapes))
    for (name, shape), k in zip(sorted(shapes.items()), keys):
        if len(shape) == 1:
            params[name] = jnp.ones(shape, dtype)
        else:
            std = (1.0 / max(shape[0], 1)) ** 0.5
            params[name] = (jax.random.normal(k, shape, jnp.float32) * std
                            ).astype(dtype)
    return params


def params_from_torch_state(state: dict, cfg: Qwen3Config,
                            dtype=jnp.float32) -> Params:
    """HF torch layout -> TPU layout (linear weights transposed)."""
    shapes = param_shapes(cfg)
    params: Params = {}
    missing = []
    for name, want in shapes.items():
        if name not in state:
            missing.append(name)
            continue
        arr = jnp.asarray(state[name])
        if arr.ndim == 2 and name != "model.embed_tokens.weight":
            arr = jnp.transpose(arr, (1, 0))
        if tuple(arr.shape) != tuple(want):
            raise ValueError(f"{name}: shape {arr.shape} != expected {want}")
        params[name] = arr.astype(dtype)
    if missing:
        raise ValueError(f"Qwen3 checkpoint missing {len(missing)} tensors, "
                         f"e.g. {missing[:5]}")
    return params


def detect_config(state: dict) -> Qwen3Config:
    """Infer the tower size from checkpoint shapes (supports non-0.6B too)."""
    d = int(state["model.embed_tokens.weight"].shape[1])
    vocab = int(state["model.embed_tokens.weight"].shape[0])
    n = 0
    while f"model.layers.{n}.input_layernorm.weight" in state:
        n += 1
    hd = int(state["model.layers.0.self_attn.q_norm.weight"].shape[0])
    q_out = int(state["model.layers.0.self_attn.q_proj.weight"].shape[0])
    kv_out = int(state["model.layers.0.self_attn.k_proj.weight"].shape[0])
    inter = int(state["model.layers.0.mlp.gate_proj.weight"].shape[0])
    return Qwen3Config(vocab_size=vocab, hidden_size=d, num_layers=n,
                       num_heads=q_out // hd, num_kv_heads=kv_out // hd,
                       head_dim=hd, intermediate_size=inter)
