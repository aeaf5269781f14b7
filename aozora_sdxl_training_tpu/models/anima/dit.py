"""Anima DiT (Cosmos/Predict2-style video DiT) in JAX — TPU-native.

From-scratch functional re-implementation of the reference's ``AnimaDiT`` /
``MiniTrainDIT`` (/root/reference/training_utils/anima/models/anima_dit.py:
784-1335): 28 blocks x 2048 wide, 16 heads (head_dim 128), patch 2x2x1,
concat padding-mask channel, AdaLN-LoRA (dim 256) modulation, QK-RMSNorm,
3D RoPE with NTK h/w extrapolation 4.0 (fps modulation off), and the
trainable 6-layer LLM adapter mapping Qwen3 hidden states + raw T5 token ids
to the 1024-d cross-attention context padded to 512 tokens
(anima_dit.py:1149-1319).

TPU-design notes:
* activations are channel-last (B, T, H, W, D) / (B, L, D) — patchify and
  unpatchify are pure reshapes feeding one big MXU matmul;
* params live in a flat dict under the reference checkpoint's own key names
  (``blocks.N.self_attn.q_proj.weight`` ...), stored transposed to (in, out);
* RoPE tables are precomputed per (T, H, W) shape as fp32 (cos, sin) arrays
  over concatenated [t | h | w] frequency pairs — the ``apply_rotary_pos_emb``
  half-split convention of the reference (anima_dit.py:223-230);
* attention dispatches through ops.attention (XLA or Pallas flash);
* remat wraps each block (the reference's gradient checkpointing,
  anima_dit.py:1098-1107).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.ad_checkpoint
import jax.numpy as jnp

from ...ops.attention import attention

Params = dict[str, jax.Array]


@dataclass(frozen=True)
class AnimaDiTConfig:
    in_channels: int = 16
    out_channels: int = 16
    patch_spatial: int = 2
    patch_temporal: int = 1
    model_channels: int = 2048
    num_blocks: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    crossattn_emb_channels: int = 1024
    adaln_lora_dim: int = 256
    concat_padding_mask: bool = True
    rope_h_extrapolation_ratio: float = 4.0
    rope_w_extrapolation_ratio: float = 4.0
    rope_t_extrapolation_ratio: float = 1.0
    # LLM adapter
    adapter_source_dim: int = 1024    # Qwen3 hidden size
    adapter_target_dim: int = 1024
    adapter_layers: int = 6
    adapter_heads: int = 16
    adapter_vocab: int = 32128        # T5 vocabulary
    context_tokens: int = 512

    @property
    def head_dim(self) -> int:
        return self.model_channels // self.num_heads


ANIMA_BASE = AnimaDiTConfig()

TINY_ANIMA = AnimaDiTConfig(
    model_channels=96, num_blocks=2, num_heads=4, adaln_lora_dim=16,
    crossattn_emb_channels=32, adapter_source_dim=32, adapter_target_dim=32,
    adapter_layers=2, adapter_heads=4, adapter_vocab=128, context_tokens=16)


# --------------------------------------------------------------------------
# Primitives
# --------------------------------------------------------------------------

def _linear(params: Params, name: str, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, params[f"{name}.weight"].astype(x.dtype))
    bias = params.get(f"{name}.bias")
    return y if bias is None else y + bias.astype(y.dtype)


def _rms_norm(params: Params, name: str, x: jax.Array,
              eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    norm = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    w = params[f"{name}.weight"].astype(jnp.float32)
    return (xf * norm * w).astype(x.dtype)


def _layer_norm_noaffine(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def sinusoidal_timestep_embedding(timesteps: jax.Array, dim: int) -> jax.Array:
    """(B, T) -> (B, T, dim), [cos | sin], exponent /half (anima_dit.py:415-434)."""
    half = dim // 2
    exponent = jnp.exp(-math.log(10000.0)
                       * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[..., None] * exponent
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


# --------------------------------------------------------------------------
# 3D RoPE
# --------------------------------------------------------------------------

def rope_3d_tables(cfg: AnimaDiTConfig, t: int, h: int, w: int):
    """fp32 (cos, sin) of shape (t*h*w, head_dim//2).

    Pair frequencies are [temporal | height | width] concatenated; the pair
    (j, j + D/2) of each head vector rotates by the j-th frequency
    (anima_dit.py:114-230).  NTK thetas: 10000 * ratio^(dim/(dim-2)).
    """
    d = cfg.head_dim
    dim_h = d // 6 * 2
    dim_w = dim_h
    dim_t = d - 2 * dim_h

    h_theta = 10000.0 * cfg.rope_h_extrapolation_ratio ** (dim_h / (dim_h - 2))
    w_theta = 10000.0 * cfg.rope_w_extrapolation_ratio ** (dim_w / (dim_w - 2))
    t_theta = 10000.0 * cfg.rope_t_extrapolation_ratio ** (dim_t / (dim_t - 2))

    spatial_range = jnp.arange(0, dim_h, 2, dtype=jnp.float32)[: dim_h // 2] / dim_h
    temporal_range = jnp.arange(0, dim_t, 2, dtype=jnp.float32)[: dim_t // 2] / dim_t
    h_freqs = 1.0 / h_theta ** spatial_range
    w_freqs = 1.0 / w_theta ** spatial_range
    t_freqs = 1.0 / t_theta ** temporal_range

    ang_t = jnp.arange(t, dtype=jnp.float32)[:, None] * t_freqs[None]   # (t, pt)
    ang_h = jnp.arange(h, dtype=jnp.float32)[:, None] * h_freqs[None]   # (h, ph)
    ang_w = jnp.arange(w, dtype=jnp.float32)[:, None] * w_freqs[None]   # (w, pw)

    # broadcast to the flattened (t h w) grid, pairs ordered [t | h | w]
    ang = jnp.concatenate([
        jnp.broadcast_to(ang_t[:, None, None, :], (t, h, w, ang_t.shape[1])),
        jnp.broadcast_to(ang_h[None, :, None, :], (t, h, w, ang_h.shape[1])),
        jnp.broadcast_to(ang_w[None, None, :, :], (t, h, w, ang_w.shape[1])),
    ], axis=-1).reshape(t * h * w, d // 2)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_halfsplit(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, L, H, D); pairs are (x[j], x[j + D/2]) — reference convention."""
    d2 = x.shape[-1] // 2
    x1 = x[..., :d2].astype(jnp.float32)
    x2 = x[..., d2:].astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out1 = x1 * c - x2 * s
    out2 = x1 * s + x2 * c
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)


# --------------------------------------------------------------------------
# Attention / blocks
# --------------------------------------------------------------------------

def _base_impl(attn_impl) -> str:
    """The local attention impl: SP configs carry it as .base_impl."""
    from ...ops.ring_attention import SPRingConfig
    return (attn_impl.base_impl if isinstance(attn_impl, SPRingConfig)
            else attn_impl)


def _dit_attention(params: Params, prefix: str, x: jax.Array,
                   context: jax.Array | None, cfg: AnimaDiTConfig,
                   rope=None, attn_impl="xla") -> jax.Array:
    b, l, _ = x.shape
    heads, d = cfg.num_heads, cfg.head_dim
    ctx = x if context is None else context
    from ...ops.fused_proj import fused_linear, fused_qkv_enabled
    if fused_qkv_enabled() and context is None:
        q, k, v = fused_linear(
            params,
            [f"{prefix}.q_proj", f"{prefix}.k_proj", f"{prefix}.v_proj"], x)
        q = q.reshape(b, l, heads, d)
        k = k.reshape(b, ctx.shape[1], heads, d)
        v = v.reshape(b, ctx.shape[1], heads, d)
    elif fused_qkv_enabled():
        q = _linear(params, f"{prefix}.q_proj", x).reshape(b, l, heads, d)
        k, v = fused_linear(
            params, [f"{prefix}.k_proj", f"{prefix}.v_proj"], ctx)
        k = k.reshape(b, ctx.shape[1], heads, d)
        v = v.reshape(b, ctx.shape[1], heads, d)
    else:
        q = _linear(params, f"{prefix}.q_proj", x).reshape(b, l, heads, d)
        k = _linear(params, f"{prefix}.k_proj", ctx).reshape(b, ctx.shape[1], heads, d)
        v = _linear(params, f"{prefix}.v_proj", ctx).reshape(b, ctx.shape[1], heads, d)
    q = _rms_norm(params, f"{prefix}.q_norm", q)
    k = _rms_norm(params, f"{prefix}.k_norm", k)
    if rope is not None and context is None:  # rope only on self-attention
        cos, sin = rope
        q = apply_rope_halfsplit(q, cos, sin)
        k = apply_rope_halfsplit(k, cos, sin)
    from ...ops.ring_attention import SPRingConfig, sp_ring_attention
    if context is None and isinstance(attn_impl, SPRingConfig):
        # sequence parallelism: the self-attention tokens shard over the
        # mesh axis and KV hops the ICI ring (ops/ring_attention.py);
        # cross-attention/adapter sites need no communication (replicated
        # 512-token context) and use attn_impl.base_impl locally
        o = sp_ring_attention(q, k, v, attn_impl).reshape(b, l, heads * d)
    else:
        o = attention(q, k, v, impl=_base_impl(attn_impl)).reshape(
            b, l, heads * d)
    return _linear(params, f"{prefix}.output_proj", o)


def _adaln_chunks(params: Params, prefix: str, emb: jax.Array,
                  adaln_lora: jax.Array | None, n: int):
    """SiLU -> LoRA down -> LoRA up (+ shared lora term), chunked."""
    h = jax.nn.silu(emb)
    h = _linear(params, f"{prefix}.1", h)
    h = _linear(params, f"{prefix}.2", h)
    if adaln_lora is not None:
        h = h + adaln_lora[..., : h.shape[-1]]
    return jnp.split(h, n, axis=-1)


def dit_block(params: Params, prefix: str, x: jax.Array, emb: jax.Array,
              context: jax.Array, rope, adaln_lora, cfg: AnimaDiTConfig,
              attn_impl: str = "xla") -> jax.Array:
    """x: (B, T, H, W, D); emb: (B, T, D); context: (B, Lc, Dc)."""
    b, t, h, w, d = x.shape
    res_dtype = x.dtype

    def mod(name):
        shift, scale, gate = _adaln_chunks(
            params, f"{prefix}.{name}", emb, adaln_lora, 3)
        expand = lambda a: a[:, :, None, None, :]
        return expand(shift), expand(scale), expand(gate)

    def norm_mod(xx, shift, scale):
        return _layer_norm_noaffine(xx) * (1 + scale.astype(xx.dtype)) \
            + shift.astype(xx.dtype)

    # self-attention
    shift, scale, gate = mod("adaln_modulation_self_attn")
    normed = norm_mod(x, shift, scale).reshape(b, t * h * w, d)
    out = _dit_attention(params, f"{prefix}.self_attn", normed, None, cfg,
                         rope=rope, attn_impl=attn_impl)
    x = x + gate.astype(res_dtype) * out.reshape(b, t, h, w, d).astype(res_dtype)

    # cross-attention
    shift, scale, gate = mod("adaln_modulation_cross_attn")
    normed = norm_mod(x, shift, scale).reshape(b, t * h * w, d)
    out = _dit_attention(params, f"{prefix}.cross_attn", normed, context, cfg,
                         attn_impl=attn_impl)
    x = x + gate.astype(res_dtype) * out.reshape(b, t, h, w, d).astype(res_dtype)

    # MLP (GPT2FeedForward: linear -> exact GELU -> linear, no biases)
    shift, scale, gate = mod("adaln_modulation_mlp")
    normed = norm_mod(x, shift, scale)
    hmid = _linear(params, f"{prefix}.mlp.layer1", normed)
    hmid = jax.nn.gelu(hmid, approximate=False)
    out = _linear(params, f"{prefix}.mlp.layer2", hmid)
    # Tag for the "Conservative" remat policy: save the wide->narrow MLP
    # down-projection instead of recomputing the 8192->2048 GEMM
    # (reference's selective-checkpoint MUST_SAVE rule, train_anima.py:536-593).
    out = jax.ad_checkpoint.checkpoint_name(out, "mlp_down")
    x = x + gate.astype(res_dtype) * out.astype(res_dtype)
    return x


# --------------------------------------------------------------------------
# Patchify / unpatchify
# --------------------------------------------------------------------------

def pad_to_patch_size(x: jax.Array, pt: int, ps: int) -> jax.Array:
    """(B, T, H, W, C) circular pad T/H/W up to patch multiples
    (anima_dit.py:1029-1037)."""
    b, t, h, w, c = x.shape
    pads = [(0, 0),
            (0, (pt - t % pt) % pt),
            (0, (ps - h % ps) % ps),
            (0, (ps - w % ps) % ps),
            (0, 0)]
    if all(p == (0, 0) for p in pads):
        return x
    return jnp.pad(x, pads, mode="wrap")


def patchify(x: jax.Array, pt: int, ps: int) -> jax.Array:
    """(B, T, H, W, C) -> (B, T/pt, H/ps, W/ps, C*pt*ps*ps) with the
    reference's (c, r, m, n) feature ordering (anima_dit.py:495-505)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // pt, pt, h // ps, ps, w // ps, ps, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 7, 2, 4, 6))  # b t h w c r m n
    return x.reshape(b, t // pt, h // ps, w // ps, c * pt * ps * ps)


def unpatchify(x: jax.Array, pt: int, ps: int, out_c: int) -> jax.Array:
    """(B, T, H, W, ps*ps*pt*C) -> (B, T*pt, H*ps, W*ps, C) with the
    reference's (p1, p2, t, C) feature ordering (anima_dit.py:1019-1027)."""
    b, t, h, w, m = x.shape
    x = x.reshape(b, t, h, w, ps, ps, pt, out_c)
    x = jnp.transpose(x, (0, 1, 6, 2, 4, 3, 5, 7))  # b t pt h p1 w p2 c
    return x.reshape(b, t * pt, h * ps, w * ps, out_c)


# --------------------------------------------------------------------------
# LLM adapter
# --------------------------------------------------------------------------

def _rope_1d(seq_len: int, head_dim: int):
    inv = 1.0 / (10000.0 ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                             / head_dim))
    ang = jnp.arange(seq_len, dtype=jnp.float32)[:, None] * inv[None]
    emb = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    d2 = x.shape[-1] // 2
    return jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)


def _adapter_attention(params: Params, prefix: str, x: jax.Array,
                       context: jax.Array, heads: int, rope_q, rope_k,
                       attn_impl: str = "xla") -> jax.Array:
    b, l, dq = x.shape
    d = dq // heads
    from ...ops.fused_proj import fused_linear, fused_qkv_enabled
    if fused_qkv_enabled() and context is x:
        q, k, v = fused_linear(
            params,
            [f"{prefix}.q_proj", f"{prefix}.k_proj", f"{prefix}.v_proj"], x)
        q = q.reshape(b, l, heads, d)
        k = k.reshape(b, context.shape[1], heads, d)
        v = v.reshape(b, context.shape[1], heads, d)
    elif fused_qkv_enabled():
        q = _linear(params, f"{prefix}.q_proj", x).reshape(b, l, heads, d)
        k, v = fused_linear(
            params, [f"{prefix}.k_proj", f"{prefix}.v_proj"], context)
        k = k.reshape(b, context.shape[1], heads, d)
        v = v.reshape(b, context.shape[1], heads, d)
    else:
        q = _linear(params, f"{prefix}.q_proj", x).reshape(b, l, heads, d)
        k = _linear(params, f"{prefix}.k_proj", context).reshape(
            b, context.shape[1], heads, d)
        v = _linear(params, f"{prefix}.v_proj", context).reshape(
            b, context.shape[1], heads, d)
    q = _rms_norm(params, f"{prefix}.q_norm", q)
    k = _rms_norm(params, f"{prefix}.k_norm", k)
    if rope_q is not None:
        cos, sin = rope_q
        q = (q * cos[None, :, None, :] + _rotate_half(q) * sin[None, :, None, :]).astype(q.dtype)
        cos, sin = rope_k
        k = (k * cos[None, :, None, :] + _rotate_half(k) * sin[None, :, None, :]).astype(k.dtype)
    o = attention(q, k, v, impl=attn_impl).reshape(b, l, dq)
    return _linear(params, f"{prefix}.o_proj", o)


def llm_adapter_forward(params: Params, source_hidden: jax.Array,
                        target_ids: jax.Array, cfg: AnimaDiTConfig,
                        attn_impl: str = "xla") -> jax.Array:
    """Qwen3 hidden states + T5 token ids -> adapted context
    (anima_dit.py:1250-1297).  Trainable; runs inside the DiT forward."""
    p = "llm_adapter"
    x = params[f"{p}.embed.weight"][target_ids].astype(source_hidden.dtype)
    heads = cfg.adapter_heads
    head_dim = cfg.adapter_target_dim // heads
    rope_q = _rope_1d(x.shape[1], head_dim)
    rope_k = _rope_1d(source_hidden.shape[1], head_dim)
    for i in range(cfg.adapter_layers):
        blk = f"{p}.blocks.{i}"
        h = _rms_norm(params, f"{blk}.norm_self_attn", x)
        x = x + _adapter_attention(params, f"{blk}.self_attn", h, h, heads,
                                   rope_q, rope_q, attn_impl)
        h = _rms_norm(params, f"{blk}.norm_cross_attn", x)
        x = x + _adapter_attention(params, f"{blk}.cross_attn", h,
                                   source_hidden, heads, rope_q, rope_k,
                                   attn_impl)
        h = _rms_norm(params, f"{blk}.norm_mlp", x)
        h = _linear(params, f"{blk}.mlp.0", h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + _linear(params, f"{blk}.mlp.2", h)
    x = _linear(params, f"{p}.out_proj", x)
    return _rms_norm(params, f"{p}.norm", x)


def preprocess_text_embeds(params: Params, text_embeds: jax.Array,
                           t5_ids: jax.Array | None, cfg: AnimaDiTConfig,
                           t5_weights: jax.Array | None = None,
                           attn_impl: str = "xla") -> jax.Array:
    """Adapter + pad-to-512 (anima_dit.py:1309-1319)."""
    if t5_ids is None:
        return text_embeds
    out = llm_adapter_forward(params, text_embeds, t5_ids, cfg, attn_impl)
    if t5_weights is not None:
        out = out * t5_weights
    if out.shape[1] < cfg.context_tokens:
        out = jnp.pad(out, ((0, 0), (0, cfg.context_tokens - out.shape[1]),
                            (0, 0)))
    return out


# --------------------------------------------------------------------------
# Full forward
# --------------------------------------------------------------------------

def dit_prologue(params: Params, latents: jax.Array, timesteps: jax.Array,
                 context: jax.Array, *, cfg: AnimaDiTConfig,
                 t5_ids: jax.Array | None = None,
                 t5_weights: jax.Array | None = None,
                 attn_impl: str = "xla",
                 compute_dtype=jnp.bfloat16,
                 fp32_residual: bool = False):
    """Everything before the block stack: patchify + embedders + adapter.

    Returns (x, emb, context, rope, lora, orig_shape) — the per-block
    loop inputs (shared by the sequential and pipeline-parallel paths)."""
    pt, ps = cfg.patch_temporal, cfg.patch_spatial
    orig = latents.shape
    x = pad_to_patch_size(latents.astype(compute_dtype), pt, ps)
    if cfg.concat_padding_mask:
        mask = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
        x = jnp.concatenate([x, mask], axis=-1)
    x = patchify(x, pt, ps)
    x = _linear(params, "x_embedder.proj.1", x)
    b, t, h, w, d = x.shape

    rope = rope_3d_tables(cfg, t, h, w)

    if timesteps.ndim == 1:
        timesteps = timesteps[:, None]
    sin_emb = sinusoidal_timestep_embedding(timesteps, cfg.model_channels)
    sin_emb = sin_emb.astype(compute_dtype)
    # AdaLN-LoRA mode: t_embedding is the *raw* sinusoid, RMS-normed; the
    # 3D modulation seed comes from the small MLP (anima_dit.py:453-465).
    lora = _linear(params, "t_embedder.1.linear_2",
                   jax.nn.silu(_linear(params, "t_embedder.1.linear_1",
                                       sin_emb)))
    emb = _rms_norm(params, "t_embedding_norm", sin_emb)

    context = preprocess_text_embeds(params, context.astype(compute_dtype),
                                     t5_ids, cfg, t5_weights,
                                     _base_impl(attn_impl))

    if fp32_residual:
        x = x.astype(jnp.float32)
    return x, emb, context, rope, lora, orig


def make_block_fn(cfg: AnimaDiTConfig, attn_impl, remat):
    """The per-block callable, with the remat policy applied."""
    block_fn = functools.partial(dit_block, cfg=cfg, attn_impl=attn_impl)
    if remat == "conservative":
        # reference's selective checkpointing: keep the wide->narrow MLP
        # down-proj outputs resident, recompute the rest
        # (train_anima.py:536-593 MUST_SAVE rule).  Flash-attention outputs
        # ride along so its backward skips the forward-kernel re-run.
        block_fn = jax.checkpoint(
            block_fn, static_argnums=(1,),
            policy=jax.checkpoint_policies.save_only_these_names(
                "mlp_down", "flash_out", "flash_lse"))
    elif remat:
        block_fn = jax.checkpoint(block_fn, static_argnums=(1,))
    return block_fn


def dit_epilogue(params: Params, x: jax.Array, emb: jax.Array,
                 lora: jax.Array, orig, *, cfg: AnimaDiTConfig,
                 compute_dtype=jnp.bfloat16) -> jax.Array:
    """Final 2-chunk AdaLN + linear + unpatchify + crop."""
    pt, ps = cfg.patch_temporal, cfg.patch_spatial
    x = x.astype(compute_dtype)
    fl = jax.nn.silu(emb)
    fl = _linear(params, "final_layer.adaln_modulation.1", fl)
    fl = _linear(params, "final_layer.adaln_modulation.2", fl)
    fl = fl + lora[..., : fl.shape[-1]]
    shift, scale = jnp.split(fl, 2, axis=-1)
    x = _layer_norm_noaffine(x) * (1 + scale[:, :, None, None, :]) \
        + shift[:, :, None, None, :]
    x = _linear(params, "final_layer.linear", x)
    x = unpatchify(x, pt, ps, cfg.out_channels)
    return x[:, : orig[1], : orig[2], : orig[3], :]


def dit_forward(params: Params, latents: jax.Array, timesteps: jax.Array,
                context: jax.Array, *, cfg: AnimaDiTConfig,
                t5_ids: jax.Array | None = None,
                t5_weights: jax.Array | None = None,
                attn_impl: str = "xla",
                compute_dtype=jnp.bfloat16,
                remat: bool = True,
                fp32_residual: bool = False) -> jax.Array:
    """latents: (B, T, H, W, C) channel-last; timesteps: (B,) or (B, T).

    Returns (B, T, H, W, C_out) cropped back to the input spatial size.
    """
    x, emb, context, rope, lora, orig = dit_prologue(
        params, latents, timesteps, context, cfg=cfg, t5_ids=t5_ids,
        t5_weights=t5_weights, attn_impl=attn_impl,
        compute_dtype=compute_dtype, fp32_residual=fp32_residual)
    block_fn = make_block_fn(cfg, attn_impl, remat)
    for i in range(cfg.num_blocks):
        x = block_fn(params, f"blocks.{i}", x, emb, context, rope, lora)
    return dit_epilogue(params, x, emb, lora, orig, cfg=cfg,
                        compute_dtype=compute_dtype)


# --------------------------------------------------------------------------
# Parameter enumeration / init
# --------------------------------------------------------------------------

def param_shapes(cfg: AnimaDiTConfig) -> dict[str, tuple[int, ...]]:
    d = cfg.model_channels
    lora = cfg.adaln_lora_dim
    ctx = cfg.crossattn_emb_channels
    pt, ps = cfg.patch_temporal, cfg.patch_spatial
    in_c = cfg.in_channels + (1 if cfg.concat_padding_mask else 0)
    shapes: dict[str, tuple[int, ...]] = {
        "x_embedder.proj.1.weight": (in_c * pt * ps * ps, d),
        "t_embedder.1.linear_1.weight": (d, d),
        "t_embedder.1.linear_2.weight": (d, 3 * d),
        "t_embedding_norm.weight": (d,),
        "final_layer.linear.weight": (d, ps * ps * pt * cfg.out_channels),
        "final_layer.adaln_modulation.1.weight": (d, lora),
        "final_layer.adaln_modulation.2.weight": (lora, 2 * d),
    }
    hd = cfg.head_dim
    for i in range(cfg.num_blocks):
        p = f"blocks.{i}"
        for attn, kdim in ((f"{p}.self_attn", d), (f"{p}.cross_attn", ctx)):
            shapes[f"{attn}.q_proj.weight"] = (d, d)
            shapes[f"{attn}.k_proj.weight"] = (kdim, d)
            shapes[f"{attn}.v_proj.weight"] = (kdim, d)
            shapes[f"{attn}.output_proj.weight"] = (d, d)
            shapes[f"{attn}.q_norm.weight"] = (hd,)
            shapes[f"{attn}.k_norm.weight"] = (hd,)
        for m in ("self_attn", "cross_attn", "mlp"):
            shapes[f"{p}.adaln_modulation_{m}.1.weight"] = (d, lora)
            shapes[f"{p}.adaln_modulation_{m}.2.weight"] = (lora, 3 * d)
        ff = int(d * cfg.mlp_ratio)
        shapes[f"{p}.mlp.layer1.weight"] = (d, ff)
        shapes[f"{p}.mlp.layer2.weight"] = (ff, d)

    # LLM adapter
    td, sd = cfg.adapter_target_dim, cfg.adapter_source_dim
    ahd = td // cfg.adapter_heads
    shapes["llm_adapter.embed.weight"] = (cfg.adapter_vocab, td)
    shapes["llm_adapter.out_proj.weight"] = (td, td)
    shapes["llm_adapter.out_proj.bias"] = (td,)
    shapes["llm_adapter.norm.weight"] = (td,)
    for i in range(cfg.adapter_layers):
        p = f"llm_adapter.blocks.{i}"
        for norm in ("norm_self_attn", "norm_cross_attn", "norm_mlp"):
            shapes[f"{p}.{norm}.weight"] = (td,)
        for attn, kdim in ((f"{p}.self_attn", td), (f"{p}.cross_attn", sd)):
            shapes[f"{attn}.q_proj.weight"] = (td, td)
            shapes[f"{attn}.k_proj.weight"] = (kdim, td)
            shapes[f"{attn}.v_proj.weight"] = (kdim, td)
            shapes[f"{attn}.o_proj.weight"] = (td, td)
            shapes[f"{attn}.q_norm.weight"] = (ahd,)
            shapes[f"{attn}.k_norm.weight"] = (ahd,)
        ffa = int(td * 4.0)
        shapes[f"{p}.mlp.0.weight"] = (td, ffa)
        shapes[f"{p}.mlp.0.bias"] = (ffa,)
        shapes[f"{p}.mlp.2.weight"] = (ffa, td)
        shapes[f"{p}.mlp.2.bias"] = (td,)
    return shapes


def init_params(cfg: AnimaDiTConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    shapes = param_shapes(cfg)
    params: Params = {}
    keys = jax.random.split(key, len(shapes))
    for (name, shape), k in zip(sorted(shapes.items()), keys):
        if name.endswith(".bias"):
            params[name] = jnp.zeros(shape, dtype)
        elif name.endswith("norm.weight") and len(shape) == 1:
            params[name] = jnp.ones(shape, dtype)
        elif len(shape) == 1:
            params[name] = jnp.ones(shape, dtype)
        else:
            std = (1.0 / max(shape[0], 1)) ** 0.5
            params[name] = (jax.random.normal(k, shape, jnp.float32) * std
                            ).astype(dtype)
    return params


def params_from_torch_state(state: dict, cfg: AnimaDiTConfig,
                            dtype=jnp.float32) -> Params:
    """Torch-layout checkpoint tensors -> flat TPU param dict.

    2-D linear weights transpose to (in, out); embeddings and 1-D tensors
    pass through.  ``state`` keys must already be prefix-stripped (see
    ckpt/anima_checkpoint.strip_known_prefixes, mirroring loader.py:47-52).
    """
    shapes = param_shapes(cfg)
    params: Params = {}
    missing = []
    for name, want in shapes.items():
        if name not in state:
            missing.append(name)
            continue
        arr = jnp.asarray(state[name])
        if arr.ndim == 2 and not name.endswith("embed.weight"):
            arr = jnp.transpose(arr, (1, 0))
        if tuple(arr.shape) != tuple(want):
            raise ValueError(f"{name}: shape {arr.shape} != expected {want}")
        params[name] = arr.astype(dtype)
    if missing:
        raise ValueError(f"Anima checkpoint missing {len(missing)} tensors, "
                         f"e.g. {missing[:5]}")
    return params


def params_to_torch_state(params: Params) -> dict:
    """Inverse of :func:`params_from_torch_state` (for checkpoint save)."""
    out = {}
    for name, arr in params.items():
        if arr.ndim == 2 and not name.endswith("embed.weight"):
            arr = jnp.transpose(arr, (1, 0))
        out[name] = arr
    return out
