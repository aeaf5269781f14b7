"""Functional SDXL UNet forward pass — TPU-native (NHWC, bf16, remat).

A from-scratch JAX implementation of the SDXL conditional UNet with the same
computation graph the reference trains through diffusers'
``UNet2DConditionModel`` (/root/reference/train.py:2760), re-designed for TPU:

* activations are NHWC (channels-last) so convs tile directly onto the MXU;
* parameters live in a flat ``{dotted_diffusers_name: array}`` dict in TPU
  layouts (conv HWIO, linear (in, out)) — see ``arch.py``;
* compute runs in a configurable dtype (bf16 by default) with fp32 GroupNorm
  statistics and fp32 softmax;
* gradient rematerialisation wraps each resnet/transformer unit
  (``jax.checkpoint``), mirroring ``unet.enable_gradient_checkpointing()``
  in the reference (train.py:2660) but under XLA's scheduling;
* attention dispatches through ``ops.attention`` (XLA einsum or the Pallas
  flash kernel).

Everything here is shape-static and jit-friendly; one compiled executable per
(batch, H, W) bucket shape.
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp

from ...ops.attention import attention
from .arch import UNetConfig

Params = dict[str, jax.Array]


# --------------------------------------------------------------------------
# Primitive layers
# --------------------------------------------------------------------------

def _w(params: Params, name: str, dtype) -> jax.Array:
    return params[name].astype(dtype)


def _conv_bwd_mode() -> str:
    import os
    # Default gemm2 since r4: the leave-one-out sweep attributed ~7.3 ms of
    # the combo win (0.2415 -> 0.2488 s/img when removed) to the
    # GEMM-decomposed conv backward.  AOZORA_CONV_BWD=xla restores the
    # window-dilated XLA transpose-conv gradients.
    return os.environ.get("AOZORA_CONV_BWD", "gemm2").lower()


def conv2d(params: Params, name: str, x: jax.Array, *, stride: int = 1) -> jax.Array:
    kernel = _w(params, f"{name}.weight", x.dtype)
    kh, kw = kernel.shape[0], kernel.shape[1]
    if kh == 3 and stride == 1 and _conv_bwd_mode() in ("gemm", "gemm2"):
        # GEMM-decomposed backward (ops/conv.py): dW as nine big-K GEMMs
        # instead of XLA's window-dilated conv transpose; "gemm2" also
        # GEMM-decomposes dgrad (the r2 trace's 31 TF/s offenders). A/B
        # knob for the conv-bound 61% of the step; e2e timing decides.
        from ...ops.conv import conv3x3_gemm_bwd
        y = conv3x3_gemm_bwd(x, kernel)
        bias = params.get(f"{name}.bias")
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    if kh == 3 and stride == 2 and _conv_bwd_mode() == "gemm2" \
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        # downsampler convs: phase-decomposed GEMM backward (ops/conv.py)
        from ...ops.conv import conv3x3_s2_gemm_bwd
        y = conv3x3_s2_gemm_bwd(x, kernel)
        bias = params.get(f"{name}.bias")
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    # Explicit torch-style symmetric padding: 3x3 -> 1, 1x1 -> 0. (XLA "SAME"
    # places odd padding on the high side at stride 2, which diverges from
    # the checkpoint's training-time conv semantics.)
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bias = params.get(f"{name}.bias")
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def linear(params: Params, name: str, x: jax.Array) -> jax.Array:
    y = jnp.dot(x, _w(params, f"{name}.weight", x.dtype))
    bias = params.get(f"{name}.bias")
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def group_norm(params: Params, name: str, x: jax.Array, *, groups: int,
               eps: float = 1e-5) -> jax.Array:
    """NHWC GroupNorm with fp32 statistics."""
    orig_dtype = x.dtype
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    scale = params[f"{name}.weight"].astype(jnp.float32)
    bias = params[f"{name}.bias"].astype(jnp.float32)
    return (xf * scale + bias).astype(orig_dtype)


def layer_norm(params: Params, name: str, x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    scale = params[f"{name}.weight"].astype(jnp.float32)
    bias = params[f"{name}.bias"].astype(jnp.float32)
    return (xf * scale + bias).astype(orig_dtype)


def timestep_embedding(timesteps: jax.Array, dim: int,
                       max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding, diffusers convention (flip_sin_to_cos=True,
    downscale_freq_shift=0): output = [cos | sin]. fp32."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


# --------------------------------------------------------------------------
# Blocks
# --------------------------------------------------------------------------

def _gn_silu(params: Params, name: str, x: jax.Array, groups: int,
             fused: bool) -> jax.Array:
    if fused:
        from ...ops.groupnorm_silu import group_norm_silu
        return group_norm_silu(x, params[f"{name}.weight"],
                               params[f"{name}.bias"], groups=groups)
    return jax.nn.silu(group_norm(params, name, x, groups=groups))


def resnet_block(params: Params, prefix: str, x: jax.Array, temb: jax.Array,
                 *, groups: int, fused_gn: bool = False) -> jax.Array:
    h = conv2d(params, f"{prefix}.conv1",
               _gn_silu(params, f"{prefix}.norm1", x, groups, fused_gn))
    t = linear(params, f"{prefix}.time_emb_proj", jax.nn.silu(temb))
    h = h + t[:, None, None, :].astype(h.dtype)
    h = conv2d(params, f"{prefix}.conv2",
               _gn_silu(params, f"{prefix}.norm2", h, groups, fused_gn))
    if f"{prefix}.conv_shortcut.weight" in params:
        x = conv2d(params, f"{prefix}.conv_shortcut", x)
    return x + h


def _attention_layer(params: Params, prefix: str, x: jax.Array,
                     context: jax.Array, num_heads: int, attn_impl: str) -> jax.Array:
    b, s, c = x.shape
    d = c // num_heads
    sk = context.shape[1]
    from ...ops.fused_proj import fused_linear, fused_qkv_enabled
    if fused_qkv_enabled() and context is x:
        q, k, v = fused_linear(
            params, [f"{prefix}.to_q", f"{prefix}.to_k", f"{prefix}.to_v"], x)
        q = q.reshape(b, s, num_heads, d)
        k = k.reshape(b, sk, num_heads, d)
        v = v.reshape(b, sk, num_heads, d)
    elif fused_qkv_enabled():
        q = linear(params, f"{prefix}.to_q", x).reshape(b, s, num_heads, d)
        k, v = fused_linear(
            params, [f"{prefix}.to_k", f"{prefix}.to_v"], context)
        k = k.reshape(b, sk, num_heads, d)
        v = v.reshape(b, sk, num_heads, d)
    else:
        q = linear(params, f"{prefix}.to_q", x).reshape(b, s, num_heads, d)
        k = linear(params, f"{prefix}.to_k", context).reshape(b, sk, num_heads, d)
        v = linear(params, f"{prefix}.to_v", context).reshape(b, sk, num_heads, d)
    o = attention(q, k, v, impl=attn_impl).reshape(b, s, c)
    return linear(params, f"{prefix}.to_out.0", o)


def _feed_forward(params: Params, prefix: str, x: jax.Array) -> jax.Array:
    h = linear(params, f"{prefix}.net.0.proj", x)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate, approximate=False)
    return linear(params, f"{prefix}.net.2", h)


def transformer_block(params: Params, prefix: str, x: jax.Array,
                      context: jax.Array, *, num_heads: int,
                      attn_impl: str) -> jax.Array:
    h = layer_norm(params, f"{prefix}.norm1", x)
    x = x + _attention_layer(params, f"{prefix}.attn1", h, h,
                             num_heads, attn_impl)
    x = x + _attention_layer(params, f"{prefix}.attn2",
                             layer_norm(params, f"{prefix}.norm2", x),
                             context, num_heads, attn_impl)
    x = x + _feed_forward(params, f"{prefix}.ff",
                          layer_norm(params, f"{prefix}.norm3", x))
    return x


def transformer2d(params: Params, prefix: str, x: jax.Array, context: jax.Array,
                  *, depth: int, num_heads: int, groups: int,
                  attn_impl: str) -> jax.Array:
    b, h, w, c = x.shape
    residual = x
    # diffusers Transformer2DModel uses GroupNorm eps=1e-6 (resnets use 1e-5)
    hidden = group_norm(params, f"{prefix}.norm", x, groups=groups, eps=1e-6)
    hidden = hidden.reshape(b, h * w, c)
    hidden = linear(params, f"{prefix}.proj_in", hidden)
    for k in range(depth):
        hidden = transformer_block(
            params, f"{prefix}.transformer_blocks.{k}", hidden, context,
            num_heads=num_heads, attn_impl=attn_impl)
    hidden = linear(params, f"{prefix}.proj_out", hidden)
    return hidden.reshape(b, h, w, c) + residual


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


# --------------------------------------------------------------------------
# Full forward
# --------------------------------------------------------------------------

def _dot_general_out_shape(lhs, rhs, dimension_numbers):
    (lc, rc), (lb, rb) = dimension_numbers
    batch = [lhs.shape[i] for i in lb]
    lfree = [lhs.shape[i] for i in range(len(lhs.shape))
             if i not in lc and i not in lb]
    rfree = [rhs.shape[i] for i in range(len(rhs.shape))
             if i not in rc and i not in rb]
    return tuple(batch + lfree + rfree)


def dots_except_attention_logits(prim, *args, **params):
    """Remat policy: save every MXU output EXCEPT large square (seq x seq)
    dot outputs — the attention logit matrices.

    Plain ``checkpoint_dots`` keeps the O(S^2) logits resident, which is
    what pushes full-SDXL-at-1024px out of 16 GB (measured: 440 MB over);
    everything else it saves is O(S*d) and cheap.  Refusing just the big
    square dots keeps the recompute limited to softmax+logits while the
    conv/projection outputs stay saved.

    Flash-attention outputs (named "flash_out"/"flash_lse",
    ops/flash_attention.py) are saved too: they are O(S*d), and keeping
    them means the flash backward goes straight to its dq/dkv kernels
    instead of re-running the forward kernel under remat.
    """
    from jax._src.ad_checkpoint import name_p
    if prim is name_p:
        return params.get("name") in ("flash_out", "flash_lse")
    if prim is not jax.lax.dot_general_p:
        return jax.checkpoint_policies.dots_saveable(prim, *args, **params)
    lhs, rhs = args[:2]
    try:
        shape = _dot_general_out_shape(lhs, rhs, params["dimension_numbers"])
    except Exception:  # noqa: BLE001 — unknown aval layout: fall back to save
        return True
    big_square = (len(shape) >= 2 and shape[-1] == shape[-2]
                  and shape[-1] * shape[-2] >= (1 << 20))
    return not big_square


def _maybe_remat(fn: Callable, mode) -> Callable:
    """mode: False/None = no remat; True/'full' = recompute everything;
    'dots' = save MXU outputs (jax.checkpoint_policies.checkpoint_dots) —
    less recompute at higher HBM cost; 'dots_no_logits' = dots minus the
    O(S^2) attention logits (fits full SDXL at 1024px where 'dots' OOMs)."""
    if not mode:
        return fn
    policy = None
    if mode == "dots":
        policy = jax.checkpoint_policies.checkpoint_dots
    elif mode == "dots_no_batch":
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    elif mode == "dots_no_logits":
        policy = dots_except_attention_logits
    # arg 1 is the dotted param-name prefix (a static string)
    return jax.checkpoint(fn, static_argnums=(1,), policy=policy)


def unet_forward(params: Params,
                 sample: jax.Array,
                 timesteps: jax.Array,
                 encoder_hidden_states: jax.Array,
                 pooled_text_embeds: jax.Array,
                 time_ids: jax.Array,
                 *,
                 cfg: UNetConfig,
                 attn_impl: str = "xla",
                 compute_dtype=jnp.bfloat16,
                 remat: bool = False,
                 remat_thresholds: tuple | None = None,
                 fused_gn: bool = False) -> jax.Array:
    """SDXL UNet forward.

    sample: (B, H, W, C_in) NHWC latents.
    timesteps: (B,) float or int.
    encoder_hidden_states: (B, L, cross_attention_dim).
    pooled_text_embeds: (B, pooled_projection_dim).
    time_ids: (B, 6) SDXL micro-conditioning ids.
    Returns (B, H, W, C_out).
    """
    groups = cfg.norm_num_groups
    x = sample.astype(compute_dtype)
    context = encoder_hidden_states.astype(compute_dtype)

    # -- time + added conditioning (fp32 math, then cast) --
    temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
    temb = linear(params, "time_embedding.linear_1", temb)
    temb = linear(params, "time_embedding.linear_2", jax.nn.silu(temb))

    b = time_ids.shape[0]
    add_t = timestep_embedding(time_ids.reshape(-1), cfg.addition_time_embed_dim)
    add_t = add_t.reshape(b, cfg.num_time_ids * cfg.addition_time_embed_dim)
    add_emb = jnp.concatenate(
        [pooled_text_embeds.astype(jnp.float32), add_t], axis=-1)
    add_emb = linear(params, "add_embedding.linear_1", add_emb)
    add_emb = linear(params, "add_embedding.linear_2", jax.nn.silu(add_emb))
    temb = (temb + add_emb).astype(compute_dtype)

    # "<mode>_hires": rematerialize only the high-resolution units (where
    # activations are big); low-res units (<= 32x32 latent tokens at 1024px)
    # keep everything resident — their memory is small and skipping the
    # recompute is pure speed
    hires_only = isinstance(remat, str) and remat.endswith("_hires")
    base_remat = remat[: -len("_hires")] if hires_only else remat
    # units below this token count keep all activations resident
    # (AOZORA_REMAT_HIRES_TOKENS tunes the speed/HBM trade; default 4160
    # keeps the 32x32 AND 64x64 levels resident at 1024px — the r2-measured
    # optimum with the flash kernel at the 64x64 level: 266.5 ms/step on
    # v5e-1 vs 304.9 with only 32x32 resident.  The 64x64 level resident
    # with XLA attention would store O(S^2) bf16 probs; with the flash
    # kernel only (out, lse) — use attn_impl="flash" alongside this mode)
    import os
    hires_tokens = int(os.environ.get("AOZORA_REMAT_HIRES_TOKENS",
                                      str(4160)))
    # Third tier (r4, VERDICT r3 #5): units at or above ``full_tokens``
    # get FULL remat (save nothing).  At big buckets (1536px: 36864-token
    # top level) the dot saves of the highest-resolution resnets are what
    # pushed the hires policy 132 MB past the 16 GB budget; recomputing
    # just that level is a ~1 GB saving for a small recompute (level-0 has
    # no attention, only cheap wide convs).  ``remat_thresholds`` is set by
    # the memory planner; the env vars remain dev/probe overrides.
    full_env = os.environ.get("AOZORA_REMAT_FULL_TOKENS", "").strip()
    full_tokens = int(full_env) if full_env else None
    if remat_thresholds is not None:
        hires_tokens, full_tokens = remat_thresholds

    def unit_remat(h):
        tokens = h.shape[1] * h.shape[2]
        if hires_only:
            if full_tokens is not None and tokens >= int(full_tokens):
                return True
            if tokens < hires_tokens:
                return False
        return base_remat

    def res_fn(p, prefix, h, t):
        fn = _maybe_remat(
            functools.partial(resnet_block, groups=groups, fused_gn=fused_gn),
            unit_remat(h))
        return fn(p, prefix, h, t)

    def tf2d_fn(p, prefix, h, ctx, depth, heads):
        fn = _maybe_remat(
            functools.partial(transformer2d, depth=depth, num_heads=heads,
                              groups=groups, attn_impl=attn_impl),
            unit_remat(h))
        return fn(p, prefix, h, ctx)

    # -- down path --
    x = conv2d(params, "conv_in", x)
    skips = [x]
    for i in range(cfg.num_blocks):
        for j in range(cfg.layers_per_block):
            x = res_fn(params, f"down_blocks.{i}.resnets.{j}", x, temb)
            if cfg.has_cross_attn(i):
                x = tf2d_fn(params, f"down_blocks.{i}.attentions.{j}", x,
                            context, cfg.transformer_layers[i], cfg.num_heads[i])
            skips.append(x)
        if i < cfg.num_blocks - 1:
            x = conv2d(params, f"down_blocks.{i}.downsamplers.0.conv", x, stride=2)
            skips.append(x)

    # -- mid --
    x = res_fn(params, "mid_block.resnets.0", x, temb)
    x = tf2d_fn(params, "mid_block.attentions.0", x, context,
                cfg.mid_transformer_layers, cfg.num_heads[-1])
    x = res_fn(params, "mid_block.resnets.1", x, temb)

    # -- up path --
    rev_layers = list(reversed(cfg.transformer_layers))
    rev_heads = list(reversed(cfg.num_heads))
    for i in range(cfg.num_blocks):
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = res_fn(params, f"up_blocks.{i}.resnets.{j}", x, temb)
            if rev_layers[i] > 0:
                x = tf2d_fn(params, f"up_blocks.{i}.attentions.{j}", x,
                            context, rev_layers[i], rev_heads[i])
        if i < cfg.num_blocks - 1:
            x = upsample_nearest_2x(x)
            x = conv2d(params, f"up_blocks.{i}.upsamplers.0.conv", x)

    # -- out --
    x = group_norm(params, "conv_norm_out", x, groups=groups)
    x = conv2d(params, "conv_out", jax.nn.silu(x))
    return x


def init_params(cfg: UNetConfig, key: jax.Array,
                dtype=jnp.float32) -> Params:
    """Random init with correct shapes (testing / from-scratch training)."""
    from .arch import param_shapes
    shapes = param_shapes(cfg)
    params: Params = {}
    keys = jax.random.split(key, len(shapes))
    for (name, (shape, kind)), k in zip(sorted(shapes.items()), keys):
        if name.endswith(".bias"):
            params[name] = jnp.zeros(shape, dtype)
        elif kind == "norm":
            params[name] = jnp.ones(shape, dtype)
        else:
            fan_in = int(jnp.prod(jnp.array(shape[:-1]))) if len(shape) > 1 else shape[0]
            std = (1.0 / max(fan_in, 1)) ** 0.5
            params[name] = (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)
    return params


def count_params(params: Params) -> int:
    return sum(int(p.size) for p in params.values())
