"""SDXL VAE encoder in JAX (NHWC) — the latent-cache compute path.

Replaces the diffusers ``AutoencoderKL`` encode used for cache building
(/root/reference/train.py:1471-1492, 1852-1921).  Only the encoder half is
implemented (training never decodes); the deterministic ``latent_dist.mean``
— the first ``z`` channels after ``quant_conv`` — is what gets cached, same
as the reference.

Parameters load *directly* from SD single-file checkpoints
(``first_stage_model.encoder.*`` / ``first_stage_model.quant_conv``); keys
keep their SD names in the flat param dict, converted to HWIO layout.

Architecture (SD/SDXL KL-VAE encoder): conv_in, 4 down stages of 2 resnets
(channels 128/128/256/512/512 pattern) with asymmetric-padded stride-2
downsampling, mid resnet-attn-resnet (single-head spatial attention via 1x1
convs), GroupNorm+SiLU head, conv_out to 2*z channels, 1x1 quant_conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Params = dict[str, jax.Array]

VAE_PREFIX = "first_stage_model."


def _conv(params: Params, name: str, x: jax.Array, *, stride: int = 1,
          pad=None) -> jax.Array:
    kernel = params[f"{name}.weight"].astype(x.dtype)
    kh, kw = kernel.shape[0], kernel.shape[1]
    if pad is None:
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bias = params.get(f"{name}.bias")
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _group_norm(params: Params, name: str, x: jax.Array, *, groups: int = 32,
                eps: float = 1e-6) -> jax.Array:
    dt = x.dtype
    b, h, w, c = x.shape
    groups = min(groups, c)  # real SDXL channels are all >=128; tiny tests aren't
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    scale = params[f"{name}.weight"].astype(jnp.float32)
    bias = params[f"{name}.bias"].astype(jnp.float32)
    return (xf * scale + bias).astype(dt)


def _resnet(params: Params, prefix: str, x: jax.Array) -> jax.Array:
    h = _group_norm(params, f"{prefix}.norm1", x)
    h = _conv(params, f"{prefix}.conv1", jax.nn.silu(h))
    h = _group_norm(params, f"{prefix}.norm2", h)
    h = _conv(params, f"{prefix}.conv2", jax.nn.silu(h))
    if f"{prefix}.nin_shortcut.weight" in params:
        x = _conv(params, f"{prefix}.nin_shortcut", x)
    return x + h


def _mid_attention(params: Params, prefix: str, x: jax.Array,
                   attn_impl: str = "xla") -> jax.Array:
    """Single-head spatial self-attention with 1x1-conv projections.

    At 1024px the spatial sequence is 128x128 = 16384 tokens; the XLA
    path materializes a 16384^2 fp32 logit matrix (1.07 GB per image).
    ``attn_impl="flash"`` streams it through the Pallas kernel instead —
    measured throughput-neutral on v5e (encode is conv-dominated, and the
    batch-size ceiling is set by full-res conv activations), so XLA stays
    the default; the knob exists for bigger-chip / multi-image setups."""
    from ...ops.attention import attention
    b, h, w, c = x.shape
    hidden = _group_norm(params, f"{prefix}.norm", x)
    q = _conv(params, f"{prefix}.q", hidden).reshape(b, h * w, 1, c)
    k = _conv(params, f"{prefix}.k", hidden).reshape(b, h * w, 1, c)
    v = _conv(params, f"{prefix}.v", hidden).reshape(b, h * w, 1, c)
    out = attention(q, k, v, impl=attn_impl).reshape(b, h, w, c)
    out = _conv(params, f"{prefix}.proj_out", out)
    return x + out


def encoder_forward(params: Params, pixels: jax.Array, *,
                    num_down_blocks: int = 4,
                    layers_per_block: int = 2,
                    compute_dtype=jnp.float32,
                    attn_impl: str = "xla") -> jax.Array:
    """pixels: (B, H, W, 3) in [-1, 1] -> latent mean (B, H/8, W/8, z).

    Deterministic: returns the distribution mean (reference caches
    ``latent_dist.mean``, train.py:1875-1891).
    """
    x = pixels.astype(compute_dtype)
    x = _conv(params, "encoder.conv_in", x)
    for i in range(num_down_blocks):
        for j in range(layers_per_block):
            x = _resnet(params, f"encoder.down.{i}.block.{j}", x)
        if f"encoder.down.{i}.downsample.conv.weight" in params:
            # SD VAE downsample: asymmetric (0,1) pad then stride-2 valid conv
            x = _conv(params, f"encoder.down.{i}.downsample.conv", x,
                      stride=2, pad=((0, 1), (0, 1)))
    x = _resnet(params, "encoder.mid.block_1", x)
    x = _mid_attention(params, "encoder.mid.attn_1", x, attn_impl)
    x = _resnet(params, "encoder.mid.block_2", x)
    x = _group_norm(params, "encoder.norm_out", x)
    x = _conv(params, "encoder.conv_out", jax.nn.silu(x))
    x = _conv(params, "quant_conv", x)
    z2 = x.shape[-1]
    return x[..., : z2 // 2]  # mean half of the (mean, logvar) pair


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def decoder_forward(params: Params, latents: jax.Array, *,
                    num_up_blocks: int = 4,
                    layers_per_up_block: int = 3,
                    compute_dtype=jnp.float32,
                    attn_impl: str = "xla") -> jax.Array:
    """Raw (un-normalized) latents (B, H/8, W/8, z) -> pixels (B, H, W, 3)
    in [-1, 1].

    TPU extension beyond the reference (which never decodes — diffusers
    AutoencoderKL decode is unused in its training path): enables in-
    training preview sampling.  CompVis SD decoder layout: post_quant_conv,
    conv_in, mid (resnet/attn/resnet), up stages applied in REVERSED index
    order (up.3 first) with 3 resnets each and a nearest-2x + conv
    upsample on every stage except up.0, then norm/conv head.
    """
    x = latents.astype(compute_dtype)
    x = _conv(params, "post_quant_conv", x)
    x = _conv(params, "decoder.conv_in", x)
    x = _resnet(params, "decoder.mid.block_1", x)
    x = _mid_attention(params, "decoder.mid.attn_1", x, attn_impl)
    x = _resnet(params, "decoder.mid.block_2", x)
    for i in reversed(range(num_up_blocks)):
        for j in range(layers_per_up_block):
            x = _resnet(params, f"decoder.up.{i}.block.{j}", x)
        if f"decoder.up.{i}.upsample.conv.weight" in params:
            x = _conv(params, f"decoder.up.{i}.upsample.conv",
                      upsample_nearest_2x(x))
    x = _group_norm(params, "decoder.norm_out", x)
    x = _conv(params, "decoder.conv_out", jax.nn.silu(x))
    return x


def params_from_sd_state(sd_tensors: dict, dtype=jnp.float32, *,
                         include_decoder: bool = False) -> Params:
    """Extract+convert ``first_stage_model.*`` encoder tensors to NHWC
    layout (``include_decoder`` adds ``decoder.*`` + ``post_quant_conv``
    for preview sampling)."""
    prefixes = ("encoder.", "quant_conv")
    if include_decoder:
        prefixes = prefixes + ("decoder.", "post_quant_conv")
    params: Params = {}
    for key, value in sd_tensors.items():
        if not key.startswith(VAE_PREFIX):
            continue
        short = key[len(VAE_PREFIX):]
        if not short.startswith(prefixes):
            continue
        arr = jnp.asarray(value)
        if arr.ndim == 4:  # conv OIHW -> HWIO
            arr = jnp.transpose(arr, (2, 3, 1, 0))
        params[short] = arr.astype(dtype)
    if "encoder.conv_in.weight" not in params:
        raise ValueError("No first_stage_model encoder tensors found in checkpoint")
    if include_decoder and "decoder.conv_in.weight" not in params:
        raise ValueError("Checkpoint has no first_stage_model decoder tensors")
    return params


def detect_latent_channels(sd_tensors: dict) -> int | None:
    """Latent channel count from quant_conv (train.py:1474-1480)."""
    for key in ("first_stage_model.quant_conv.weight", "quant_conv.weight"):
        if key in sd_tensors:
            return int(sd_tensors[key].shape[0]) // 2
    return None
