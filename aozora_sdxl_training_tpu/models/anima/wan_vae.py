"""Wan-style causal-3D VAE encoder in JAX (image mode) + tiled encode.

Re-implementation of the reference's encode-only ``WanVideoVAE``
(/root/reference/training_utils/anima/models/vae_encoder.py): Encoder3d with
dim 96, z=16, mults [1,2,4,4], temporal downsample [F,T,T], channel-RMS
norms, single-head spatial attention in the middle, per-channel mean/std
normalization baked into the encode, and spatial tiled encode with ramped
blend masks (tile 96x96 latent, stride 72x72 => x8 pixels).

TPU design note — image mode: Anima image training encodes exactly one frame
(train_anima.py:740-751 unsqueezes T=1).  A causal 3D conv pads the time
axis with ``2*pad_t`` leading zeros, so with T=1 only the *last* temporal
kernel slice ever touches real data; every CausalConv3d collapses exactly to
a 2D conv with ``weight[:, :, -1]``.  The whole encoder therefore runs as
channel-last 2D convs on the MXU — no frame caching machinery needed.  (The
chunked cache in the reference exists to bound memory for videos; full-video
support lands with the video trainer.)

Weights load from checkpoints under the reference's ``model.encoder.*`` /
``model.conv1`` keys (loader.py:85-99 remap semantics).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, jax.Array]

# Wan2.x VAE per-channel latent statistics (vae_encoder.py:317-322)
LATENT_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
], np.float32)
LATENT_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
], np.float32)


@dataclass(frozen=True)
class WanVaeConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2

    @property
    def dims(self) -> list[int]:
        return [self.dim * u for u in (1,) + tuple(self.dim_mult)]


WAN_VAE = WanVaeConfig()
TINY_WAN_VAE = WanVaeConfig(dim=8, z_dim=4)


def _conv2d(params: Params, name: str, x: jax.Array, *, stride: int = 1,
            pad=None) -> jax.Array:
    kernel = params[f"{name}.weight"].astype(x.dtype)  # HWIO or THWIO
    if kernel.ndim == 5:  # full causal-3D kernel: last temporal slice (T=1)
        kernel = kernel[-1]
    kh, kw = kernel.shape[0], kernel.shape[1]
    if pad is None:
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bias = params.get(f"{name}.bias")
    return y if bias is None else y + bias.astype(y.dtype)


def _channel_rms_norm(params: Params, name: str, x: jax.Array,
                      eps: float = 1e-12) -> jax.Array:
    """F.normalize along channels * sqrt(C) * gamma (vae_encoder.py:44-59)."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    xf = xf / jnp.maximum(norm, eps) * (x.shape[-1] ** 0.5)
    gamma = params[f"{name}.gamma"].astype(jnp.float32)
    return (xf * gamma).astype(x.dtype)


def _residual_block(params: Params, prefix: str, x: jax.Array) -> jax.Array:
    if f"{prefix}.shortcut.weight" in params:
        identity = _conv2d(params, f"{prefix}.shortcut", x)
    else:
        identity = x
    h = _channel_rms_norm(params, f"{prefix}.residual.0", x)
    h = _conv2d(params, f"{prefix}.residual.2", jax.nn.silu(h))
    h = _channel_rms_norm(params, f"{prefix}.residual.3", h)
    h = _conv2d(params, f"{prefix}.residual.6", jax.nn.silu(h))
    return h + identity


def _attention_block(params: Params, prefix: str, x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    hidden = _channel_rms_norm(params, f"{prefix}.norm", x)
    qkv = _conv2d(params, f"{prefix}.to_qkv", hidden).reshape(b, h * w, 3 * c)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) * (c ** -0.5)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v).reshape(b, h, w, c)
    return _conv2d(params, f"{prefix}.proj", out) + x


def _downsample(params: Params, prefix: str, x: jax.Array) -> jax.Array:
    """ZeroPad2d(right=1, bottom=1) then 3x3 stride-2 valid conv."""
    return _conv2d(params, f"{prefix}.resample.1", x, stride=2,
                   pad=((0, 1), (0, 1)))


def encoder_layout(cfg: WanVaeConfig):
    """Ordered (kind, name, in_dim, out_dim) of model.encoder.downsamples."""
    layers = []
    dims = cfg.dims
    idx = 0
    for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
        d = in_dim
        for _ in range(cfg.num_res_blocks):
            layers.append(("res", f"downsamples.{idx}", d, out_dim))
            d = out_dim
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            layers.append(("down", f"downsamples.{idx}", out_dim, out_dim))
            idx += 1
    return layers


def encode_image(params: Params, pixels: jax.Array, *,
                 cfg: WanVaeConfig = WAN_VAE,
                 normalize: bool = True,
                 compute_dtype=jnp.float32) -> jax.Array:
    """pixels: (B, H, W, 3) in [-1, 1] -> normalized latents (B, H/8, W/8, z)."""
    x = pixels.astype(compute_dtype)
    x = _conv2d(params, "encoder.conv1", x)
    for kind, name, _, _ in encoder_layout(cfg):
        if kind == "res":
            x = _residual_block(params, f"encoder.{name}", x)
        else:
            x = _downsample(params, f"encoder.{name}", x)
    x = _residual_block(params, "encoder.middle.0", x)
    x = _attention_block(params, "encoder.middle.1", x)
    x = _residual_block(params, "encoder.middle.2", x)
    x = _channel_rms_norm(params, "encoder.head.0", x)
    x = _conv2d(params, "encoder.head.2", jax.nn.silu(x))
    x = _conv2d(params, "conv1", x)
    mu = x[..., : cfg.z_dim]
    if not normalize:
        return mu
    mean = jnp.asarray(LATENT_MEAN[: cfg.z_dim], mu.dtype)
    inv_std = jnp.asarray(1.0 / LATENT_STD[: cfg.z_dim], mu.dtype)
    return (mu - mean) * inv_std


# --------------------------------------------------------------------------
# Video mode: full causal-3D encode (B, T, H, W, C)
# --------------------------------------------------------------------------
#
# The reference streams videos in chunks of 4 frames with a 2-frame feature
# cache (vae_encoder.py:22-41, 293-304).  Run over the whole sequence, that
# streaming is mathematically identical to:
# * CausalConv3d k=3: conv over the full sequence with 2 leading zero frames;
# * downsample3d: spatial stride-2 conv per frame, then frame 0 passes
#   through while frames 1.. go through the temporal stride-2 conv with
#   windows (f0,f1,f2), (f2,f3,f4), ... (no padding).
# Full-sequence causal convs are the natural TPU formulation (one big conv
# instead of a frame-cache state machine), so that is what we implement.

def _causal_conv3d(params: Params, name: str, x: jax.Array, *,
                   temporal_stride: int = 1) -> jax.Array:
    """x: (B, T, H, W, C); kernel (kt, kh, kw, I, O) with causal temporal pad
    2*(kt//2) in front (CausalConv3d semantics, vae_encoder.py:22-41)."""
    kernel = params[f"{name}.weight"].astype(x.dtype)
    if kernel.ndim == 4:  # image-mode params: treat as kt=1
        kernel = kernel[None]
    kt, kh, kw = kernel.shape[0], kernel.shape[1], kernel.shape[2]
    pad = ((2 * (kt // 2), 0), (kh // 2, kh // 2), (kw // 2, kw // 2))
    y = jax.lax.conv_general_dilated(
        x, kernel, (temporal_stride, 1, 1), pad,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    bias = params.get(f"{name}.bias")
    return y if bias is None else y + bias.astype(y.dtype)


def _video_map_frames(fn, x: jax.Array) -> jax.Array:
    """Apply an image-space (B,H,W,C) function per frame of (B,T,H,W,C)."""
    b, t = x.shape[0], x.shape[1]
    y = fn(x.reshape((b * t,) + x.shape[2:]))
    return y.reshape((b, t) + y.shape[1:])


def _video_residual_block(params: Params, prefix: str, x: jax.Array) -> jax.Array:
    if f"{prefix}.shortcut.weight" in params:
        identity = _causal_conv3d(params, f"{prefix}.shortcut", x)
    else:
        identity = x
    h = _channel_rms_norm(params, f"{prefix}.residual.0", x)
    h = _causal_conv3d(params, f"{prefix}.residual.2", jax.nn.silu(h))
    h = _channel_rms_norm(params, f"{prefix}.residual.3", h)
    h = _causal_conv3d(params, f"{prefix}.residual.6", jax.nn.silu(h))
    return h + identity


def _video_downsample(params: Params, prefix: str, x: jax.Array,
                      temporal: bool) -> jax.Array:
    x = _video_map_frames(lambda f: _conv2d(params, f"{prefix}.resample.1", f,
                                            stride=2, pad=((0, 1), (0, 1))), x)
    if not temporal or x.shape[1] == 1:
        return x
    if f"{prefix}.time_conv.weight" not in params:
        raise ValueError(f"video encode needs {prefix}.time_conv weights "
                         "(checkpoint loaded in image mode?)")
    # frame 0 bypasses; remaining frames: stride-2 windows (f0,f1,f2), ...
    kernel = params[f"{prefix}.time_conv.weight"].astype(x.dtype)  # (kt,1,1,I,O)
    y = jax.lax.conv_general_dilated(
        x, kernel, (2, 1, 1), ((0, 0), (0, 0), (0, 0)),
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
    bias = params.get(f"{prefix}.time_conv.bias")
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return jnp.concatenate([x[:, :1], y], axis=1)


def encode_video(params: Params, video: jax.Array, *,
                 cfg: WanVaeConfig = WAN_VAE, normalize: bool = True,
                 compute_dtype=jnp.float32) -> jax.Array:
    """video: (B, T, H, W, 3) in [-1, 1], T = 1 + 4k ->
    (B, (T+3)//4, H/8, W/8, z) normalized latents."""
    temporal_flags = (False, True, True)  # _EncoderCore temperal_downsample
    x = video.astype(compute_dtype)
    x = _causal_conv3d(params, "encoder.conv1", x)
    down_index = 0
    for kind, name, _, _ in encoder_layout(cfg):
        if kind == "res":
            x = _video_residual_block(params, f"encoder.{name}", x)
        else:
            x = _video_downsample(params, f"encoder.{name}", x,
                                  temporal_flags[down_index])
            down_index += 1
    x = _video_residual_block(params, "encoder.middle.0", x)
    x = _video_map_frames(
        lambda f: _attention_block(params, "encoder.middle.1", f), x)
    x = _video_residual_block(params, "encoder.middle.2", x)
    x = _channel_rms_norm(params, "encoder.head.0", x)
    x = _causal_conv3d(params, "encoder.head.2", jax.nn.silu(x))
    x = _causal_conv3d(params, "conv1", x)
    mu = x[..., : cfg.z_dim]
    if not normalize:
        return mu
    mean = jnp.asarray(LATENT_MEAN[: cfg.z_dim], mu.dtype)
    inv_std = jnp.asarray(1.0 / LATENT_STD[: cfg.z_dim], mu.dtype)
    return (mu - mean) * inv_std


# --------------------------------------------------------------------------
# Tiled encode (spatial)
# --------------------------------------------------------------------------

def _axis_mask(length: int, lower: bool, upper: bool, border: int) -> np.ndarray:
    mask = np.ones(length, np.float32)
    if border > 0:
        ramp = (np.arange(border) + 1) / border
        if not lower:
            mask[:border] = ramp
        if not upper:
            mask[-border:] = ramp[::-1]
    return mask


def tile_tasks(height: int, width: int, tile_h: int, tile_w: int,
               stride_h: int, stride_w: int):
    """(top, bottom, left, right) pixel windows (vae_encoder.py:347-354)."""
    tasks = []
    for top in range(0, height, stride_h):
        if top >= stride_h and top - stride_h + tile_h >= height:
            continue
        for left in range(0, width, stride_w):
            if left >= stride_w and left - stride_w + tile_w >= width:
                continue
            tasks.append((top, top + tile_h, left, left + tile_w))
    return tasks


def encode_image_tiled(params: Params, pixels: np.ndarray, *,
                       cfg: WanVaeConfig = WAN_VAE,
                       tile_size=(96, 96), tile_stride=(72, 72),
                       encode_fn=None) -> np.ndarray:
    """Spatially tiled encode with ramped blend masks.

    pixels: (B, H, W, 3) numpy in [-1, 1]; tile_size/stride in *latent*
    units (x8 pixels), as configured by VAE_CACHING_TILE_SIZE.  ``encode_fn``
    (default: jitted :func:`encode_image`) is called per pixel tile, so XLA
    compiles one executable per distinct tile shape.
    """
    if encode_fn is None:
        # params as a jit argument (not a closure) so the weights are device
        # buffers, not HLO constants embedded per tile-shape executable
        dev_params = jax.device_put(params)
        _fn = jax.jit(lambda p, px: encode_image(p, px, cfg=cfg))
        encode_fn = lambda px: _fn(dev_params, px)
    b, height, width, _ = pixels.shape
    tile_h, tile_w = (t * 8 for t in tile_size)
    stride_h, stride_w = (s * 8 for s in tile_stride)
    border = ((tile_h - stride_h) // 8, (tile_w - stride_w) // 8)

    out_h, out_w = height // 8, width // 8
    values = np.zeros((b, out_h, out_w, cfg.z_dim), np.float32)
    weights = np.zeros((b, out_h, out_w, 1), np.float32)
    for top, bottom, left, right in tile_tasks(height, width, tile_h, tile_w,
                                               stride_h, stride_w):
        tile = pixels[:, top:min(bottom, height), left:min(right, width)]
        encoded = np.asarray(encode_fn(jnp.asarray(tile)), np.float32)
        mh = _axis_mask(encoded.shape[1], top == 0, bottom >= height, border[0])
        mw = _axis_mask(encoded.shape[2], left == 0, right >= width, border[1])
        mask = np.minimum(mh[:, None], mw[None, :])[None, :, :, None]
        ot, ol = top // 8, left // 8
        values[:, ot:ot + encoded.shape[1], ol:ol + encoded.shape[2]] += encoded * mask
        weights[:, ot:ot + encoded.shape[1], ol:ol + encoded.shape[2]] += mask
    return values / weights


# --------------------------------------------------------------------------
# Decoder (image mode) — TPU extension beyond the reference
# --------------------------------------------------------------------------
#
# The reference ships an encode-ONLY VAE (vae_encoder.py strips the decoder
# entirely), so Anima training can never render pixels.  This implements the
# Wan2.x ``Decoder3d`` half in image mode (T=1; causal kernels collapse to
# their last temporal slice exactly as in the encoder, see module docstring)
# for in-training preview sampling.  Layer naming is symmetric with the
# encoder keys the reference DOES ship (``decoder.conv1``,
# ``decoder.middle.{0,1,2}``, ``decoder.upsamples.N``, ``decoder.head.{0,2}``
# plus the 1x1 ``conv2`` post-quant conv); NOTE: no Wan checkpoint exists in
# this environment, so real-checkpoint loading is covered by the strict
# layout contract + synthetic round-trip tests only.

def decoder_layout(cfg: WanVaeConfig):
    """Ordered (kind, name, in_dim, out_dim) of ``model.decoder.upsamples``.

    Wan2.x Decoder3d: dims run [last, *reversed(dim_mult)]*dim; each stage
    has num_res_blocks+1 residual blocks then an upsample Resample (except
    the last stage).  The Resample conv HALVES channels, so stages after
    the first start at half their nominal input width."""
    mults = [cfg.dim_mult[-1]] + list(reversed(cfg.dim_mult))
    dims = [cfg.dim * m for m in mults]
    layers = []
    idx = 0
    n = len(cfg.dim_mult)
    for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
        if i > 0:
            in_dim //= 2  # the preceding Resample halved the channels
        d = in_dim
        for _ in range(cfg.num_res_blocks + 1):
            layers.append(("res", f"upsamples.{idx}", d, out_dim))
            d = out_dim
            idx += 1
        if i != n - 1:
            layers.append(("up", f"upsamples.{idx}", out_dim, out_dim // 2))
            idx += 1
    return layers


def _upsample_nearest_2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def decode_image(params: Params, latents: jax.Array, *,
                 cfg: WanVaeConfig = WAN_VAE, denormalize: bool = True,
                 compute_dtype=jnp.float32) -> jax.Array:
    """Normalized latents (B, H/8, W/8, z) -> pixels (B, H, W, 3) in [-1, 1]."""
    x = latents.astype(compute_dtype)
    if denormalize:
        mean = jnp.asarray(LATENT_MEAN[: cfg.z_dim], x.dtype)
        std = jnp.asarray(LATENT_STD[: cfg.z_dim], x.dtype)
        x = x * std + mean
    x = _conv2d(params, "conv2", x)
    x = _conv2d(params, "decoder.conv1", x)
    x = _residual_block(params, "decoder.middle.0", x)
    x = _attention_block(params, "decoder.middle.1", x)
    x = _residual_block(params, "decoder.middle.2", x)
    for kind, name, _, _ in decoder_layout(cfg):
        if kind == "res":
            x = _residual_block(params, f"decoder.{name}", x)
        else:
            # Resample upsample: nearest-2x then a channel-halving conv
            # (time_conv is skipped in image mode, mirroring the encoder)
            x = _conv2d(params, f"decoder.{name}.resample.1",
                        _upsample_nearest_2x(x))
    x = _channel_rms_norm(params, "decoder.head.0", x)
    x = _conv2d(params, "decoder.head.2", jax.nn.silu(x))
    return x


# --------------------------------------------------------------------------
# Video-mode decode (B, T', H/8, W/8, z) -> (B, T, H, W, 3)
# --------------------------------------------------------------------------
# Inverse of encode_video's frame arithmetic: each temporal-upsample stage's
# ``time_conv`` (C -> 2C causal conv) doubles frames 1.. by interleaving the
# two output halves per input frame, while frame 0 passes through — the
# mirror of the encoder's frame-0 bypass in _video_downsample — so
# T' = 1 + k latent frames decode to T = 1 + 4k pixel frames.  The reference
# strips the decoder entirely (no behavior to match); this follows Wan2.x's
# Decoder3d structure with the same full-sequence causal-conv formulation
# used for encode_video.

def _video_upsample(params: Params, prefix: str, x: jax.Array,
                    temporal: bool) -> jax.Array:
    if temporal and x.shape[1] > 1:
        if f"{prefix}.time_conv.weight" not in params:
            raise ValueError(f"video decode needs {prefix}.time_conv weights "
                             "(checkpoint loaded in image mode?)")
        kernel = params[f"{prefix}.time_conv.weight"].astype(x.dtype)
        kt = kernel.shape[0]
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1, 1), ((2 * (kt // 2), 0), (0, 0), (0, 0)),
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
        bias = params.get(f"{prefix}.time_conv.bias")
        if bias is not None:
            y = y + bias.astype(y.dtype)
        b, t, h, w, c2 = y.shape
        c = c2 // 2
        # (B,T,H,W,2C) -> interleave the two halves: frames (t,0),(t,1),...
        pairs = y.reshape(b, t, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5)
        doubled = pairs.reshape(b, 2 * t, h, w, c)
        # frame 0 bypasses (mirror of the encoder's stride-2 bypass):
        # keep x[0], then the doubled frames of inputs 1..
        x = jnp.concatenate([x[:, :1], doubled[:, 2:]], axis=1)
    return _video_map_frames(
        lambda f: _conv2d(params, f"{prefix}.resample.1",
                          _upsample_nearest_2x(f)), x)


def decode_video(params: Params, latents: jax.Array, *,
                 cfg: WanVaeConfig = WAN_VAE, denormalize: bool = True,
                 compute_dtype=jnp.float32) -> jax.Array:
    """Normalized latents (B, T', H/8, W/8, z) -> (B, 1+4(T'-1), H, W, 3)."""
    x = latents.astype(compute_dtype)
    if denormalize:
        mean = jnp.asarray(LATENT_MEAN[: cfg.z_dim], x.dtype)
        std = jnp.asarray(LATENT_STD[: cfg.z_dim], x.dtype)
        x = x * std + mean
    x = _causal_conv3d(params, "conv2", x)
    x = _causal_conv3d(params, "decoder.conv1", x)
    x = _video_residual_block(params, "decoder.middle.0", x)
    x = _video_map_frames(
        lambda f: _attention_block(params, "decoder.middle.1", f), x)
    x = _video_residual_block(params, "decoder.middle.2", x)
    # encoder temporally downsamples at stages (False, True, True); the
    # decoder mirrors in reverse: first two upsample stages are temporal
    temporal_flags = (True, True, False)
    up_index = 0
    for kind, name, _, _ in decoder_layout(cfg):
        if kind == "res":
            x = _video_residual_block(params, f"decoder.{name}", x)
        else:
            x = _video_upsample(params, f"decoder.{name}", x,
                                temporal_flags[up_index])
            up_index += 1
    x = _channel_rms_norm(params, "decoder.head.0", x)
    x = _causal_conv3d(params, "decoder.head.2", jax.nn.silu(x))
    return x


def decoder_param_shapes(cfg: WanVaeConfig, *,
                         video: bool = False) -> dict[str, tuple[int, ...]]:
    """Image-mode (HWIO) decoder parameter shapes, for init/tests.

    ``video=True`` adds the temporal-upsample ``time_conv`` kernels
    ((3,1,1,C,2C) causal convs) on the first two upsample stages."""
    mults = [cfg.dim_mult[-1]] + list(reversed(cfg.dim_mult))
    dims = [cfg.dim * m for m in mults]
    top = dims[0]
    shapes: dict[str, tuple[int, ...]] = {
        "conv2.weight": (1, 1, cfg.z_dim, cfg.z_dim),
        "conv2.bias": (cfg.z_dim,),
        "decoder.conv1.weight": (3, 3, cfg.z_dim, top),
        "decoder.conv1.bias": (top,),
    }
    for mid in ("middle.0", "middle.2"):
        p = f"decoder.{mid}"
        shapes[f"{p}.residual.0.gamma"] = (top,)
        shapes[f"{p}.residual.2.weight"] = (3, 3, top, top)
        shapes[f"{p}.residual.2.bias"] = (top,)
        shapes[f"{p}.residual.3.gamma"] = (top,)
        shapes[f"{p}.residual.6.weight"] = (3, 3, top, top)
        shapes[f"{p}.residual.6.bias"] = (top,)
    shapes["decoder.middle.1.norm.gamma"] = (top,)
    shapes["decoder.middle.1.to_qkv.weight"] = (1, 1, top, 3 * top)
    shapes["decoder.middle.1.to_qkv.bias"] = (3 * top,)
    shapes["decoder.middle.1.proj.weight"] = (1, 1, top, top)
    shapes["decoder.middle.1.proj.bias"] = (top,)
    out_dim = cfg.dim
    up_count = 0
    for kind, name, in_dim, out in decoder_layout(cfg):
        p = f"decoder.{name}"
        if kind == "res":
            shapes[f"{p}.residual.0.gamma"] = (in_dim,)
            shapes[f"{p}.residual.2.weight"] = (3, 3, in_dim, out)
            shapes[f"{p}.residual.2.bias"] = (out,)
            shapes[f"{p}.residual.3.gamma"] = (out,)
            shapes[f"{p}.residual.6.weight"] = (3, 3, out, out)
            shapes[f"{p}.residual.6.bias"] = (out,)
            if in_dim != out:
                shapes[f"{p}.shortcut.weight"] = (1, 1, in_dim, out)
                shapes[f"{p}.shortcut.bias"] = (out,)
        else:
            shapes[f"{p}.resample.1.weight"] = (3, 3, in_dim, out)
            shapes[f"{p}.resample.1.bias"] = (out,)
            if video and up_count < 2:   # temporal stages (True, True, False)
                shapes[f"{p}.time_conv.weight"] = (3, 1, 1, in_dim, 2 * in_dim)
                shapes[f"{p}.time_conv.bias"] = (2 * in_dim,)
            up_count += 1
        out_dim = out
    shapes["decoder.head.0.gamma"] = (out_dim,)
    shapes["decoder.head.2.weight"] = (3, 3, out_dim, 3)
    shapes["decoder.head.2.bias"] = (3,)
    return shapes


def init_decoder_params(cfg: WanVaeConfig, key: jax.Array,
                        dtype=jnp.float32, *, video: bool = False) -> Params:
    shapes = decoder_param_shapes(cfg, video=video)
    params: Params = {}
    keys = jax.random.split(key, len(shapes))
    for (name, shape), k in zip(sorted(shapes.items()), keys):
        if name.endswith(".bias"):
            params[name] = jnp.zeros(shape, dtype)
        elif name.endswith(".gamma"):
            params[name] = jnp.ones(shape, dtype)
        else:
            fan_in = int(np.prod(shape[:-1]))
            params[name] = (jax.random.normal(k, shape, jnp.float32)
                            * (1.0 / max(fan_in, 1)) ** 0.5).astype(dtype)
    return params


# --------------------------------------------------------------------------
# Loading
# --------------------------------------------------------------------------

def params_from_torch_state(state: dict, cfg: WanVaeConfig = WAN_VAE,
                            dtype=jnp.float32, *,
                            include_decoder: bool = False) -> Params:
    """Torch ``model.*`` keys -> image-mode param dict.

    Causal 3D conv kernels (O, I, kt, kh, kw) are kept in full as
    (kt, kh, kw, I, O) — the image path uses the last temporal slice (exact
    for single-frame inputs, see module docstring), the video path uses the
    full kernel.  2D convs transpose to HWIO; RMS-norm gammas squeeze their
    broadcast dims.  ``include_decoder`` also keeps ``decoder.*`` /
    ``conv2.*`` tensors (full Wan checkpoints carry them; the reference's
    stripped encode-only files do not).
    """
    prefixes = ("encoder.", "conv1.")
    if include_decoder:
        prefixes = prefixes + ("decoder.", "conv2.")
    params: Params = {}
    for key, value in state.items():
        if key.startswith("model."):
            key = key[len("model."):]
        if not key.startswith(prefixes):
            continue
        arr = jnp.asarray(value)
        if key.endswith(".gamma"):
            params[key] = arr.reshape(arr.shape[0]).astype(dtype)
        elif arr.ndim == 5:   # (O, I, kt, kh, kw) -> (kt, kh, kw, I, O)
            params[key] = jnp.transpose(arr, (2, 3, 4, 1, 0)).astype(dtype)
        elif arr.ndim == 4:   # 2D conv (O, I, kh, kw) -> HWIO
            params[key] = jnp.transpose(arr, (2, 3, 1, 0)).astype(dtype)
        else:
            params[key] = arr.astype(dtype)
    if "encoder.conv1.weight" not in params:
        raise ValueError("No Wan VAE encoder tensors found in checkpoint")
    return params


def detect_config(params: Params) -> WanVaeConfig:
    """Infer base width / z-dim from converted (image-mode) params.

    Mirrors qwen3.detect_config / the DiT shape detection so a
    non-standard-width VAE (or a tiny test model) encodes with the right
    latent normalization slice instead of WAN_VAE's.
    """
    dim = int(params["encoder.conv1.bias"].shape[0])
    z_dim = int(params["conv1.bias"].shape[0]) // 2
    return WanVaeConfig(dim=dim, z_dim=z_dim)


def param_shapes(cfg: WanVaeConfig, *,
                 video: bool = False) -> dict[str, tuple[int, ...]]:
    """Image-mode (HWIO) parameter shapes, for init/tests.

    ``video=True`` adds the causal temporal-downsample ``time_conv`` kernels
    ((kt,1,1,I,O), reference vae_encoder.py downsample3d) that
    :func:`encode_video` needs; a real Wan checkpoint always carries them."""
    shapes: dict[str, tuple[int, ...]] = {
        "encoder.conv1.weight": (3, 3, 3, cfg.dims[0]),
        "encoder.conv1.bias": (cfg.dims[0],),
    }
    temporal_flags = (False, True, True)  # _EncoderCore temperal_downsample
    down_index = 0
    for kind, name, in_dim, out_dim in encoder_layout(cfg):
        p = f"encoder.{name}"
        if kind == "res":
            shapes[f"{p}.residual.0.gamma"] = (in_dim,)
            shapes[f"{p}.residual.2.weight"] = (3, 3, in_dim, out_dim)
            shapes[f"{p}.residual.2.bias"] = (out_dim,)
            shapes[f"{p}.residual.3.gamma"] = (out_dim,)
            shapes[f"{p}.residual.6.weight"] = (3, 3, out_dim, out_dim)
            shapes[f"{p}.residual.6.bias"] = (out_dim,)
            if in_dim != out_dim:
                shapes[f"{p}.shortcut.weight"] = (1, 1, in_dim, out_dim)
                shapes[f"{p}.shortcut.bias"] = (out_dim,)
        else:
            shapes[f"{p}.resample.1.weight"] = (3, 3, out_dim, out_dim)
            shapes[f"{p}.resample.1.bias"] = (out_dim,)
            if video and temporal_flags[down_index]:
                shapes[f"{p}.time_conv.weight"] = (3, 1, 1, out_dim, out_dim)
                shapes[f"{p}.time_conv.bias"] = (out_dim,)
            down_index += 1
    top = cfg.dims[-1]
    for mid in ("middle.0", "middle.2"):
        p = f"encoder.{mid}"
        shapes[f"{p}.residual.0.gamma"] = (top,)
        shapes[f"{p}.residual.2.weight"] = (3, 3, top, top)
        shapes[f"{p}.residual.2.bias"] = (top,)
        shapes[f"{p}.residual.3.gamma"] = (top,)
        shapes[f"{p}.residual.6.weight"] = (3, 3, top, top)
        shapes[f"{p}.residual.6.bias"] = (top,)
    shapes["encoder.middle.1.norm.gamma"] = (top,)
    shapes["encoder.middle.1.to_qkv.weight"] = (1, 1, top, 3 * top)
    shapes["encoder.middle.1.to_qkv.bias"] = (3 * top,)
    shapes["encoder.middle.1.proj.weight"] = (1, 1, top, top)
    shapes["encoder.middle.1.proj.bias"] = (top,)
    shapes["encoder.head.0.gamma"] = (top,)
    shapes["encoder.head.2.weight"] = (3, 3, top, 2 * cfg.z_dim)
    shapes["encoder.head.2.bias"] = (2 * cfg.z_dim,)
    shapes["conv1.weight"] = (1, 1, 2 * cfg.z_dim, 2 * cfg.z_dim)
    shapes["conv1.bias"] = (2 * cfg.z_dim,)
    return shapes


def init_params(cfg: WanVaeConfig, key: jax.Array, dtype=jnp.float32, *,
                video: bool = False) -> Params:
    shapes = param_shapes(cfg, video=video)
    params: Params = {}
    keys = jax.random.split(key, len(shapes))
    for (name, shape), k in zip(sorted(shapes.items()), keys):
        if name.endswith(".bias"):
            params[name] = jnp.zeros(shape, dtype)
        elif name.endswith(".gamma"):
            params[name] = jnp.ones(shape, dtype)
        else:
            fan_in = int(np.prod(shape[:-1]))
            params[name] = (jax.random.normal(k, shape, jnp.float32)
                            * (1.0 / max(fan_in, 1)) ** 0.5).astype(dtype)
    return params
