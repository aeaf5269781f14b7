"""Fused GroupNorm+SiLU Pallas kernel (NHWC).

The UNet's resnet prologue is ``silu(group_norm(x))`` — a memory-bound
elementwise+reduction pair (BASELINE.json names fused conv+GroupNorm+SiLU as
a target kernel).  This kernel runs the canonical two-phase schedule in one
``pallas_call``: phase 0 streams H-tiles accumulating per-group sum/sumsq in
VMEM scratch; phase 1 re-streams the tiles applying normalize+affine+SiLU —
one kernel launch, fp32 statistics, no intermediate HBM tensor between norm
and activation.

Used behind ``group_norm_silu`` which falls back to the XLA composition on
CPU or when shapes don't tile (C must be lane-aligned per group).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, scale_ref, bias_ref, o_ref, sum_ref, sq_ref, *,
            groups: int, eps: float, hw_total: int, num_tiles: int):
    phase = pl.program_id(1)
    it = pl.program_id(2)

    @pl.when(jnp.logical_and(phase == 0, it == 0))
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    x = x_ref[0].astype(jnp.float32)          # (TILE_HW, C)
    c = x.shape[-1]
    per_group = c // groups

    @pl.when(phase == 0)
    def _():
        xg = x.reshape(x.shape[0], groups, per_group)
        sum_ref[:] += jnp.sum(xg, axis=(0, 2))[None, :]
        sq_ref[:] += jnp.sum(xg * xg, axis=(0, 2))[None, :]

    @pl.when(phase == 1)
    def _():
        n = hw_total * per_group
        mean = sum_ref[0] / n                                  # (groups,)
        var = sq_ref[0] / n - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        # expand per-group stats to per-channel via broadcast+reshape
        # (jnp.repeat lowers to scatter, which Mosaic can't compile)
        mean_c = jnp.broadcast_to(mean[:, None], (groups, per_group)).reshape(c)
        inv_c = jnp.broadcast_to(inv[:, None], (groups, per_group)).reshape(c)
        y = (x - mean_c[None, :]) * inv_c[None, :]
        y = y * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def group_norm_silu_pallas(x: jax.Array, scale: jax.Array, bias: jax.Array,
                           *, groups: int, eps: float = 1e-5,
                           tile_hw: int = 512,
                           interpret: bool = False) -> jax.Array:
    """x: (B, H, W, C) -> silu(affine(group_norm(x))); one fused kernel."""
    b, h, w, c = x.shape
    hw = h * w
    x2 = x.reshape(b, hw, c)
    if hw % tile_hw:
        tile_hw = hw  # small inputs: single tile
    num_tiles = hw // tile_hw

    kernel = functools.partial(_kernel, groups=groups, eps=eps, hw_total=hw,
                               num_tiles=num_tiles)
    out = pl.pallas_call(
        kernel,
        grid=(b, 2, num_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_hw, c), lambda ib, ph, it: (ib, it, 0)),
            pl.BlockSpec((1, c), lambda ib, ph, it: (0, 0)),
            pl.BlockSpec((1, c), lambda ib, ph, it: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_hw, c), lambda ib, ph, it: (ib, it, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, groups), jnp.float32),
            pltpu.VMEM((1, groups), jnp.float32),
        ],
        interpret=interpret,
    )(x2, scale[None], bias[None])
    return out.reshape(b, h, w, c)


def _xla_reference(x, scale, bias, groups, eps):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused(x, scale, bias, groups, eps):
    return group_norm_silu_pallas(x, scale, bias, groups=groups, eps=eps,
                                  interpret=jax.default_backend() == "cpu")


def _fused_fwd(x, scale, bias, groups, eps):
    return _fused(x, scale, bias, groups, eps), (x, scale, bias)


def _fused_bwd(groups, eps, res, g):
    """Backward of silu(affine(group_norm(x))) — plain-XLA math (the forward
    fusion is the memory win; the backward matches the unfused cost)."""
    x, scale, bias = res
    b, h, w, c = x.shape
    per_group = c // groups
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, per_group)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = ((xf - mean) * inv)                         # (b, hw, g, pg)
    xhat_c = xhat.reshape(b, h, w, c)
    z = xhat_c * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    sig = jax.nn.sigmoid(z)
    dz = g.astype(jnp.float32) * sig * (1.0 + z * (1.0 - sig))
    dscale = jnp.sum(dz * xhat_c, axis=(0, 1, 2))
    dbias = jnp.sum(dz, axis=(0, 1, 2))
    dxhat = (dz * scale.astype(jnp.float32)).reshape(b, h * w, groups, per_group)
    m1 = dxhat.mean(axis=(1, 3), keepdims=True)
    m2 = (dxhat * xhat).mean(axis=(1, 3), keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * inv
    return (dx.reshape(b, h, w, c).astype(x.dtype),
            dscale.astype(scale.dtype), dbias.astype(bias.dtype))


_fused.defvjp(_fused_fwd, _fused_bwd)


def group_norm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array, *,
                    groups: int, eps: float = 1e-5,
                    use_pallas: bool | None = None) -> jax.Array:
    """Fused GN+SiLU; differentiable.

    Default is the XLA composition: measured on v5e, XLA already fuses the
    normalize+affine+SiLU epilogue, and Mosaic cannot lower the per-group ->
    per-channel stat expansion ("unsupported shape cast") without either a
    cross-lane reshape or a per-channel accumulation that erases the win.
    The Pallas kernel stays available (interpret-verified) as the starting
    point for a future conv-epilogue fusion where the bandwidth saving is
    real.

    r3 trace evidence closes the question: the r2 SDXL step's HLO stats
    show XLA's forward conv fusions ALREADY absorb the GroupNorm stats and
    epilogue (tuple-output "convolution fusion" rows producing
    (bias, mean, var, conv) at 176-187 TF/s = ~90% of v5e peak), so a
    hand-written conv+GN epilogue has no bandwidth left to save on the
    forward path.  The real conv-frontier offenders were the backward
    convs and the S=1024 XLA attention — addressed by AOZORA_CONV_BWD=gemm2
    (ops/conv.py) and the flash-attention dispatch threshold instead.
    """
    if use_pallas:
        return _fused(x, scale, bias, groups, eps)
    return _xla_reference(x, scale, bias, groups, eps)
