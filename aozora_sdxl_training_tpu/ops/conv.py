"""3x3 conv with GEMM-decomposed backward for TPU.

The r2 trace attributes 61% of the SDXL step to conv/dot fusions at ~56%
MXU efficiency (tools_dev/trace_probe.py). XLA lowers the two backward
convs of a stride-1 3x3 NHWC conv as window-dilated convolutions; at
batch 1 the filter gradient ("wgrad", a [3,3,Cin,Cout] output contracted
over 16k spatial positions) is the classic TPU offender: the MXU tiling
for a conv whose *output* is the kernel is much worse than a plain GEMM
with K = B*H*W.

This module keeps the forward as ``lax.conv_general_dilated`` (XLA's
forward conv is fine) and swaps the backward for explicit MXU-friendly
contractions via ``jax.custom_vjp``:

- dx = conv(dy, flip_hw(W)^T): another stride-1 3x3 forward-style conv
  (IO-transposed, spatially flipped kernel) — same efficiency class as
  the forward pass.
- dW[ky,kx] = X_shift(ky,kx)^T @ dY: nine [B*H*W, Cin]^T x [B*H*W, Cout]
  GEMMs (K = B*H*W = 16384 at the 128x128 level), expressed as ONE
  dot_general over the 9 shifted views so XLA can tile/fuse it.

Reference behavior being accelerated: the reference trains its UNet convs
through cuDNN autotuned kernels (torch F.conv2d in
/root/reference/custom_models/unet.py); there is no CUDA-side analogue of
this decomposition — it exists because of how XLA/TPU schedules conv
transposes.

Correctness is pinned against ``jax.grad`` of the plain conv in
tests/test_conv_grad.py. Use is gated by ``AOZORA_CONV_BWD=gemm`` /
``unet_forward(..., conv_bwd="gemm")`` so e2e A/B follows the r2 rule:
only e2e timings decide (isolated microbenches mislead through the
tunnel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _conv_nhwc(x: jax.Array, w: jax.Array, *, stride: int = 1) -> jax.Array:
    kh, kw = w.shape[0], w.shape[1]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3_gemm_bwd(x: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-1 3x3 NHWC conv; backward uses GEMM-decomposed gradients."""
    return _conv_nhwc(x, w)


def _fwd(x, w):
    return _conv_nhwc(x, w), (x, w)


def _bwd(res, dy):
    import os
    x, w = res
    if os.environ.get("AOZORA_CONV_BWD", "gemm2").lower() == "gemm2":
        # dgrad as a 9-tap GEMM too.  The r2 trace shows the XLA dgrad
        # convs at the 64x64 level running at 31 TF/s (16% of v5e peak,
        # fusion.18293 et al — the HW-flip + IO-swap of the 14.7 MB kernel
        # is fused into the conv's weight load).  Expressing
        #   dx[p,q,ci] = sum_{ky,kx,co} dy[p+1-ky, q+1-kx, co] W[ky,kx,ci,co]
        # as one dot_general over 9 shifted dy views turns it into the
        # same big-K GEMM class as the forward.
        b, h, wd, cout = dy.shape
        cin = w.shape[2]
        dyp = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0)))
        # tap (ky,kx) of the kernel multiplies dy shifted by (1-ky, 1-kx):
        # padded index range [2-ky, 2-ky+h) x [2-kx, 2-kx+wd)
        taps = [dyp[:, 2 - ky:2 - ky + h, 2 - kx:2 - kx + wd, :]
                for ky in range(3) for kx in range(3)]
        dys = jnp.stack(taps, axis=0).reshape(9, b * h * wd, cout)
        w9 = w.astype(dy.dtype).reshape(9, cin, cout)
        # contract (tap, cout): [9, BHW, Cout] x [9, Cin, Cout] -> [BHW, Cin]
        dx = jax.lax.dot_general(
            dys, w9, (((0, 2), (0, 2)), ((), ())),
            preferred_element_type=jnp.float32)
        dx = dx.reshape(b, h, wd, cin)
    else:
        # dx: full correlation of dy with the HW-flipped, IO-swapped
        # kernel — a forward-shaped conv.
        w_t = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
        dx = _conv_nhwc(dy, w_t.astype(dy.dtype))

    # dW: nine shifted GEMMs expressed as one dot_general.
    # x padded once; the (ky, kx) tap of the kernel sees x shifted by
    # (ky-1, kx-1).  Stack the 9 views on a leading axis and contract
    # (B, H, W) in a single batched dot: [9, BHW, Cin]^T x [BHW, Cout].
    b, h, wd, cin = x.shape
    cout = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, ky:ky + h, kx:kx + wd, :]
            for ky in range(3) for kx in range(3)]
    xs = jnp.stack(taps, axis=0).reshape(9, b * h * wd, cin)
    dyf = dy.reshape(b * h * wd, cout)
    # dw9: [9, Cin, Cout]; contract over BHW (dim 1 of xs, dim 0 of dyf)
    dw9 = jax.lax.dot_general(
        xs, dyf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw = dw9.reshape(3, 3, cin, cout).astype(w.dtype)
    return dx.astype(x.dtype), dw


conv3x3_gemm_bwd.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# Stride-2 (downsampler) variant
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3_s2_gemm_bwd(x: jax.Array, w: jax.Array) -> jax.Array:
    """Stride-2 3x3 NHWC conv (pad 1, even H/W); backward uses
    GEMM-decomposed gradients.

    The r2 trace shows the XLA dgrad of the SDXL downsampler convs at
    ~32 TF/s (16% of v5e peak; e.g. the 128x128x640 dx at 3.75 ms/step).
    dgrad of a stride-2 conv is an input-dilated conv, which XLA tiles
    even worse than the stride-1 transpose; here it becomes four output
    phase grids, each a small sum of plain GEMMs:

      dx[2a+r, 2b+s] = sum_{taps in phase (r,s)} dy_shift @ W[tap]^T

    with phase (0,0) <- tap (1,1); (0,1) <- (1,0),(1,2); (1,0) <-
    (0,1),(2,1); (1,1) <- (0,0),(0,2),(2,0),(2,2).
    """
    return _conv_nhwc(x, w, stride=2)


def _s2_fwd(x, w):
    return _conv_nhwc(x, w, stride=2), (x, w)


def _s2_bwd(res, dy):
    x, w = res
    b, h, wd, cin = x.shape
    ho, wo, cout = dy.shape[1], dy.shape[2], dy.shape[3]
    wt = w.astype(dy.dtype)  # (3, 3, cin, cout)

    # dW: nine stride-2 tap views of padded x, one batched contraction.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [jax.lax.slice(xp, (0, ky, kx, 0),
                          (b, ky + 2 * ho - 1, kx + 2 * wo - 1, cin),
                          (1, 2, 2, 1))
            for ky in range(3) for kx in range(3)]
    xs = jnp.stack(taps, axis=0).reshape(9, b * ho * wo, cin)
    dyf = dy.reshape(b * ho * wo, cout)
    dw9 = jax.lax.dot_general(xs, dyf, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw = dw9.reshape(3, 3, cin, cout).astype(w.dtype)

    # dx: phase-decomposed GEMMs.  dy padded one at bottom/right for the
    # (a+1, b+1) shifts.
    dyp = jnp.pad(dy, ((0, 0), (0, 1), (0, 1), (0, 0)))

    def g(dya, ky, kx):  # dy_view @ W[ky,kx]^T -> (B, ho, wo, cin) f32
        return jax.lax.dot_general(
            dya.reshape(b * ho * wo, cout), wt[ky, kx],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(b, ho, wo, cin)

    d00 = dyp[:, :ho, :wo]          # dy[a, b]
    d01 = dyp[:, :ho, 1:wo + 1]     # dy[a, b+1]
    d10 = dyp[:, 1:ho + 1, :wo]     # dy[a+1, b]
    d11 = dyp[:, 1:ho + 1, 1:wo + 1]
    ph_ee = g(d00, 1, 1)
    ph_eo = g(d01, 1, 0) + g(d00, 1, 2)
    ph_oe = g(d10, 0, 1) + g(d00, 2, 1)
    ph_oo = g(d11, 0, 0) + g(d10, 0, 2) + g(d01, 2, 0) + g(d00, 2, 2)
    # interleave: dx[2a+r, 2b+s] = ph[r][s][a, b]
    dx = jnp.stack([jnp.stack([ph_ee, ph_eo], axis=3),
                    jnp.stack([ph_oe, ph_oo], axis=3)], axis=2)
    dx = dx.reshape(b, 2 * ho, 2 * wo, cin)[:, :h, :wd]
    return dx.astype(x.dtype), dw


conv3x3_s2_gemm_bwd.defvjp(_s2_fwd, _s2_bwd)
