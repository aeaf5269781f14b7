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
    x, w = res
    # dx: full correlation of dy with the HW-flipped, IO-swapped kernel —
    # a plain forward-shaped conv, which XLA tiles well.
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
