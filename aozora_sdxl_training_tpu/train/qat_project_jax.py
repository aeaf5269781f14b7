"""In-jit QAT projection: quantize→dequantize round trips as pure jnp.

Value-space mirrors of the packed quantizers in ``tools/quantize.py``.  This
is the TPU-native replacement for the reference repair trainer's per-step
CPU error-feedback machinery (/root/reference/scripts/experimental/
train_anima_repair.py:1497-1645, FP16 residuals on host RAM): here the
residuals live on device (fp16 by default, sharded like their parameter),
and the whole project step — effective = w + residual, quantize to the
format's value grid, residual = effective − projected — runs as ONE jitted
XLA program right after the optimizer step.  No weight bytes cross the
host boundary until save time.

Numerics are kept bit-compatible with the numpy quantizers (same scale
clamps, same RNE rounding) so that re-quantizing the final device weights
on the host reproduces the exact packed codes; ``tests/test_qat_repair.py``
pins the equivalence per format.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F8_E4M3_MAX = 448.0
F8_E5M2_MAX = 57344.0
NVFP4_BLOCK = 16
E2M1_GRID = jnp.asarray([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], jnp.float32)


def _round_e2m1_magnitude(m: jax.Array) -> jax.Array:
    """RNE rounding of magnitudes in [0, 6] onto the e2m1 value grid.

    Tie handling matches IEEE round-half-to-even on the e2m1 mantissa bit
    (quantize.f32_to_e2m1_codes): at each midpoint the neighbour whose code
    is even wins, which is 'up' at 0.75 / 1.75 / 3.5 and 'down' elsewhere.
    """
    idx = ((m > 0.25).astype(jnp.int32) + (m >= 0.75) + (m > 1.25)
           + (m >= 1.75) + (m > 2.5) + (m >= 3.5) + (m > 5.0))
    return E2M1_GRID[idx]


def project_fp8(w: jax.Array, fp8_dtype) -> jax.Array:
    """Per-tensor absmax fp8 (quantize.quantize_scaled_fp8 round trip)."""
    fmax = F8_E4M3_MAX if fp8_dtype == jnp.float8_e4m3fn else F8_E5M2_MAX
    scale = jnp.maximum(jnp.abs(w).max() / fmax, 1e-12)
    codes = (w / scale).astype(fp8_dtype)
    return codes.astype(jnp.float32) * scale


def project_int8(w: jax.Array) -> jax.Array:
    """Per-output-row absmax/127 int8 (quantize.quantize_int8_tensorwise)."""
    if w.ndim >= 2:
        scale = jnp.maximum(jnp.abs(w).max(axis=1, keepdims=True) / 127.0,
                            1e-30)
    else:
        scale = jnp.maximum(jnp.abs(w).max() / 127.0, 1e-30)
    codes = jnp.clip(jnp.round(w / scale), -128, 127)
    return codes * scale


def project_ternary(w: jax.Array) -> jax.Array:
    """Per-output-row absmean ternary (quantize.quantize_ternary)."""
    scale = jnp.maximum(jnp.abs(w).mean(axis=1, keepdims=True), 1e-12)
    t = jnp.clip(jnp.round(w / scale), -1, 1)
    return t * scale


def project_nvfp4(w: jax.Array, scale_multiplier: float = 1.0) -> jax.Array:
    """Block-16 two-level NVFP4 (quantize.quantize_nvfp4 → dequantize_nvfp4).

    The fp8 block scales round through real float8_e4m3; reconstruction uses
    the *unclamped* per-tensor scale exactly like the host dequantizer.
    """
    out_f, in_f = w.shape
    per_tensor = jnp.abs(w).max() / (F8_E4M3_MAX * 6.0) * scale_multiplier
    per_tensor_div = jnp.maximum(per_tensor, 2.0 ** -126)
    xb = w.reshape(out_f, in_f // NVFP4_BLOCK, NVFP4_BLOCK)
    block_amax = jnp.abs(xb).max(axis=-1)
    scaled_fp8 = jnp.minimum(block_amax / 6.0 / per_tensor_div, F8_E4M3_MAX)
    fp8_rounded = scaled_fp8.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    total = per_tensor_div * fp8_rounded
    total_safe = jnp.where(total == 0, 1.0, total)
    data = jnp.where((total == 0)[..., None], 0.0, xb / total_safe[..., None])
    data = jnp.clip(data, -6.0, 6.0)
    vals = jnp.sign(data) * _round_e2m1_magnitude(jnp.abs(data))
    # host dequant multiplies by fp8_rounded * per_tensor (unclamped)
    return (vals * (fp8_rounded * per_tensor)[..., None]).reshape(out_f, in_f)


def project_weight(fmt: str, w: jax.Array,
                   scale_multiplier: float = 1.0) -> jax.Array:
    if fmt in ("float8_e4m3fn", "e4m3", "fp8_e4m3"):
        return project_fp8(w, jnp.float8_e4m3fn)
    if fmt in ("float8_e5m2", "e5m2", "fp8_e5m2"):
        return project_fp8(w, jnp.float8_e5m2)
    if fmt in ("int8_tensorwise", "int8"):
        return project_int8(w)
    if fmt in ("nvfp4", "fp4"):
        return project_nvfp4(w, scale_multiplier)
    if fmt in ("ternary_1_58", "ternary"):
        return project_ternary(w)
    raise ValueError(f"Unsupported quant format for in-jit projection: {fmt}")


def _needs_transpose(name: str, arr) -> bool:
    # JAX linear weights are (in, out); the quantizers (and the packed
    # checkpoint) use torch (out, in) rows.  Embeddings stay as-is.
    return getattr(arr, "ndim", 0) == 2 and not name.endswith("embed.weight")


def make_device_projector(formats: dict[str, str],
                          multipliers: dict[str, float] | None = None,
                          residual_dtype=jnp.float16):
    """(init_residuals, project) for in-jit error-feedback projection.

    ``formats`` maps torch-state weight names (which equal the JAX param
    names; only the 2-D layout differs) to quant format strings.

    * ``init_residuals(trainable) -> residuals`` — zero fp16 buffers, torch
      layout, only for controlled keys present in ``trainable``.
    * ``project(trainable, residuals) -> (trainable, residuals)`` — pure
      function, jit it with donated args; all math in fp32 on device.
    """
    multipliers = multipliers or {}

    def init_residuals(trainable):
        out = {}
        for key in formats:
            if key not in trainable:
                continue
            w = trainable[key]
            shape = (w.shape[::-1] if _needs_transpose(key, w) else w.shape)
            out[key] = jnp.zeros(shape, residual_dtype)
        return out

    def project(trainable, residuals):
        new_params = dict(trainable)
        new_res = dict(residuals)
        for key, fmt in formats.items():
            if key not in trainable:
                continue
            w = trainable[key]
            tw = w.T if _needs_transpose(key, w) else w
            eff = tw.astype(jnp.float32) + residuals[key].astype(jnp.float32)
            proj = project_weight(fmt, eff, multipliers.get(key, 1.0))
            new_res[key] = (eff - proj).astype(residual_dtype)
            back = proj.T if _needs_transpose(key, w) else proj
            new_params[key] = back.astype(w.dtype)
        return new_params, new_res

    return init_residuals, project
