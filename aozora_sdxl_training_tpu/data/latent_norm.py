"""Latent normalization for the VAE cache: scalar and flux_bn32 modes.

Parity target: /root/reference/train.py:1504-1595.

* ``scalar``: ``normalized = (mean - shift) * scale`` with shift/scale from
  config or the VAE's own factors; inverted as ``latents / scale + shift``.
* ``flux_bn32``: 32-channel latents pixel-shuffled into a 128-channel
  half-resolution layout, normalized by a *frozen* BatchNorm whose running
  stats are pulled out of a Flux VAE safetensors file (keys ending in
  ``bn.running_mean`` / ``bn.running_var``), then shuffled back.  eps 1e-4.

All math is numpy/jnp-agnostic (works on either array type).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

FLUX_BN_EPS = 1e-4
BN_MEAN_SUFFIXES = ("bn.running_mean", "normalize.bn.running_mean",
                    "normalize.running_mean")
BN_VAR_SUFFIXES = ("bn.running_var", "normalize.bn.running_var",
                   "normalize.running_var")


# --------------------------------------------------------------------------
# scalar mode
# --------------------------------------------------------------------------

def normalize_scalar(latents, shift, scale):
    scale = 1.0 if scale is None else float(scale)
    if shift is not None:
        return (latents - float(shift)) * scale
    return latents * scale


def denormalize_scalar(latents, shift, scale):
    scale = 1.0 if scale is None else float(scale)
    out = latents / scale
    if shift is not None:
        out = out + float(shift)
    return out


# --------------------------------------------------------------------------
# flux_bn32 layout + frozen BN
# --------------------------------------------------------------------------

def bn32_to_bn128_layout(latents):
    """NCHW [N,32,H,W] -> [N,128,H/2,W/2] 2x2 pixel-shuffle (train.py:1528-1539)."""
    n, c, h, w = latents.shape
    if c != 32:
        raise ValueError(f"flux_bn32 expects [N, 32, H, W], got {latents.shape}")
    if h % 2 or w % 2:
        raise ValueError(f"flux_bn32 requires even latent H/W, got {latents.shape}")
    x = latents.reshape(n, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, c * 4, h // 2, w // 2)


def bn128_to_bn32_layout(latents):
    n, c, h, w = latents.shape
    if c != 128:
        raise ValueError(f"expected [N, 128, H, W], got {latents.shape}")
    x = latents.reshape(n, c // 4, 2, 2, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, c // 4, h * 2, w * 2)


def apply_flux_bn32(latents, mean_128, var_128, eps: float = FLUX_BN_EPS):
    x = bn32_to_bn128_layout(latents)
    mean = np.asarray(mean_128, dtype=np.float32).reshape(1, -1, 1, 1)
    std = np.sqrt(np.asarray(var_128, dtype=np.float32).reshape(1, -1, 1, 1) + eps)
    x = (x - mean) / std
    return bn128_to_bn32_layout(x)


def invert_flux_bn32(latents, mean_128, var_128, eps: float = FLUX_BN_EPS):
    x = bn32_to_bn128_layout(latents)
    mean = np.asarray(mean_128, dtype=np.float32).reshape(1, -1, 1, 1)
    std = np.sqrt(np.asarray(var_128, dtype=np.float32).reshape(1, -1, 1, 1) + eps)
    return bn128_to_bn32_layout(x * std + mean)


def find_tensor_by_suffix(safetensors_path, suffixes):
    """Shortest key matching any suffix (train.py:1494-1502)."""
    from safetensors import safe_open
    with safe_open(str(safetensors_path), framework="numpy") as f:
        keys = list(f.keys())
        for suffix in suffixes:
            matches = [k for k in keys if k == suffix or k.endswith("." + suffix)]
            if matches:
                key = sorted(matches, key=len)[0]
                return np.asarray(f.get_tensor(key), dtype=np.float32), key
    return None, None


def extract_flux_bn_stats(safetensors_path) -> tuple[np.ndarray, np.ndarray]:
    mean, mean_key = find_tensor_by_suffix(safetensors_path, BN_MEAN_SUFFIXES)
    var, var_key = find_tensor_by_suffix(safetensors_path, BN_VAR_SUFFIXES)
    if mean is None or var is None:
        raise RuntimeError(
            f"Could not find Flux BN stats in {safetensors_path}. Expected keys "
            "ending with bn.running_mean and bn.running_var.")
    if mean.size != 128 or var.size != 128:
        raise RuntimeError(
            f"Flux BN stats wrong shape: mean={mean.shape}, var={var.shape}; "
            "expected 128 elements.")
    print(f"INFO: Loaded Flux VAE BN stats from {Path(safetensors_path).name}\n"
          f"      mean key: {mean_key}\n      var key:  {var_key}")
    return mean, var
