"""Weight layout conversion between torch checkpoints and TPU param dicts.

Torch stores conv kernels as (O, I, kH, kW) and linear weights as (out, in);
our UNet uses HWIO convs and (in, out) linears (NHWC compute).  These helpers
convert per-tensor given the param kind from ``arch.param_shapes``.

Loading a stock SDXL single-file checkpoint is:
SD key -> HF key (ckpt.sd_keys) -> layout transpose -> flat param dict.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ckpt.sd_keys import sd_to_hf_mapping, unet_key_mapping
from .arch import UNetConfig, hf_param_names, param_shapes

Params = dict[str, jax.Array]


def torch_to_tpu_layout(name: str, array, kind: str):
    """Convert one torch-layout tensor to TPU layout (jnp or numpy in/out)."""
    if name.endswith(".bias") or kind == "norm":
        return array
    if kind == "conv":
        return jnp.transpose(array, (2, 3, 1, 0))  # OIHW -> HWIO
    if kind == "linear":
        return jnp.transpose(array, (1, 0))        # (out,in) -> (in,out)
    return array


def tpu_to_torch_layout(name: str, array, kind: str):
    if name.endswith(".bias") or kind == "norm":
        return array
    if kind == "conv":
        return jnp.transpose(array, (3, 2, 0, 1))  # HWIO -> OIHW
    if kind == "linear":
        return jnp.transpose(array, (1, 0))
    return array


def params_from_sd_state(sd_tensors: dict, cfg: UNetConfig,
                         dtype=jnp.float32) -> Params:
    """Build the flat UNet param dict from an SD single-file tensor dict.

    ``sd_tensors`` maps ``model.diffusion_model.*`` keys (plus the rest of the
    checkpoint, which is ignored) to arrays in torch layout.
    """
    names = hf_param_names(cfg)
    kinds = {n: k for n, (_, k) in param_shapes(cfg).items()}
    expected = param_shapes(cfg)
    mapping = sd_to_hf_mapping(names)
    params: Params = {}
    missing = []
    for sd_key, hf_key in mapping.items():
        if sd_key not in sd_tensors:
            missing.append(sd_key)
            continue
        arr = jnp.asarray(sd_tensors[sd_key])
        arr = torch_to_tpu_layout(hf_key, arr, kinds[hf_key])
        want = expected[hf_key][0]
        if tuple(arr.shape) != tuple(want):
            raise ValueError(
                f"{hf_key}: checkpoint shape {tuple(arr.shape)} != expected {want}")
        params[hf_key] = arr.astype(dtype)
    if missing:
        raise ValueError(
            f"Checkpoint is missing {len(missing)} UNet tensors, e.g. {missing[:5]}")
    return params


def sd_state_from_params(params: Params, cfg: UNetConfig,
                         dtype=jnp.bfloat16) -> dict:
    """Flat param dict -> {sd_key: torch-layout array} for merge-back save."""
    kinds = {n: k for n, (_, k) in param_shapes(cfg).items()}
    mapping = unet_key_mapping(list(params.keys()))
    out = {}
    for hf_key, arr in params.items():
        sd_key = mapping[hf_key]
        out[sd_key] = tpu_to_torch_layout(hf_key, arr, kinds.get(hf_key, "norm")).astype(dtype)
    return out
