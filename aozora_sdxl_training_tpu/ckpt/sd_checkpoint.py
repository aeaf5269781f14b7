"""SD single-file checkpoint load + trained-UNet merge-back save.

The reference's save path (/root/reference/train.py:2467-2513): load the
*base* checkpoint, cast float tensors to the compute dtype, overwrite the
UNet tensors under their SD names, write one stock SD-WebUI/ComfyUI-loadable
safetensors file.  This version streams the output (one tensor resident at a
time) through ``safetensors_io.write_streaming`` instead of building a 7 GB
dict + save_file.
"""

from __future__ import annotations

from pathlib import Path

import ml_dtypes
import numpy as np

from ..models.sdxl.arch import UNetConfig, param_shapes
from ..models.sdxl.conversion import tpu_to_torch_layout
from .safetensors_io import load_all, read_header, read_tensor
from .sd_keys import unet_key_mapping

_FLOAT_ST = {"F32", "F16", "BF16"}


def _np_dtype(compute_dtype) -> np.dtype:
    import jax.numpy as jnp
    if compute_dtype == jnp.bfloat16:
        return np.dtype(ml_dtypes.bfloat16)
    if compute_dtype == jnp.float16:
        return np.dtype(np.float16)
    return np.dtype(np.float32)


def load_sd_tensors(path, keys=None) -> dict:
    """Load checkpoint tensors as numpy (bf16 via ml_dtypes)."""
    return load_all(path, keys=keys)


def detect_unet_io_channels(path) -> tuple[int, int]:
    """(in_channels, out_channels) peeked from conv shapes
    (parity: train.py:1437-1455)."""
    in_ch, out_ch = 4, 4
    header = read_header(path)
    key_in = "model.diffusion_model.input_blocks.0.0.weight"
    key_out = "model.diffusion_model.out.2.weight"
    if key_in in header:
        in_ch = header[key_in]["shape"][1]
    if key_out in header:
        out_ch = header[key_out]["shape"][0]
    return in_ch, out_ch


def save_merged_checkpoint(output_path, params: dict, cfg: UNetConfig,
                           base_checkpoint_path, compute_dtype) -> None:
    """Merge trained UNet params into the base checkpoint and save.

    ``params``: full flat UNet param dict (TPU layout, any float dtype).
    Non-UNet tensors stream through from the base file, float ones cast to
    ``compute_dtype``.
    """
    output_path = Path(output_path)
    base_path = Path(base_checkpoint_path)
    out_np_dtype = _np_dtype(compute_dtype)

    kinds = {n: k for n, (_, k) in param_shapes(cfg).items()}
    hf_to_sd = unet_key_mapping(list(params.keys()))
    sd_from_params = {sd: hf for hf, sd in hf_to_sd.items()}

    base_header = read_header(base_path)
    print(f"INFO: Base checkpoint keys: {len(base_header)}")
    print(f"INFO: UNet keys to merge:   {len(hf_to_sd)}")

    tensors: dict = {}
    merged = 0
    new_keys = []

    def torch_shape(hf_key, shape):
        kind = kinds[hf_key]
        if hf_key.endswith(".bias") or kind == "norm" or len(shape) == 1:
            return tuple(shape)
        if kind == "conv":       # HWIO -> OIHW
            return (shape[3], shape[2], shape[0], shape[1])
        if kind == "linear":     # (in, out) -> (out, in)
            return (shape[1], shape[0])
        return tuple(shape)

    def unet_entry(hf_key):
        arr = params[hf_key]
        shape_t = torch_shape(hf_key, tuple(int(s) for s in arr.shape))

        def produce(hf_key=hf_key, arr=arr):
            host = np.asarray(arr)
            host = np.asarray(tpu_to_torch_layout(hf_key, host, kinds[hf_key]))
            return host.astype(out_np_dtype, copy=False)

        return (shape_t, out_np_dtype, produce)

    for sd_key in base_header:
        spec = base_header[sd_key]
        if sd_key in sd_from_params:
            tensors[sd_key] = unet_entry(sd_from_params[sd_key])
            merged += 1
        else:
            is_float = spec["dtype"] in _FLOAT_ST
            dt = out_np_dtype if is_float else None

            def produce(sd_key=sd_key, dt=dt):
                arr = read_tensor(base_path, sd_key)
                return arr.astype(dt, copy=False) if dt is not None else arr

            tensors[sd_key] = (tuple(spec["shape"]),
                               dt or numpy_dtype_from_st(spec["dtype"]), produce)

    # UNet keys absent from the base file get appended (reference behavior)
    for sd_key, hf_key in sd_from_params.items():
        if sd_key not in tensors:
            tensors[sd_key] = unet_entry(hf_key)
            new_keys.append(sd_key)
            merged += 1

    if new_keys:
        print(f"WARNING: {len(new_keys)} keys not found in base checkpoint "
              f"(new keys added): {new_keys[:5]}")

    from .safetensors_io import write_streaming
    write_streaming(output_path, tensors)
    print(f"INFO: Merged {merged} UNet tensors -> {output_path.name}")


def numpy_dtype_from_st(st_name: str):
    from .safetensors_io import numpy_dtype_for
    return numpy_dtype_for(st_name)
