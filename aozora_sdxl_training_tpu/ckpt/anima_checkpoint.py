"""Anima checkpoint IO: prefix handling, component loading, streaming save.

Parity targets:
* >=80% prefix-stripping rule over (``pipe.dit.``, ``model.diffusion_model.``,
  ``diffusion_model.``, ``dit.``, ``net.``) — /root/reference/training_utils/
  anima/loader.py:47-52, 66-75;
* VAE key remap into ``model.*`` (loader.py:85-99);
* save-prefix auto-detection from the source checkpoint
  (train_anima.py:596-610) and streaming safetensors save with post-write
  verification (train_anima.py:1499-1656) — our writer verifies offsets and
  key sets by construction (ckpt/safetensors_io.verify_file).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .safetensors_io import load_all, write_streaming, is_requantizable_dtype

DIT_PREFIXES = ("pipe.dit.", "model.diffusion_model.", "diffusion_model.",
                "dit.", "net.")
TEXT_PREFIXES = ("text_encoder.", "model.text_encoder.")
VAE_PREFIXES = ("pipe.vae.", "vae.")


def strip_prefix(state: dict, prefixes) -> tuple[dict, str]:
    """Strip the first prefix covering >=80% of keys; returns (state, prefix)."""
    keys = tuple(state)
    for prefix in prefixes:
        if keys and sum(k.startswith(prefix) for k in keys) / len(keys) >= 0.8:
            return ({k[len(prefix):]: v for k, v in state.items()}, prefix)
    return state, ""


def load_dit_state(path) -> tuple[dict, str]:
    """Load + prefix-strip a DiT checkpoint; returns (state, detected_prefix)."""
    state = load_all(path)
    return strip_prefix(state, DIT_PREFIXES)


def load_text_encoder_state(path) -> dict:
    state = load_all(path)
    state, _ = strip_prefix(state, TEXT_PREFIXES)
    state.pop("lm_head.weight", None)
    return state


def load_vae_state(path) -> dict:
    """VAE tensors remapped under ``model.*`` (reference key convention)."""
    state = load_all(path)
    out = {}
    for key, value in state.items():
        for prefix in VAE_PREFIXES:
            if key.startswith(prefix):
                key = key[len(prefix):]
                break
        if not key.startswith("model."):
            key = f"model.{key}"
        out[key] = value
    return out


def resolve_save_prefix(config, detected_prefix: str) -> str:
    requested = str(getattr(config, "ANIMA_DIT_SAVE_PREFIX", "auto") or "auto")
    if requested.lower() == "auto":
        return detected_prefix
    if requested and not requested.endswith("."):
        requested += "."
    return requested


def save_dit_model(output_path, torch_state: dict, *, prefix: str = "",
                   dtype=None) -> None:
    """Write the DiT state dict (torch layout) with an optional key prefix."""
    import ml_dtypes
    output_path = Path(output_path)
    np_dtype = None
    if dtype is not None:
        import jax.numpy as jnp
        np_dtype = (np.dtype(ml_dtypes.bfloat16) if dtype == jnp.bfloat16
                    else np.dtype(np.float16) if dtype == jnp.float16
                    else np.dtype(np.float32))
    tensors = {}
    counts: dict = {}
    for name, arr in torch_state.items():
        host = np.asarray(arr)
        if np_dtype is not None and is_requantizable_dtype(host.dtype):
            host = host.astype(np_dtype)
        tensors[f"{prefix}{name}"] = host
        counts[str(host.dtype)] = counts.get(str(host.dtype), 0) + 1
    write_streaming(output_path, tensors)
    summary = ", ".join(f"{k}: {v}" for k, v in sorted(counts.items()))
    print(f"INFO: Saved DiT ({len(tensors)} tensors; {summary}) -> "
          f"{output_path.name}")
