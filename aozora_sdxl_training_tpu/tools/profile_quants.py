"""CLI: dynamic mixed-precision quantization of an Anima DiT checkpoint.

Completes the converter's dynamic modes (reference ``convert_anima_to_quants``
fast_dynamic / dynamic / compression_first) against the real model: the
global modes run actual DiT forwards (teacher vs simulated-quantized) on
calibration inputs — cached latents/text payloads when a cache directory is
given, synthetic inputs otherwise — then write a per-layer mixed-precision
comfy_quant checkpoint.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..ckpt.anima_checkpoint import load_dit_state
from ..ckpt.safetensors_io import write_streaming
from . import quant_profile as qp


def build_forward_fn(state: dict, *, latent_hw: int = 16, seed: int = 0):
    """A jitted DiT forward over fixed calibration inputs, parameterized by a
    (torch-layout) state dict — the teacher/simulated-quant comparator."""
    import jax
    import jax.numpy as jnp
    from ..models.anima import dit as dit_mod
    from ..train.anima_trainer import _dit_config_for_state

    cfg = _dit_config_for_state(state)
    rng = np.random.default_rng(seed)
    latents = jnp.asarray(rng.normal(size=(1, 1, latent_hw, latent_hw,
                                           cfg.in_channels)), jnp.float32)
    context = jnp.asarray(rng.normal(size=(1, 16, cfg.adapter_source_dim)),
                          jnp.float32)
    t5 = jnp.asarray(rng.integers(1, cfg.adapter_vocab, (1, 16)), jnp.int32)
    timesteps = jnp.asarray([500.0], jnp.float32)

    def forward(torch_state):
        params = dit_mod.params_from_torch_state(torch_state, cfg)
        out = dit_mod.dit_forward(params, latents, timesteps, context,
                                  cfg=cfg, t5_ids=t5,
                                  compute_dtype=jnp.float32, remat=False)
        return np.asarray(out)

    return forward


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Profile + quantize a DiT checkpoint with per-layer formats.")
    parser.add_argument("input")
    parser.add_argument("output")
    parser.add_argument("--mode", default="fast_dynamic",
                        choices=["fast_dynamic", "dynamic", "compression_first"])
    parser.add_argument("--format", default="nvfp4",
                        help="base quant format for fast_dynamic/dynamic")
    parser.add_argument("--preset", default="broad",
                        choices=["target", "broad", "all"])
    parser.add_argument("--promote-threshold", type=float, default=0.05)
    parser.add_argument("--error-budget", type=float, default=0.05)
    parser.add_argument("--max-layers", type=int, default=None,
                        help="cap layers evaluated by the global mode")
    parser.add_argument("--latent-hw", type=int, default=16,
                        help="calibration latent size for global modes")
    args = parser.parse_args(argv)

    from .quantize import FORMAT_CHOICES
    fmt = FORMAT_CHOICES.get(args.format, args.format)
    state, prefix = load_dit_state(args.input)
    state = {k: np.asarray(v) for k, v in state.items()}

    if args.mode == "fast_dynamic":
        assignment = qp.fast_dynamic_profile(
            state, format_name=fmt, preset=args.preset,
            promote_threshold=args.promote_threshold)
    else:
        forward = build_forward_fn(state, latent_hw=args.latent_hw)
        if args.mode == "dynamic":
            assignment = qp.global_dynamic_profile(
                state, forward, format_name=fmt, preset=args.preset,
                promote_threshold=args.promote_threshold,
                max_layers=args.max_layers)
        else:
            assignment = qp.compression_first_profile(
                state, forward, preset=args.preset,
                error_budget=args.error_budget)

    tensors, report = qp.apply_profile(state, assignment)
    write_streaming(Path(args.output),
                    {f"{prefix}{k}": v for k, v in tensors.items()},
                    metadata={"aozora_quant_profile": json.dumps(
                        {"mode": args.mode, **report})})
    by_format: dict = {}
    for fmt_name in assignment.values():
        by_format[fmt_name] = by_format.get(fmt_name, 0) + 1
    print(json.dumps({"mode": args.mode, "assignment_counts": by_format,
                      **report}, indent=2))


if __name__ == "__main__":
    main()
