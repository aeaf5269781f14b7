"""CLI: quantization-aware "repair" training of a quantized Anima DiT.

Drop-in for the reference's experimental repair trainer
(/root/reference/scripts/experimental/train_anima_repair.py): loads a
ComfyUI-quantized DiT (comfy_quant records), trains it through the normal
Anima flow-matching loop while projecting every optimizer step back into the
packed quantized representation with error-feedback residuals, and saves the
exact packed tensors (codes + scales) back out.

Usage: ``python -m aozora_sdxl_training_tpu.cli.train_anima_repair
--config preset.json`` where the preset's ``anima_dit_model_path`` points at
the *quantized* checkpoint.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np


def _to_torch_layout(name: str, arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 2 and not name.endswith("embed.weight"):
        return arr.T
    return arr


def _preset_sets_lineart_flag(argv) -> bool:
    """True if the --config preset explicitly carries the lineart flag."""
    import argparse
    import json

    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--config", type=str)
    args, _ = parser.parse_known_args(argv)
    if not args.config or not Path(args.config).exists():
        return False
    try:
        raw = json.loads(Path(args.config).read_text(encoding="utf-8"))
    except (json.JSONDecodeError, OSError):
        return False
    return ("repair_lineart_loss_enabled" in raw.get("anima", {})
            or "ANIMA_REPAIR_LINEART_LOSS_ENABLED" in raw)


def main(argv=None) -> None:
    from ..core.platform import apply_platform_override, enable_compilation_cache

    apply_platform_override()
    enable_compilation_cache()

    from ..ckpt.anima_checkpoint import strip_prefix, DIT_PREFIXES
    from ..ckpt.safetensors_io import load_all, write_streaming
    from ..config.runtime import RuntimeConfig
    from ..train.anima_trainer import run_anima_training
    from ..train.qat_repair import ProjectedQuantController

    config = RuntimeConfig.from_argv(argv)
    # line-art-masked loss defaults ON in the repair trainer (reference
    # module constant, train_anima_repair.py:97) unless the preset says no
    if not _preset_sets_lineart_flag(argv):
        config.ANIMA_REPAIR_LINEART_LOSS_ENABLED = True

    # BF16 control arm: same objective (incl. the line-art-masked loss),
    # no quantization projection — the comparison baseline for repair
    # efficacy (reference AnimaBFloat16RepairController,
    # train_anima_repair.py:1647-1676)
    fmt = str(getattr(config, "ANIMA_REPAIR_TARGET_FORMAT", "auto")).lower()
    if fmt in ("bf16", "bfp16", "bfloat16"):
        print("=" * 56)
        print("INFO: BF16 repair-control training enabled.")
        print("INFO: Line-art and flow-matching losses remain identical to "
              "quant repair.")
        print("INFO: Optimizer updates are not projected into quantized "
              "codes.")
        print("=" * 56)
        run_anima_training(config)
        return

    quant_state = load_all(config.DIT_PATH)
    stripped, prefix = strip_prefix(quant_state, DIT_PREFIXES)
    controller = ProjectedQuantController(stripped)
    if not controller.controlled_keys:
        raise SystemExit(
            f"{config.DIT_PATH} carries no comfy_quant records — run the "
            "standard trainer instead.")
    print(f"INFO: QAT repair: {len(controller.controlled_keys)} quantized "
          f"tensors under prefix '{prefix}'")

    # materialize a dequantized checkpoint for the normal trainer to load
    dequant = controller.dequantized_params()
    tmp = Path(tempfile.mkdtemp(prefix="aozora_repair_")) / "dequant.safetensors"
    write_streaming(tmp, {f"{prefix}{k}": v for k, v in dequant.items()})
    config.DIT_PATH = str(tmp)

    # projection runs in-jit after every optimizer step: error-feedback
    # residuals live on device, quantize->dequantize is fused XLA — no
    # per-step host round-trip (the reference moves every weight through
    # CPU FP16 residual buffers each step, train_anima_repair.py:1497-1645)
    from ..train.qat_project_jax import make_device_projector
    projector = make_device_projector(controller.formats,
                                      controller.nvfp4_multipliers)
    result = run_anima_training(config, device_projector=projector)

    # one host pass at save time: rebuild the effective weights (projected +
    # residual) and quantize them into the exact packed records
    final = result["trainable"]
    residuals = result["qat_residuals"] or {}
    torch_final = {k: _to_torch_layout(k, np.asarray(v, np.float32))
                   for k, v in final.items() if k in controller.formats}
    for k, r in residuals.items():
        controller.residuals[k] = np.asarray(r, np.float32)
    controller.project(torch_final)

    out = Path(config.OUTPUT_DIR) / "repaired_quantized.safetensors"
    # save the exact packed representation under the original key prefix
    write_streaming(out, {f"{prefix}{k}": np.asarray(v)
                          for k, v in controller._state.items()},
                    metadata={"aozora_repair": "projected-quantized training"})
    print(f"INFO: packed quantized checkpoint saved -> {out}")


if __name__ == "__main__":
    main()
